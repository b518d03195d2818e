"""Transcript output writers: txt / vtt / srt / tsv / json.

Behavioral parity with the reference writer stack (whisper_at/utils.py:71-258),
including the subtitle line-layout engine driven by word timings
(max_line_width / max_line_count / highlight_words).
"""

import json
import os
import re
from typing import Callable, Iterator, List, Optional, TextIO, Tuple

from .helpers import format_timestamp


class ResultWriter:
    extension: str

    def __init__(self, output_dir: str):
        self.output_dir = output_dir

    def __call__(self, result: dict, audio_path: str, options: dict):
        audio_basename = os.path.splitext(os.path.basename(audio_path))[0]
        output_path = os.path.join(self.output_dir, f"{audio_basename}.{self.extension}")
        with open(output_path, "w", encoding="utf-8") as f:
            self.write_result(result, file=f, options=options)

    def write_result(self, result: dict, file: TextIO, options: dict):
        raise NotImplementedError


class WriteTXT(ResultWriter):
    extension = "txt"

    def write_result(self, result: dict, file: TextIO, options: dict):
        for segment in result["segments"]:
            print(segment["text"].strip(), file=file, flush=True)


class SubtitlesWriter(ResultWriter):
    always_include_hours: bool
    decimal_marker: str

    def format_timestamp(self, seconds: float) -> str:
        return format_timestamp(
            seconds=seconds,
            always_include_hours=self.always_include_hours,
            decimal_marker=self.decimal_marker,
        )

    def iterate_result(
        self, result: dict, options: dict
    ) -> Iterator[Tuple[str, str, str]]:
        raw_max_line_width: Optional[int] = options["max_line_width"]
        max_line_count: Optional[int] = options["max_line_count"]
        highlight_words: bool = options["highlight_words"]
        max_line_width = 1000 if raw_max_line_width is None else raw_max_line_width
        preserve_segments = max_line_count is None or raw_max_line_width is None

        if "words" not in result["segments"][0]:
            # no word timings: one subtitle per segment
            for segment in result["segments"]:
                yield (
                    self.format_timestamp(segment["start"]),
                    self.format_timestamp(segment["end"]),
                    segment["text"].strip().replace("-->", "->"),
                )
            return

        def iterate_subtitles() -> Iterator[List[dict]]:
            line_len = 0
            line_count = 1
            subtitle: List[dict] = []
            last = result["segments"][0]["words"][0]["start"]
            for segment in result["segments"]:
                for i, original_timing in enumerate(segment["words"]):
                    timing = dict(original_timing)
                    long_pause = not preserve_segments and timing["start"] - last > 3.0
                    has_room = line_len + len(timing["word"]) <= max_line_width
                    seg_break = i == 0 and len(subtitle) > 0 and preserve_segments
                    if line_len > 0 and has_room and not long_pause and not seg_break:
                        line_len += len(timing["word"])
                    else:
                        timing["word"] = timing["word"].strip()
                        if (
                            len(subtitle) > 0
                            and max_line_count is not None
                            and (long_pause or line_count >= max_line_count)
                            or seg_break
                        ):
                            yield subtitle
                            subtitle = []
                            line_count = 1
                        elif line_len > 0:
                            line_count += 1
                            timing["word"] = "\n" + timing["word"]
                        line_len = len(timing["word"].strip())
                    subtitle.append(timing)
                    last = timing["start"]
            if subtitle:
                yield subtitle

        for subtitle in iterate_subtitles():
            subtitle_start = self.format_timestamp(subtitle[0]["start"])
            subtitle_end = self.format_timestamp(subtitle[-1]["end"])
            subtitle_text = "".join(word["word"] for word in subtitle)
            if highlight_words:
                last = subtitle_start
                all_words = [timing["word"] for timing in subtitle]
                for i, this_word in enumerate(subtitle):
                    start = self.format_timestamp(this_word["start"])
                    end = self.format_timestamp(this_word["end"])
                    if last != start:
                        yield last, start, subtitle_text
                    yield start, end, "".join(
                        re.sub(r"^(\s*)(.*)$", r"\1<u>\2</u>", word) if j == i else word
                        for j, word in enumerate(all_words)
                    )
                    last = end
            else:
                yield subtitle_start, subtitle_end, subtitle_text


class WriteVTT(SubtitlesWriter):
    extension = "vtt"
    always_include_hours = False
    decimal_marker = "."

    def write_result(self, result: dict, file: TextIO, options: dict):
        print("WEBVTT\n", file=file)
        for start, end, text in self.iterate_result(result, options):
            print(f"{start} --> {end}\n{text}\n", file=file, flush=True)


class WriteSRT(SubtitlesWriter):
    extension = "srt"
    always_include_hours = True
    decimal_marker = ","

    def write_result(self, result: dict, file: TextIO, options: dict):
        for i, (start, end, text) in enumerate(
            self.iterate_result(result, options), start=1
        ):
            print(f"{i}\n{start} --> {end}\n{text}\n", file=file, flush=True)


class WriteTSV(ResultWriter):
    """start/end in integer milliseconds, tab-separated, one segment per line."""

    extension = "tsv"

    def write_result(self, result: dict, file: TextIO, options: dict):
        print("start", "end", "text", sep="\t", file=file)
        for segment in result["segments"]:
            print(round(1000 * segment["start"]), file=file, end="\t")
            print(round(1000 * segment["end"]), file=file, end="\t")
            print(segment["text"].strip().replace("\t", " "), file=file, flush=True)


class WriteJSON(ResultWriter):
    extension = "json"

    def write_result(self, result: dict, file: TextIO, options: dict):
        serializable = dict(result)
        audio_tag = serializable.get("audio_tag")
        if audio_tag is not None and hasattr(audio_tag, "tolist"):
            serializable["audio_tag"] = audio_tag.tolist()
        json.dump(serializable, file)


def get_writer(
    output_format: str, output_dir: str
) -> Callable[[dict, str, dict], None]:
    writers = {
        "txt": WriteTXT,
        "vtt": WriteVTT,
        "srt": WriteSRT,
        "tsv": WriteTSV,
        "json": WriteJSON,
    }

    if output_format == "all":
        all_writers = [writer(output_dir) for writer in writers.values()]

        def write_all(result: dict, audio_path: str, options: dict):
            for writer in all_writers:
                writer(result, audio_path, options)

        return write_all

    return writers[output_format](output_dir)
