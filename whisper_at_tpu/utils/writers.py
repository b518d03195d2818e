"""Transcript output writers: txt / vtt / srt / tsv / json.

Behavioral parity with the reference writer surface (whisper_at/utils.py:
71-258) — same formats, same subtitle layout decisions (max_line_width /
max_line_count / highlight_words) — implemented as a three-stage pipeline:

  1. `_word_stream`   flatten segments into (word, starts_segment) events
  2. `_CueLayout`     a greedy line-filling state machine that groups words
                      into subtitle cues with embedded line breaks
  3. per-format render (plain cues, or per-word re-emission with <u>
     highlighting)

Layout rules (verified by tests/test_transcribe.py::test_writers_roundtrip
and the subtitle layout tests): a word continues the current line only if
the line is non-empty, it fits in max_line_width, no >3 s pause precedes it
(when segments are not preserved), and it does not start a new segment in
preserve-segments mode. A closing boundary emits the cue when the line
budget is exhausted or a long pause / segment break demands it; otherwise
the word wraps to a new line.
"""

import json
import os
import re
from typing import Callable, Iterator, List, Optional, TextIO, Tuple

from .helpers import format_timestamp


# --------------------------------------------------------------------------- #
# subtitle cue layout
# --------------------------------------------------------------------------- #


def _word_stream(segments) -> Iterator[Tuple[dict, bool]]:
    """All word timings in order, flagged with starts-a-segment."""
    for segment in segments:
        for i, timing in enumerate(segment["words"]):
            yield dict(timing), i == 0


class _CueLayout:
    """Greedy subtitle layout: fold a word stream into cues of <= max_line
    count lines of <= max_line_width chars.

    `feed` returns a completed cue whenever the incoming word closes one;
    `flush` returns the trailing partial cue.
    """

    LONG_PAUSE_S = 3.0

    def __init__(self, max_line_width: Optional[int],
                 max_line_count: Optional[int], preserve_segments: bool):
        self.width = 1000 if max_line_width is None else max_line_width
        self.count = max_line_count
        self.preserve_segments = preserve_segments
        self._cue: List[dict] = []
        self._line_len = 0
        self._lines = 1
        self._prev_start: Optional[float] = None

    def _continues_line(self, word: str, pause: bool, seg_break: bool) -> bool:
        return (
            self._line_len > 0
            and self._line_len + len(word) <= self.width
            and not pause
            and not seg_break
        )

    def feed(self, timing: dict, starts_segment: bool) -> Optional[dict]:
        pause = (
            not self.preserve_segments
            and self._prev_start is not None
            and timing["start"] - self._prev_start > self.LONG_PAUSE_S
        )
        seg_break = starts_segment and self._cue and self.preserve_segments
        self._prev_start = timing["start"]

        if self._continues_line(timing["word"], pause, seg_break):
            self._line_len += len(timing["word"])
            self._cue.append(timing)
            return None

        # the word opens a line; decide whether it also opens a new cue
        timing["word"] = timing["word"].strip()
        emitted = None
        line_budget_gone = (
            self._cue
            and self.count is not None
            and (pause or self._lines >= self.count)
        )
        if line_budget_gone or seg_break:
            emitted = self._take_cue()
        elif self._line_len > 0:
            self._lines += 1
            timing["word"] = "\n" + timing["word"]
        self._line_len = len(timing["word"].strip())
        self._cue.append(timing)
        return emitted

    def flush(self) -> Optional[dict]:
        return self._take_cue() if self._cue else None

    def _take_cue(self) -> dict:
        cue = {
            "start": self._cue[0]["start"],
            "end": self._cue[-1]["end"],
            "words": self._cue,
        }
        self._cue = []
        self._lines = 1
        return cue


def _layout_cues(segments, max_line_width, max_line_count,
                 preserve_segments) -> Iterator[dict]:
    layout = _CueLayout(max_line_width, max_line_count, preserve_segments)
    for timing, starts_segment in _word_stream(segments):
        done = layout.feed(timing, starts_segment)
        if done:
            yield done
    tail = layout.flush()
    if tail:
        yield tail


def _underline(word: str) -> str:
    return re.sub(r"^(\s*)(.*)$", r"\1<u>\2</u>", word)


# --------------------------------------------------------------------------- #
# writers
# --------------------------------------------------------------------------- #


class ResultWriter:
    extension: str

    def __init__(self, output_dir: str):
        self.output_dir = output_dir

    def __call__(self, result: dict, audio_path: str, options: dict):
        stem = os.path.splitext(os.path.basename(audio_path))[0]
        path = os.path.join(self.output_dir, f"{stem}.{self.extension}")
        with open(path, "w", encoding="utf-8") as f:
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

    def ts(self, seconds: float) -> str:
        return format_timestamp(
            seconds=seconds,
            always_include_hours=self.always_include_hours,
            decimal_marker=self.decimal_marker,
        )

    def iterate_result(
        self, result: dict, options: dict
    ) -> Iterator[Tuple[str, str, str]]:
        """(start, end, text) subtitle blocks."""
        segments = result["segments"]
        if "words" not in segments[0]:
            # no word timings: one block per segment
            for segment in segments:
                yield (
                    self.ts(segment["start"]),
                    self.ts(segment["end"]),
                    segment["text"].strip().replace("-->", "->"),
                )
            return

        max_line_width = options["max_line_width"]
        max_line_count = options["max_line_count"]
        # either budget unset => keep the model's segmentation
        preserve = max_line_count is None or max_line_width is None
        cues = _layout_cues(segments, max_line_width, max_line_count, preserve)
        if options["highlight_words"]:
            for cue in cues:
                yield from self._highlighted(cue)
        else:
            for cue in cues:
                yield (
                    self.ts(cue["start"]),
                    self.ts(cue["end"]),
                    "".join(w["word"] for w in cue["words"]),
                )

    def _highlighted(self, cue: dict) -> Iterator[Tuple[str, str, str]]:
        """Re-emit the cue once per word with that word underlined, plus
        plain filler blocks across inter-word gaps."""
        words = [w["word"] for w in cue["words"]]
        cursor = self.ts(cue["start"])
        for i, timing in enumerate(cue["words"]):
            start, end = self.ts(timing["start"]), self.ts(timing["end"])
            if cursor != start:
                yield cursor, start, "".join(words)
            yield start, end, "".join(
                _underline(w) if j == i else w for j, w in enumerate(words)
            )
            cursor = end


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
            print(segment["text"].strip().replace("\t", " "),
                  file=file, flush=True)


class WriteJSON(ResultWriter):
    extension = "json"

    def write_result(self, result: dict, file: TextIO, options: dict):
        serializable = dict(result)
        audio_tag = serializable.get("audio_tag")
        if audio_tag is not None and hasattr(audio_tag, "tolist"):
            serializable["audio_tag"] = audio_tag.tolist()
        json.dump(serializable, file)


_WRITERS = {
    "txt": WriteTXT,
    "vtt": WriteVTT,
    "srt": WriteSRT,
    "tsv": WriteTSV,
    "json": WriteJSON,
}


def get_writer(
    output_format: str, output_dir: str
) -> Callable[[dict, str, dict], None]:
    if output_format == "all":
        all_writers = [cls(output_dir) for cls in _WRITERS.values()]

        def write_all(result: dict, audio_path: str, options: dict):
            for writer in all_writers:
                writer(result, audio_path, options)

        return write_all

    return _WRITERS[output_format](output_dir)
