"""Subtitle layout engine acceptance tests (reference utils.py:71-258
behavior): line wrapping, cue budgets, long-pause breaks, segment
preservation, word highlighting."""

import numpy as np

from whisper_at_tpu.utils.writers import WriteSRT, WriteVTT, get_writer
import pytest

pytestmark = pytest.mark.quick


def _result(words_per_segment):
    """Build a result dict from [[(word, start, end), ...], ...]."""
    segments = []
    t_tokens = []
    for words in words_per_segment:
        segments.append({
            "start": words[0][1],
            "end": words[-1][2],
            "text": "".join(w for w, _, _ in words),
            "words": [
                {"word": w, "start": s, "end": e, "probability": 1.0}
                for w, s, e in words
            ],
        })
    return {"segments": segments, "text": "", "language": "en",
            "audio_tag": np.zeros((1, 527), np.float32), "at_time_res": 10}


OPTS = dict(max_line_width=None, max_line_count=None, highlight_words=False)


def _blocks(result, **overrides):
    writer = WriteVTT(".")
    return list(writer.iterate_result(result, {**OPTS, **overrides}))


def test_no_word_timings_one_block_per_segment():
    result = _result([[(" hello", 0.0, 0.5)], [(" world", 1.0, 1.5)]])
    for seg in result["segments"]:
        del seg["words"]
    blocks = _blocks(result)
    assert [b[2] for b in blocks] == ["hello", "world"]


def test_line_wrap_at_max_width():
    # both budgets set => preserve_segments False; words of 6 chars each,
    # width 14 fits two words per line ("yellow" + " green" = 12 <= 14)
    words = [(" yellow", 0.0, 0.4), (" green", 0.5, 0.9),
             (" purple", 1.0, 1.4), (" orange", 1.5, 1.9)]
    blocks = _blocks(_result([words]), max_line_width=13, max_line_count=10)
    assert len(blocks) == 1
    text = blocks[0][2]
    # first word stripped, wraps after the second word
    assert text == "yellow green\npurple orange"


def test_cue_break_at_max_line_count():
    words = [(" one", 0.0, 0.1), (" two", 0.2, 0.3),
             (" three", 0.4, 0.5), (" four", 0.6, 0.7)]
    blocks = _blocks(_result([words]), max_line_width=4, max_line_count=2)
    # width 4 puts each word on its own line; count 2 closes a cue every
    # two lines
    assert [b[2] for b in blocks] == ["one\ntwo", "three\nfour"]


def test_long_pause_closes_cue():
    words = [(" before", 0.0, 0.4), (" after", 4.0, 4.4)]
    blocks = _blocks(_result([words]), max_line_width=100, max_line_count=5)
    assert [b[2] for b in blocks] == ["before", "after"]


def test_preserve_segments_breaks_cues_between_segments():
    result = _result([
        [(" first", 0.0, 0.4), (" segment", 0.5, 0.9)],
        [(" second", 1.0, 1.4)],
    ])
    blocks = _blocks(result)  # budgets unset -> preserve segments
    assert [b[2] for b in blocks] == ["first segment", "second"]


def test_highlight_words_underlines_each_word_and_fills_gaps():
    words = [(" hi", 0.0, 0.5), (" there", 1.0, 1.5)]
    blocks = _blocks(_result([words]), highlight_words=True)
    texts = [b[2] for b in blocks]
    assert "<u>hi</u> there" in texts[0]
    # gap 0.5 -> 1.0 emits the plain cue as filler
    assert texts[1] == "hi there"
    assert " <u>there</u>" in texts[2]
    # the filler block spans the gap
    assert blocks[1][0] == "00:00.500" and blocks[1][1] == "00:01.000"


def test_srt_numbering_and_timestamp_format(tmp_path):
    result = _result([[(" hello", 0.0, 0.5)]])
    writer = WriteSRT(str(tmp_path))
    writer(result, "audio.wav", dict(OPTS))
    content = (tmp_path / "audio.srt").read_text()
    assert content.startswith("1\n00:00:00,000 --> 00:00:00,500\nhello")


def test_get_writer_all_writes_every_format(tmp_path):
    result = _result([[(" hello", 0.0, 0.5)]])
    for seg in result["segments"]:
        del seg["words"]
    write_all = get_writer("all", str(tmp_path))
    write_all(result, "clip.wav", dict(OPTS))
    for ext in ("txt", "vtt", "srt", "tsv", "json"):
        assert (tmp_path / f"clip.{ext}").exists(), ext


def test_subtitle_layout_fuzz_vs_reference_oracle():
    """Seeded fuzz: the staged cue-layout pipeline must reproduce the
    reference's iterate_subtitles generator (utils.py:102-172) — line
    continuation/room checks, long-pause breaks, preserve_segments breaks,
    max_line_count cue splits, strip-on-new-line, and the highlight_words
    re-emission with gap fillers — over random word streams and options."""
    import random
    import re

    def oracle(writer, result, options):
        raw_w = options["max_line_width"]
        max_line_count = options["max_line_count"]
        highlight_words = options["highlight_words"]
        max_line_width = 1000 if raw_w is None else raw_w
        preserve_segments = max_line_count is None or raw_w is None

        def iterate_subtitles():
            line_len = 0
            line_count = 1
            subtitle = []
            last = result["segments"][0]["words"][0]["start"]
            for segment in result["segments"]:
                for i, original_timing in enumerate(segment["words"]):
                    timing = dict(original_timing)
                    long_pause = (not preserve_segments
                                  and timing["start"] - last > 3.0)
                    has_room = line_len + len(timing["word"]) <= max_line_width
                    seg_break = i == 0 and len(subtitle) > 0 and preserve_segments
                    if line_len > 0 and has_room and not long_pause \
                            and not seg_break:
                        line_len += len(timing["word"])
                    else:
                        timing["word"] = timing["word"].strip()
                        if (len(subtitle) > 0 and max_line_count is not None
                                and (long_pause or line_count >= max_line_count)
                                or seg_break):
                            yield subtitle
                            subtitle = []
                            line_count = 1
                        elif line_len > 0:
                            line_count += 1
                            timing["word"] = "\n" + timing["word"]
                        line_len = len(timing["word"].strip())
                    subtitle.append(timing)
                    last = timing["start"]
            if len(subtitle) > 0:
                yield subtitle

        for subtitle in iterate_subtitles():
            sub_start = writer.ts(subtitle[0]["start"])
            sub_end = writer.ts(subtitle[-1]["end"])
            sub_text = "".join(w["word"] for w in subtitle)
            if highlight_words:
                last = sub_start
                all_words = [t["word"] for t in subtitle]
                for i, this_word in enumerate(subtitle):
                    start = writer.ts(this_word["start"])
                    end = writer.ts(this_word["end"])
                    if last != start:
                        yield last, start, sub_text
                    yield start, end, "".join(
                        re.sub(r"^(\s*)(.*)$", r"\1<u>\2</u>", word)
                        if j == i else word
                        for j, word in enumerate(all_words))
                    last = end
            else:
                yield sub_start, sub_end, sub_text

    rng = random.Random(11)
    writer = WriteSRT(".")
    for _ in range(200):
        t = 0.0
        segments = []
        for _ in range(rng.randint(1, 5)):
            words = []
            for _ in range(rng.randint(1, 10)):
                t += rng.choice([0.1, 0.4, 1.0, 3.5, 4.0])
                dur = rng.choice([0.2, 0.5, 1.0])
                words.append({"word": rng.choice(
                    [" a", " word", " longerword", " punctuation,",
                     " trailing ", "x"]),
                    "start": round(t, 2), "end": round(t + dur, 2)})
                t += dur
            segments.append({"start": words[0]["start"],
                             "end": words[-1]["end"],
                             "text": "".join(w["word"] for w in words),
                             "words": words})
        result = {"segments": segments}
        options = {
            "max_line_width": rng.choice([None, 6, 12, 25]),
            "max_line_count": rng.choice([None, 1, 2, 3]),
            "highlight_words": rng.choice([False, False, True]),
        }
        got = list(writer.iterate_result(result, options))
        want = list(oracle(writer, result, options))
        assert got == want, (options, segments)
