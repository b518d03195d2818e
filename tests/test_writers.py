"""Subtitle layout engine acceptance tests (reference utils.py:71-258
behavior): line wrapping, cue budgets, long-pause breaks, segment
preservation, word highlighting."""

import numpy as np

from whisper_at_tpu.utils.writers import WriteSRT, WriteVTT, get_writer


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
