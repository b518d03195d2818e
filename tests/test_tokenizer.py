"""Tokenizer tests: BPE round-trips, special-token layout, word splitting.

Mirrors the upstream test intent (whisper fork tests/test_tokenizer.py) plus
structural checks on the Whisper special-token contract.
"""

import pytest

from whisper_at_tpu.tokenizer import LANGUAGES, get_encoding, get_tokenizer

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def multilingual():
    return get_tokenizer(True)


@pytest.fixture(scope="module")
def gpt2():
    return get_tokenizer(False)


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        " Hello, World!  ",
        "The quick brown fox jumps over 1234 lazy dogs.",
        "안녕하세요",
        "こんにちは世界",
        "你好，世界",
        "Émile Zola était un écrivain français",
        "multi\nline\n\ttext with   spaces",
        "emoji 🎉🎶 test",
        "don't can't won't I'll we're they've he's I'm you'd",
        "",
    ],
)
def test_roundtrip(multilingual, gpt2, text):
    for tok in (multilingual, gpt2):
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_korean_multilingual_shorter(multilingual, gpt2):
    # the multilingual vocab covers Korean with fewer tokens (upstream test)
    text = "안녕하세요. 오늘은 날씨가 좋네요."
    assert len(multilingual.encode(text)) < len(gpt2.encode(text))


def test_vocab_sizes():
    assert get_encoding("multilingual").n_vocab == 51865
    assert get_encoding("gpt2").n_vocab == 51864


def test_special_token_layout(multilingual):
    # the Whisper token layout contract: eot, sot, languages, tasks, timestamps
    assert multilingual.eot == 50257
    assert multilingual.sot == 50258
    assert multilingual.special_tokens["<|en|>"] == multilingual.sot + 1
    n_langs = len(LANGUAGES)
    assert multilingual.translate == multilingual.sot + 1 + n_langs
    assert multilingual.transcribe == multilingual.translate + 1
    assert multilingual.timestamp_begin == multilingual.no_timestamps + 1
    assert multilingual.special_tokens["<|30.00|>"] == multilingual.timestamp_begin + 1500


def test_sot_sequences():
    tok = get_tokenizer(True, language="fr", task="translate")
    assert tok.sot_sequence == (tok.sot, tok.special_tokens["<|fr|>"], tok.translate)
    assert tok.sot_sequence_including_notimestamps == tok.sot_sequence + (
        tok.no_timestamps,
    )


def test_language_aliases():
    assert get_tokenizer(True, language="Castilian").language == "es"
    with pytest.raises(ValueError):
        get_tokenizer(True, language="klingon")


def test_decode_drops_timestamps(multilingual):
    ids = multilingual.encode(" hi") + [multilingual.timestamp_begin + 5]
    assert multilingual.decode(ids) == " hi"
    assert "<|0.10|>" in multilingual.decode_with_timestamps(ids)


def test_all_language_tokens(multilingual):
    assert len(multilingual.all_language_tokens) == len(LANGUAGES)
    assert set(multilingual.all_language_codes) == set(LANGUAGES.keys())


def test_non_speech_tokens(multilingual):
    non_speech = multilingual.non_speech_tokens
    assert len(non_speech) > 0
    assert all(isinstance(t, int) for t in non_speech)
    # the decoded forms should be symbols, not letters
    for t in non_speech[:10]:
        decoded = multilingual.decode_with_timestamps([t]).strip()
        assert not decoded.isalnum() or decoded == ""


def test_split_tokens_on_spaces(multilingual):
    ids = multilingual.encode(" hello world, how are you?")
    words, word_tokens = multilingual.split_tokens_on_spaces(ids)
    assert "".join(words) == " hello world, how are you?"
    assert sum(len(ts) for ts in word_tokens) == len(ids)
    assert words[0].strip() == "hello"


def test_split_cjk_on_unicode():
    tok = get_tokenizer(True, language="zh", task="transcribe")
    ids = tok.encode("你好世界")
    words, word_tokens = tok.split_to_word_tokens(ids)
    assert "".join(words) == "你好世界"
    assert sum(len(ts) for ts in word_tokens) == len(ids)


def test_encode_with_allowed_special(multilingual):
    text = "<|startoftranscript|><|en|>hello"
    ids = multilingual.encode(text, allowed_special="all")
    assert ids[0] == multilingual.sot
    assert ids[1] == multilingual.special_tokens["<|en|>"]
    assert multilingual.decode_with_timestamps(ids) == text


def test_language_module_and_registry():
    """The split-out data modules keep the spec constants intact."""
    from whisper_at_tpu.languages import LANGUAGES as L2, TO_LANGUAGE_CODE as T2
    from whisper_at_tpu.registry import _ALIGNMENT_HEADS, _MODELS, _MODELS_AT

    assert len(L2) == 99
    assert T2["castilian"] == "es"
    assert set(_MODELS) == set(_ALIGNMENT_HEADS)
    # every model has an AT head checkpoint; low variants for small+
    assert all(name in _MODELS_AT for name in _MODELS)
    assert "large-v1_low" in _MODELS_AT and "tiny_low" not in _MODELS_AT
