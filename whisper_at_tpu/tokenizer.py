"""Whisper text tokenizer: languages, special tokens, and word splitting.

Mirrors the reference tokenizer contract (whisper_at/tokenizer.py) — the same
99-language table, special-token layout (sot, task, 1501 timestamp tokens at
0.02 s granularity), sot sequences, suppression sets, and CJK-aware word
splitting — on top of our own BPE engine (whisper_at_tpu/bpe.py) instead of
the Rust tiktoken dependency.
"""

import os
import string
from dataclasses import dataclass, field
from functools import cached_property, lru_cache
from typing import Dict, List, Optional, Tuple

from .bpe import Encoding, load_ranks
from .languages import LANGUAGES, TO_LANGUAGE_CODE

@dataclass
class Tokenizer:
    """Access to special tokens and Whisper-specific token plumbing."""

    encoding: Encoding
    language: Optional[str] = None
    task: Optional[str] = None
    sot_sequence: Tuple[int, ...] = ()
    special_tokens: Dict[str, int] = field(default_factory=dict)

    def __post_init__(self):
        for special in self.encoding.special_tokens_set:
            self.special_tokens[special] = self.encoding.encode_single_token(special)

        sot = self.special_tokens["<|startoftranscript|>"]
        translate = self.special_tokens["<|translate|>"]
        transcribe = self.special_tokens["<|transcribe|>"]

        langs = tuple(LANGUAGES.keys())
        sot_sequence = [sot]
        if self.language is not None:
            sot_sequence.append(sot + 1 + langs.index(self.language))
        if self.task is not None:
            sot_sequence.append(transcribe if self.task == "transcribe" else translate)
        self.sot_sequence = tuple(sot_sequence)

    def encode(self, text: str, **kwargs) -> List[int]:
        return self.encoding.encode(text, **kwargs)

    def decode(self, token_ids: List[int], **kwargs) -> str:
        token_ids = [t for t in token_ids if t < self.timestamp_begin]
        return self.encoding.decode(token_ids, **kwargs)

    def decode_with_timestamps(self, token_ids: List[int], **kwargs) -> str:
        """Decode including timestamp/special annotations like "<|1.08|>"."""
        return self.encoding.decode(token_ids, **kwargs)

    # special-token accessors (tokenizer.eot, .sot, .timestamp_begin, ...)
    # resolve through this table via __getattr__
    _SPECIAL_ATTRS = {
        "transcribe": "<|transcribe|>",
        "translate": "<|translate|>",
        "sot": "<|startoftranscript|>",
        "sot_lm": "<|startoflm|>",
        "sot_prev": "<|startofprev|>",
        "no_speech": "<|nospeech|>",
        "no_timestamps": "<|notimestamps|>",
        "timestamp_begin": "<|0.00|>",
    }

    def __getattr__(self, name: str) -> int:
        token = type(self)._SPECIAL_ATTRS.get(name)
        if token is not None:
            return self.special_tokens[token]
        raise AttributeError(name)

    @cached_property
    def eot(self) -> int:
        return self.encoding.eot_token

    @cached_property
    def language_token(self) -> int:
        if self.language is None:
            raise ValueError("This tokenizer does not have language token configured")
        if token := self.special_tokens.get(f"<|{self.language}|>", None):
            return token
        raise KeyError(f"Language {self.language} not found in tokenizer.")

    @cached_property
    def all_language_tokens(self) -> Tuple[int, ...]:
        return tuple(
            token_id
            for token, token_id in self.special_tokens.items()
            if token.strip("<|>") in LANGUAGES
        )

    @cached_property
    def all_language_codes(self) -> Tuple[str, ...]:
        return tuple(
            self.decode_with_timestamps([l]).strip("<|>")
            for l in self.all_language_tokens
        )

    @cached_property
    def sot_sequence_including_notimestamps(self) -> Tuple[int, ...]:
        return tuple(list(self.sot_sequence) + [self.no_timestamps])

    @cached_property
    def non_speech_tokens(self) -> Tuple[int, ...]:
        """Tokens to suppress to avoid speaker tags / non-speech annotations
        (the reference's curated symbol list, whisper_at/tokenizer.py:236-269)."""
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』')
        symbols += (
            "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪".split()
        )

        # symbols that may tokenize as one or several tokens; suppressing the
        # first token is safe for the U+2640..U+267F misc range (shared UTF-8 prefix)
        miscellaneous = set("♩♪♫♬♭♮♯")
        assert all(0x2640 <= ord(c) <= 0x267F for c in miscellaneous)

        # allow hyphens and single quotes between words, but not word-initially
        result = {self.encoding.encode(" -")[0], self.encoding.encode(" '")[0]}
        for symbol in symbols + list(miscellaneous):
            for tokens in [
                self.encoding.encode(symbol),
                self.encoding.encode(" " + symbol),
            ]:
                if len(tokens) == 1 or symbol in miscellaneous:
                    result.add(tokens[0])

        return tuple(sorted(result))

    def split_to_word_tokens(self, tokens: List[int]):
        if self.language in {"zh", "ja", "th", "lo", "my"}:
            # no-space scripts: split at valid unicode codepoint boundaries
            return self.split_tokens_on_unicode(tokens)
        return self.split_tokens_on_spaces(tokens)

    def split_tokens_on_unicode(self, tokens: List[int]):
        decoded_full = self.decode_with_timestamps(tokens)
        replacement_char = "�"

        words, word_tokens, current_tokens = [], [], []
        unicode_offset = 0
        for token in tokens:
            current_tokens.append(token)
            decoded = self.decode_with_timestamps(current_tokens)
            if (
                replacement_char not in decoded
                or decoded_full[unicode_offset + decoded.index(replacement_char)]
                == replacement_char
            ):
                words.append(decoded)
                word_tokens.append(current_tokens)
                current_tokens = []
                unicode_offset += len(decoded)

        return words, word_tokens

    def split_tokens_on_spaces(self, tokens: List[int]):
        subwords, subword_tokens_list = self.split_tokens_on_unicode(tokens)
        words, word_tokens = [], []
        for subword, subword_tokens in zip(subwords, subword_tokens_list):
            special = subword_tokens[0] >= self.eot
            with_space = subword.startswith(" ")
            punctuation = subword.strip() in string.punctuation
            if special or with_space or punctuation or len(words) == 0:
                words.append(subword)
                word_tokens.append(subword_tokens)
            else:
                words[-1] = words[-1] + subword
                word_tokens[-1].extend(subword_tokens)
        return words, word_tokens


@lru_cache(maxsize=None)
def get_encoding(name: str = "gpt2") -> Encoding:
    vocab_path = os.path.join(os.path.dirname(__file__), "assets", f"{name}.tiktoken")
    ranks = load_ranks(vocab_path)
    n_vocab = len(ranks)

    special_tokens = {}
    specials = [
        "<|endoftext|>",
        "<|startoftranscript|>",
        *[f"<|{lang}|>" for lang in LANGUAGES.keys()],
        "<|translate|>",
        "<|transcribe|>",
        "<|startoflm|>",
        "<|startofprev|>",
        "<|nospeech|>",
        "<|notimestamps|>",
        *[f"<|{i * 0.02:.2f}|>" for i in range(1501)],
    ]
    for token in specials:
        special_tokens[token] = n_vocab
        n_vocab += 1

    return Encoding(
        name=os.path.basename(vocab_path),
        ranks=ranks,
        special_tokens=special_tokens,
        explicit_n_vocab=n_vocab,
        ranks_path=vocab_path,
    )


@lru_cache(maxsize=None)
def get_tokenizer(
    multilingual: bool,
    *,
    language: Optional[str] = None,
    task: Optional[str] = None,  # "transcribe" | "translate" | None
) -> Tokenizer:
    if language is not None:
        language = language.lower()
        if language not in LANGUAGES:
            if language in TO_LANGUAGE_CODE:
                language = TO_LANGUAGE_CODE[language]
            else:
                raise ValueError(f"Unsupported language: {language}")

    if multilingual:
        encoding_name = "multilingual"
        language = language or "en"
        task = task or "transcribe"
    else:
        encoding_name = "gpt2"
        language = None
        task = None

    return Tokenizer(encoding=get_encoding(encoding_name), language=language, task=task)
