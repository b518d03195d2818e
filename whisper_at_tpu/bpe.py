"""Byte-pair encoding over tiktoken-format rank files.

The reference depends on the Rust `tiktoken` library (whisper_at/tokenizer.py:8,
324-357). This is a self-contained reimplementation of the same encoding
semantics: GPT-2 style regex pre-tokenization (via the `regex` module for
\\p{L}/\\p{N} classes) followed by greedy lowest-rank byte-pair merging.

A native C++ fast path (whisper_at_tpu/native) is used automatically when its
shared library has been built; the pure-Python path is the always-available
fallback and the correctness oracle for the native one.
"""

import base64
from typing import Dict, Iterable, List, Optional

import regex as _regex

_PAT_STR = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""


def load_ranks(path: str) -> Dict[bytes, int]:
    """Parse a tiktoken rank file: base64(token) <space> rank per line."""
    ranks = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            token_b64, rank = line.split()
            ranks[base64.b64decode(token_b64)] = int(rank)
    return ranks


def _bpe_merge(ranks: Dict[bytes, int], piece: bytes) -> List[int]:
    """Merge a single pre-token into BPE ids by repeatedly joining the
    adjacent pair with the lowest merge rank."""
    parts: List[bytes] = [piece[i : i + 1] for i in range(len(piece))]
    if len(parts) == 1:
        return [ranks[piece]]

    while True:
        best_rank = None
        best_idx = -1
        for i in range(len(parts) - 1):
            rank = ranks.get(parts[i] + parts[i + 1])
            if rank is not None and (best_rank is None or rank < best_rank):
                best_rank = rank
                best_idx = i
        if best_rank is None:
            break
        parts[best_idx : best_idx + 2] = [parts[best_idx] + parts[best_idx + 1]]

    return [ranks[p] for p in parts]


class Encoding:
    """A tiktoken-compatible encoding: regex split + BPE merge + specials."""

    def __init__(
        self,
        name: str,
        ranks: Dict[bytes, int],
        special_tokens: Dict[str, int],
        explicit_n_vocab: Optional[int] = None,
        ranks_path: Optional[str] = None,
    ):
        self.name = name
        self._ranks = ranks
        self._special_tokens = dict(special_tokens)
        self._pat = _regex.compile(_PAT_STR)

        # native C++ merge engine (whisper_at_tpu/native); None -> pure Python
        self._native = None
        if ranks_path is not None:
            from .native import native_bpe

            self._native = native_bpe(ranks_path)

        self.n_vocab = len(ranks) + len(special_tokens)
        if explicit_n_vocab is not None:
            assert self.n_vocab == explicit_n_vocab

        self._id_to_bytes: Dict[int, bytes] = {v: k for k, v in ranks.items()}
        for token, token_id in special_tokens.items():
            self._id_to_bytes[token_id] = token.encode("utf-8")
        self._cache: Dict[bytes, List[int]] = {}

    @property
    def special_tokens_set(self):
        return set(self._special_tokens.keys())

    @property
    def eot_token(self) -> int:
        return self._special_tokens["<|endoftext|>"]

    def encode_single_token(self, text: str) -> int:
        if text in self._special_tokens:
            return self._special_tokens[text]
        b = text.encode("utf-8") if isinstance(text, str) else text
        return self._ranks[b]

    def encode_ordinary(self, text: str) -> List[int]:
        """Encode text without any special-token handling."""
        ids: List[int] = []
        for match in self._pat.finditer(text):
            piece = match.group().encode("utf-8")
            cached = self._cache.get(piece)
            if cached is None:
                if piece in self._ranks:
                    cached = [self._ranks[piece]]
                elif self._native is not None:
                    cached = self._native.encode_piece(piece)
                    if cached is None:  # oversized/odd piece: python fallback
                        cached = _bpe_merge(self._ranks, piece)
                else:
                    cached = _bpe_merge(self._ranks, piece)
                self._cache[piece] = cached
            ids.extend(cached)
        return ids

    def encode(self, text: str, **kwargs) -> List[int]:
        allowed = kwargs.get("allowed_special", set())
        if allowed == "all":
            allowed = self.special_tokens_set
        if not allowed:
            return self.encode_ordinary(text)

        # split on allowed special tokens, encoding the spans between them
        ids: List[int] = []
        pattern = "|".join(_regex.escape(s) for s in sorted(allowed, key=len, reverse=True))
        last = 0
        for m in _regex.finditer(pattern, text):
            ids.extend(self.encode_ordinary(text[last : m.start()]))
            ids.append(self._special_tokens[m.group()])
            last = m.end()
        ids.extend(self.encode_ordinary(text[last:]))
        return ids

    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        return b"".join(self._id_to_bytes[int(i)] for i in ids)

    def decode(self, ids: Iterable[int], **kwargs) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")
