"""Model dimension registry for the Whisper family.

Mirrors the reference `ModelDimensions` contract (whisper_at/model.py:16-27)
and adds the canonical size table so random-initialized models of every
variant can be built without downloading checkpoints.
"""

from dataclasses import dataclass


@dataclass(frozen=True)
class ModelDimensions:
    n_mels: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_vocab: int
    n_text_ctx: int
    n_text_head: int
    n_text_state: int
    n_text_layer: int


_MULTILINGUAL_VOCAB = 51865
_ENGLISH_VOCAB = 51864

# (state, heads, layers) per size; audio and text stacks share these in Whisper
_SIZES = {
    "tiny": (384, 6, 4),
    "base": (512, 8, 6),
    "small": (768, 12, 12),
    "medium": (1024, 16, 24),
    "large-v1": (1280, 20, 32),
    "large-v2": (1280, 20, 32),
    "large": (1280, 20, 32),
}


def dims_for(name: str) -> ModelDimensions:
    """Canonical ModelDimensions for an official model name (e.g. 'small.en')."""
    english = name.endswith(".en")
    size = name[: -len(".en")] if english else name
    if size not in _SIZES:
        raise ValueError(f"Unknown model size: {name}")
    state, heads, layers = _SIZES[size]
    return ModelDimensions(
        n_mels=80,
        n_audio_ctx=1500,
        n_audio_state=state,
        n_audio_head=heads,
        n_audio_layer=layers,
        n_vocab=_ENGLISH_VOCAB if english else _MULTILINGUAL_VOCAB,
        n_text_ctx=448,
        n_text_head=heads,
        n_text_state=state,
        n_text_layer=layers,
    )
