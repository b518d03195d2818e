"""Worker for test_cross_stream full-decode parity: decodes a fixed tiny
model/mel with the fused cross-KV layout and prints the sampled tokens as
JSON. The cross-decode kernel implementation is selected by the
WHISPER_AT_TPU_CROSS_DECODE / _STREAM_* env vars, which are read at import
time — hence a fresh process per variant."""

import json
import sys

import numpy as np
import jax.numpy as jnp

import whisper_at_tpu  # noqa: F401  (binds model methods)
from whisper_at_tpu.decoding import DecodingOptions, decode
from whisper_at_tpu.models.dims import ModelDimensions
from whisper_at_tpu.models.whisper import Whisper

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=4,
    n_text_state=64, n_text_layer=2,
)


def main():
    model = Whisper(DIMS, seed=3)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(
        rng.standard_normal((80, 3000)).astype(np.float32) * 0.4)
    base = dict(language="en", fp16=False, sample_len=10, kv_quant=True,
                kv_layout="fused")
    g = decode(model, mel, DecodingOptions(**base))
    b = decode(model, mel, DecodingOptions(**base, beam_size=2))
    print(json.dumps({"greedy": list(map(int, g.tokens)),
                      "beam": list(map(int, b.tokens))}))


if __name__ == "__main__":
    sys.exit(main())
