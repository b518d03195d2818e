"""Headline benchmark: large-v1 batched transcribe+tag throughput on one chip.

Measures audio-seconds processed per wall-second (real-time factor) for the
full inference pipeline — log-mel frontend, encoder with all-layer taps,
TL-TR tagging head, and the KV-cached greedy decode loop — on BATCH 30 s
windows at once (the batched long-audio path). Decode runs a fixed token
budget per window (TOKENS_PER_WINDOW) so throughput is comparable across
random and real weights; real speech averages ~75-150 tokens per window.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 50 (the BASELINE.json target of >=50x real-time per
v5e chip at large-v1).
"""

import argparse
import json
import time

import numpy as np


# BASELINE.json config presets (driver configs 1-5)
CONFIGS = {
    "tiny-single": dict(size="tiny", batch=1, tokens=48),
    "base-10min": dict(size="base", batch=8, tokens=96),
    "small-low": dict(size="small", batch=8, tokens=96, at_low=True),
    "medium-translate": dict(size="medium", batch=8, tokens=96, task="translate"),
    "large-beam": dict(size="large-v1", batch=4, tokens=96, beam=5),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", choices=sorted(CONFIGS), default=None,
                        help="BASELINE.json config preset")
    parser.add_argument("--size", default="large-v1")
    parser.add_argument("--batch", type=int, default=24,
                        help="30 s windows per batch (24 is the v5e "
                             "throughput sweet spot: weights/logits amortize "
                             "across rows while M stays under the 128-row "
                             "MXU tile; 32 regresses)")
    parser.add_argument("--tokens", type=int, default=96, help="decode steps per window")
    parser.add_argument("--iters", type=int, default=2)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--kv-quant", action="store_true", default=True,
                        help="int8-quantize the cross-attention KV (default on; "
                             "exact-token parity on test models)")
    parser.add_argument("--no-kv-quant", dest="kv_quant", action="store_false")
    parser.add_argument("--weight-quant", action="store_true", default=True,
                        help="int8-quantize the decoder matmul weights "
                             "(default on; token parity on test models)")
    parser.add_argument("--self-kv-quant", action="store_true", default=True,
                        help="int8 self-attention KV cache (token parity "
                             "verified on test models)")
    parser.add_argument("--no-self-kv-quant", dest="self_kv_quant",
                        action="store_false")
    parser.add_argument("--no-weight-quant", dest="weight_quant",
                        action="store_false")
    args = parser.parse_args()

    preset = CONFIGS.get(args.config, {})
    if preset:
        args.size = preset["size"]
        args.batch = preset["batch"]
        args.tokens = preset["tokens"]

    import jax
    import jax.numpy as jnp

    import whisper_at_tpu as wat

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = wat.build_model(args.size, storage_dtype=dtype, seed=0,
                            at_low_compute=preset.get("at_low", False))

    audio_seconds = args.batch * 30
    rng = np.random.default_rng(0)
    t = np.arange(16000 * audio_seconds) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    # int16 PCM, exactly what a real 16-bit file decodes to; the frontend
    # ships int16 to the device (half the H2D bytes) and dequantizes there
    audio = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)

    from whisper_at_tpu.transcribe import transcribe_batched

    def pipeline():
        # the public batched long-audio path: mel -> batched encode+tag ->
        # batched greedy decode -> segments
        extra = {}
        if preset.get("task"):
            extra["task"] = preset["task"]
        if preset.get("beam"):
            extra["beam_size"] = preset["beam"]
        return transcribe_batched(
            model,
            audio,
            language="en",
            temperature=0.0,
            **extra,
            sample_len=args.tokens,
            fp16=not args.fp32,
            max_batch=args.batch,
            logprob_threshold=None,
            compression_ratio_threshold=None,
            no_speech_threshold=None,
            kv_quant=args.kv_quant,
            weight_quant=args.weight_quant,
            self_kv_quant=args.self_kv_quant,
        )

    # warmup (compiles the mel kernel, encoder, prefill, and decode loop)
    pipeline()

    times = []
    for _ in range(args.iters):
        start = time.perf_counter()
        pipeline()
        times.append(time.perf_counter() - start)

    best = min(times)
    rtf = audio_seconds / best
    print(json.dumps({
        "metric": f"{args.size} batched transcribe+tag throughput "
                  f"({args.tokens} tok/30s-window, batch {args.batch}, "
                  f"{'int8 cross-KV, ' if args.kv_quant else ''}"
                  f"{'int8 weights, ' if args.weight_quant else ''}"
                  f"{'int8 self-KV, ' if args.self_kv_quant else ''}1 chip)",
        "value": round(rtf, 2),
        "unit": "audio-sec/sec",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
