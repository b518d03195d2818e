"""A/B the batched word-timestamp alignment against the per-window path.

word_timestamps=True adds, per 30 s window, an alignment forward (the
decode pass's encoder output is REUSED; one model-dtype QK-capturing
decoder forward) plus host DTW. The batched attach
(timing.add_word_timestamps_many) runs ONE such forward per packed chunk
and pulls [G, S] token probabilities instead of a [S, V] logits tensor per
window; WHISPER_AT_TPU_ALIGN=solo reverts to the per-window path. This
measures both on the same long audio, plus the no-word-timestamps baseline
so the feature's total cost is visible.

Usage:
  python tools/profile_words.py --size large-v1 --minutes 12 --iters 2
  python tools/profile_words.py --size tiny --cpu --minutes 2   # smoke
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", default="large-v1")
    parser.add_argument("--batch", type=int, default=24)
    parser.add_argument("--minutes", type=float, default=12.0)
    parser.add_argument("--iters", type=int, default=2)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401  (backend init after the pin)

    import bench
    import whisper_at_tpu as wat
    from whisper_at_tpu.transcribe import transcribe_batched

    bench.enable_compilation_cache()
    model = wat.build_model(args.size, storage_dtype=jnp.bfloat16, seed=0)

    seconds = int(args.minutes * 60)
    r = np.random.default_rng(0)
    t = np.arange(16000 * seconds) / 16000.0
    a = (0.3 * np.sin(2 * np.pi * 220.0 * t)
         + 0.05 * r.standard_normal(len(t))).astype(np.float32)
    audio = (np.clip(a, -1, 1) * 32767.0).astype(np.int16)

    common = dict(
        language="en", temperature=0.0, sample_len=96,
        fp16=not args.cpu, max_batch=args.batch,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, kv_quant=True, weight_quant=True,
        self_kv_quant=True,
    )

    def run(tag, words, env=None):
        if env:
            os.environ.update(env)
        try:
            times = []
            for it in range(args.iters + 1):  # first run = compile warmup
                t0 = time.perf_counter()
                res = transcribe_batched(model, audio,
                                         word_timestamps=words, **common)
                dt = time.perf_counter() - t0
                if it:
                    times.append(dt)
            n_words = sum(len(s.get("words", []))
                          for s in res["segments"])
            best = min(times)
            print(f"{tag:28s} best {best:7.2f}s  "
                  f"({seconds / best:6.1f} audio-s/s, {n_words} words)",
                  flush=True)
            return best
        finally:
            for k in (env or {}):
                os.environ.pop(k, None)

    base = run("no word timestamps", False)
    solo = run("words: solo per-window", True,
               {"WHISPER_AT_TPU_ALIGN": "solo"})
    batched = run("words: batched attach", True)
    print(f"alignment cost: solo +{solo - base:.2f}s, "
          f"batched +{batched - base:.2f}s "
          f"({(solo - base) / max(batched - base, 1e-9):.2f}x reduction)")


if __name__ == "__main__":
    main()
