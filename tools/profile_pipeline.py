"""Stage-level timing of the batched transcribe+tag pipeline.

Splits the headline workload (bench.py's synthetic PCM audio) into its
device stages — mel (host->device transfer + DFT matmuls), encoder+taps,
and the full DecodingTask (prefill + decode loop + logits) — so the next
optimization target is visible. Stage numbers overlap (DecodingTask
includes the encoder pass); subtract to get decode alone.

Usage (real TPU): python tools/profile_pipeline.py [--size large-v1]
    [--batch 24] [--tokens 96]

Completion is forced with np.asarray; see STATUS.md for why
block_until_ready and single-op timings mislead on the tunneled chip.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="large-v1")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--tokens", type=int, default=96)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the JAX_PLATFORMS env var is "
                         "overridden by the axon TPU plugin; only a config "
                         "update before backend init wins)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import whisper_at_tpu as wat
    from whisper_at_tpu.audio import (
        N_FRAMES, N_SAMPLES, log_mel_spectrogram, pad_or_trim)
    from whisper_at_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_at_tpu.transcribe import transcribe_batched

    model = wat.build_model(args.size, storage_dtype=jnp.bfloat16, seed=0)
    secs = args.batch * 30
    rng = np.random.default_rng(0)
    t = np.arange(16000 * secs) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    audio = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)

    kw = dict(language="en", temperature=0.0, sample_len=args.tokens,
              fp16=True, max_batch=args.batch, logprob_threshold=None,
              compression_ratio_threshold=None, no_speech_threshold=None,
              kv_quant=True, weight_quant=True, self_kv_quant=True)

    def timeit(fn, force, iters=3):
        force(fn())
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            force(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = timeit(lambda: transcribe_batched(model, audio, **kw),
                lambda r: None)  # returns host dict: already complete
    print(f"full pipeline: {dt * 1000:.0f} ms ({secs / dt:.1f} audio-s/s)",
          flush=True)

    dt_mel = timeit(lambda: log_mel_spectrogram(audio, padding=N_SAMPLES),
                    lambda m: np.asarray(m[:, -1]))
    print(f"mel (incl. H2D): {dt_mel * 1000:.0f} ms", flush=True)

    mel = log_mel_spectrogram(audio, padding=N_SAMPLES)
    n_win = max(1, -(-(mel.shape[-1] - N_FRAMES) // N_FRAMES))
    mel_p = pad_or_trim(mel, n_win * N_FRAMES)
    windows = mel_p.T.reshape(n_win, N_FRAMES, -1).transpose(0, 2, 1)

    dt_enc = timeit(lambda: model.embed_audio(windows, fp16=True),
                    lambda r: np.asarray(r[0][0, 0, 0]))
    print(f"encoder+taps (batch {n_win}): {dt_enc * 1000:.0f} ms", flush=True)

    task = DecodingTask(model, DecodingOptions(
        language="en", temperature=0.0, sample_len=args.tokens, fp16=True,
        kv_quant=True, weight_quant=True, self_kv_quant=True))
    dt_dec = timeit(lambda: task.run(windows), lambda r: None)
    print(f"DecodingTask.run (incl. encoder): {dt_dec * 1000:.0f} ms "
          f"(decode alone ~{(dt_dec - dt_enc) * 1000:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
