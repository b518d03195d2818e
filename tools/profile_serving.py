"""Per-stage ablation of the serving row's gap vs the offline headline.

The serving bench row (many 8-25 s files via TranscriptionService) sits at
~56% of the offline headline in audio-s/s. STATUS previously attributed the
gap to "per-session host work — structural"; this tool replaces that claim
with measurements. It runs the bench's exact serving workload with
WHISPER_AT_TPU_SERVE_PROF=1 and prints:

  1. the per-stage wall/CPU table of every transcribe_many call (frontend
     mel / detect / decode / tag dispatch / assembly / tag commit / emit)
     plus the scheduler's own stages (fill, settle, inter-batch gap);
  2. the WINDOW-throughput comparison against the offline packed path on
     the same chip in the same process (windows/s is the device-work unit:
     every 30 s window costs the same decode regardless of how much real
     audio it carries);
  3. the padding accounting: mean real-audio seconds per window / 30 —
     the EXACT multiplier the audio-s/s metric applies on top of
     window throughput. Short files pad their single window to 30 s by
     construction (reference transcribe.py:155-162 pad_or_trim semantics,
     exactness-bound — decode must see the model's full 30 s context).

Usage:
  python tools/profile_serving.py --size large-v1 --batch 24 --iters 3
  python tools/profile_serving.py --size tiny --cpu --iters 1   # smoke
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("WHISPER_AT_TPU_SERVE_PROF", "1")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", default="large-v1")
    parser.add_argument("--batch", type=int, default=24)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--tokens", type=int, default=96)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    import whisper_at_tpu as wat
    from whisper_at_tpu.audio import prefetch_audio, prefetch_audio_many
    from whisper_at_tpu.serving import TranscriptionService
    from whisper_at_tpu.transcribe import _serve_prof, transcribe_batched

    bench.enable_compilation_cache()
    model = wat.build_model(args.size, storage_dtype=jnp.bfloat16, seed=0)

    rng = np.random.default_rng(0)

    def make_audio(seconds, seed_offset=0):
        r = np.random.default_rng(seed_offset)
        t = np.arange(16000 * seconds) / 16000.0
        a = (0.3 * np.sin(2 * np.pi * 220.0 * t)
             + 0.05 * r.standard_normal(len(t))).astype(np.float32)
        return (np.clip(a, -1.0, 1.0) * 32767.0).astype(np.int16)

    common = dict(
        language="en", temperature=0.0, sample_len=args.tokens,
        fp16=not args.cpu,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_threshold=None, kv_quant=True, weight_quant=True,
        self_kv_quant=True,
    )

    # ---- offline reference: windows/s of the packed headline path ------- #
    long_audio = make_audio(args.batch * 30, seed_offset=9999)
    pre = prefetch_audio(long_audio)
    t0 = time.perf_counter()
    transcribe_batched(model, pre, max_batch=args.batch, **common)
    print(f"offline warmup (compile) {time.perf_counter() - t0:.1f}s",
          flush=True)
    _serve_prof.snapshot()  # drop warmup numbers
    offline_times = []
    for it in range(args.iters):
        pre = prefetch_audio(make_audio(args.batch * 30, seed_offset=it))
        t0 = time.perf_counter()
        transcribe_batched(model, pre, max_batch=args.batch, **common)
        offline_times.append(time.perf_counter() - t0)
    offline_stages = _serve_prof.snapshot()
    offline_best = min(offline_times)
    offline_wps = args.batch / offline_best
    print(f"\noffline packed: {args.batch} windows in {offline_best:.2f}s "
          f"= {offline_wps:.2f} windows/s "
          f"({args.batch * 30 / offline_best:.1f} audio-s/s)")
    if offline_stages:
        print("offline transcribe_batched has no _serve_prof stages "
              "(instrumentation lives in transcribe_many) — stages below "
              "are from any transcribe_many warmups only:", offline_stages)

    # ---- serving workload: the bench's exact shape ---------------------- #
    durations = [int(d) for d in rng.integers(8, 26, size=3 * args.batch)]
    n_files = len(durations)
    audio_seconds = float(sum(durations))
    n_windows = n_files  # every 8-25 s file is exactly one 30 s window

    service = TranscriptionService(model, max_batch=args.batch,
                                   max_wait_s=0.05, **common)
    try:
        payloads = [
            [make_audio(d, seed_offset=i + 1000 * it)
             for i, d in enumerate(durations)]
            for it in range(args.iters + 1)
        ]
        # warmup (bucket ladder for tail batches)
        for f in [service.submit(a) for a in prefetch_audio_many(payloads[0])]:
            f.result()
        _serve_prof.snapshot()

        serve_times = []
        for it in range(args.iters):
            pre = prefetch_audio_many(payloads[it + 1])
            t0 = time.perf_counter()
            for f in [service.submit(a) for a in pre]:
                f.result()
            serve_times.append(time.perf_counter() - t0)
        stages = _serve_prof.snapshot()
    finally:
        service.close()

    serve_best = min(serve_times)
    serve_wps = n_windows / serve_best
    serve_rtf = audio_seconds / serve_best
    mean_s_per_window = audio_seconds / n_windows

    print(f"\nserving: {n_files} files ({audio_seconds:.0f} audio-s, "
          f"{n_windows} windows) best {serve_best:.2f}s")
    print(f"  window throughput : {serve_wps:6.2f} windows/s "
          f"(offline {offline_wps:6.2f}) -> "
          f"{100 * serve_wps / offline_wps:.1f}% of offline")
    print(f"  audio-s/s         : {serve_rtf:6.1f} "
          f"(offline {args.batch * 30 / offline_best:6.1f})")
    print(f"  padding multiplier: {mean_s_per_window:.1f}s real audio per "
          f"30s window = {mean_s_per_window / 30:.3f} "
          "(exactness-bound: decode sees the full 30 s context)")
    print(f"  predicted serving audio-s/s from padding alone: "
          f"{offline_wps * mean_s_per_window:.1f}")

    print(f"\nper-stage totals over {args.iters} iterations "
          f"({sum(serve_times):.2f}s wall):")
    total_wall = sum(v["wall_ms"] for v in stages.values())
    for k, v in sorted(stages.items(), key=lambda kv: -kv[1]["wall_ms"]):
        print(f"  {k:14s} wall {v['wall_ms']:9.1f} ms  "
              f"cpu {v['cpu_ms']:9.1f} ms  x{v['count']:<4d} "
              f"({v['wall_ms'] / 10 / max(sum(serve_times), 1e-9):5.1f}% "
              "of drive)")
    decode_ms = stages.get("decode", {}).get("wall_ms", 0.0)
    host_ms = total_wall - decode_ms - stages.get(
        "sched-gap", {}).get("wall_ms", 0.0)
    print(f"  [decode (device-bound) {decode_ms:.0f} ms; other instrumented "
          f"host work {host_ms:.0f} ms = "
          f"{100 * host_ms / max(decode_ms, 1e-9):.1f}% of decode]")


if __name__ == "__main__":
    main()
