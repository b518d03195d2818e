"""A/B the TranscriptionService scheduler against direct transcribe_many.

The service must cost ~nothing over the raw packed-batch API: same device
work, plus a scheduler thread and futures. This measures both on the same
synthetic fleet of short clips (the bench.py --serving workload):

  direct:  prefetch_audio_many(fleet) -> transcribe_many   (one call)
  service: burst-submit the fleet -> wait all futures      (scheduler batches)

Usage:
  python tools/profile_service.py --size large-v1 --batch 24 --iters 2
  python tools/profile_service.py --size tiny --cpu        # offline smoke
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fleet(rng, n_files, seed_base):
    durations = rng.integers(8, 26, size=n_files)
    fleet = []
    for i, d in enumerate(durations):
        r = np.random.default_rng(seed_base + i)
        t = np.arange(16000 * int(d)) / 16000.0
        a = (0.3 * np.sin(2 * np.pi * 220.0 * t)
             + 0.05 * r.standard_normal(len(t))).astype(np.float32)
        fleet.append((np.clip(a, -1, 1) * 32767.0).astype(np.int16))
    return fleet


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", default="large-v1")
    parser.add_argument("--batch", type=int, default=24)
    parser.add_argument("--tokens", type=int, default=96)
    parser.add_argument("--iters", type=int, default=2)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import whisper_at_tpu as wat
    from whisper_at_tpu.audio import prefetch_audio_many
    from whisper_at_tpu.transcribe import transcribe_many

    model = wat.build_model(args.size, seed=0)
    # the production bench config: int8 cross/self-KV + int8 weights
    # (without them large-v1 bf16 KV at batch 24 exceeds v5e HBM)
    opts = dict(language="en", temperature=0.0, sample_len=args.tokens,
                logprob_threshold=None, compression_ratio_threshold=None,
                no_speech_threshold=None, kv_quant=True, weight_quant=True,
                self_kv_quant=True)

    rng = np.random.default_rng(0)
    n_files = 3 * args.batch
    fleets = [make_fleet(rng, n_files, 1000 * it)
              for it in range(args.iters + 1)]
    audio_s = [sum(len(f) for f in fl) / 16000.0 for fl in fleets]

    # warmup compiles every program both paths share
    transcribe_many(model, prefetch_audio_many(fleets[0]),
                    max_batch=args.batch, **opts)

    results = {}
    direct_times = []
    for it in range(args.iters):
        t0 = time.perf_counter()
        transcribe_many(model, prefetch_audio_many(fleets[it + 1]),
                        max_batch=args.batch, **opts)
        direct_times.append(time.perf_counter() - t0)
    best = min(range(args.iters), key=lambda i: direct_times[i])
    results["direct"] = audio_s[best + 1] / direct_times[best]
    print(f"direct:  times {[f'{t:.2f}' for t in direct_times]} "
          f"-> {results['direct']:.1f} audio-s/s", flush=True)

    service_times = []
    for it in range(args.iters):
        with wat.TranscriptionService(model, max_batch=args.batch,
                                      max_wait_s=0.05, **opts) as svc:
            t0 = time.perf_counter()
            futs = [svc.submit(a) for a in fleets[it + 1]]
            for f in futs:
                f.result(timeout=1800)
            service_times.append(time.perf_counter() - t0)
            stats = svc.stats()
    best = min(range(args.iters), key=lambda i: service_times[i])
    results["service"] = audio_s[best + 1] / service_times[best]
    print(f"service: times {[f'{t:.2f}' for t in service_times]} "
          f"-> {results['service']:.1f} audio-s/s "
          f"({stats['batches']} batches last iter)", flush=True)
    print(f"service/direct: {results['service'] / results['direct']:.3f}")


if __name__ == "__main__":
    main()
