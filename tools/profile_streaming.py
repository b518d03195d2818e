"""Streaming-session latency profile: feed a live stream in small blocks,
measure the wall time each 30 s window takes to finalize into segments.

The interactive serving metric the batch benches don't capture: when a
window's last sample arrives, how long until its transcript (and tags) are
in hand? That is one window's mel + encode + decode + host assembly at
batch 1 (plus the quality-ladder re-decodes when the gate rejects).

--streams N runs N concurrent sessions through StreamingService (each in
its own thread, like N client connections): the scheduler batches their
window decodes, so per-stream finalize latency should stay near the
1-stream number while aggregate throughput scales ~N× — THE multi-stream
serving claim, measured.

Usage:
  python tools/profile_streaming.py --size large-v1 --minutes 3
  python tools/profile_streaming.py --size large-v1 --minutes 3 --streams 8
  python tools/profile_streaming.py --size tiny --minutes 2 --cpu   # smoke
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
    parser.add_argument("--minutes", type=float, default=3.0)
    parser.add_argument("--block-ms", type=int, default=250,
                        help="feed granularity (a mic callback cadence)")
    parser.add_argument("--sample-len", type=int, default=96)
    parser.add_argument("--streams", type=int, default=1,
                        help="concurrent sessions through StreamingService "
                             "(1 = a single standalone session)")
    parser.add_argument("--max-wait", type=float, default=0.05,
                        help="service batch-fill window (s)")
    parser.add_argument("--max-total-wait", type=float, default=None,
                        help="rolling-fill hard cap (s); set equal to "
                             "--max-wait to reproduce the fixed-window "
                             "scheduler")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--realtime", action="store_true",
                        help="sleep between blocks to simulate a live mic "
                             "(default: feed as fast as possible and "
                             "measure only the finalize latency)")
    parser.add_argument("--host-prof", action="store_true",
                        help="accumulate per-stage host-work timers in the "
                             "session/scheduler hot path and print the "
                             "table (the saturated-throughput separator is "
                             "per-session HOST work — this names it)")
    args = parser.parse_args()

    if args.host_prof:
        os.environ["WHISPER_AT_TPU_STREAM_PROF"] = "1"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache (bench.py's): the batch buckets
    # (1/2/4/8/...) each compile their own decode programs — without the
    # cache those compiles land inside the measured drive
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

    import jax.numpy as jnp

    model = wat.build_model(args.size, seed=0,
                            storage_dtype=(jnp.float32 if args.cpu
                                           else jnp.bfloat16))
    # mirror bench.py's `common` EXACTLY (incl. the quant flags): any
    # option difference is a different compiled decode program, and a cold
    # large-v1 compile over the tunnel costs tens of seconds INSIDE the
    # measured drive — diagnosed 2026-08-20 when this profiler measured
    # 14.5 audio-s/s while the identically-shaped bench row measured 66
    opts = dict(language="en", temperature=0.0, sample_len=args.sample_len,
                logprob_threshold=None, compression_ratio_threshold=None,
                no_speech_threshold=None, fp16=not args.cpu,
                kv_quant=True, kv_bits=8, weight_quant=True,
                self_kv_quant=True)

    def make_wave(seed):
        rng = np.random.default_rng(seed)
        n = int(16000 * 60 * args.minutes)
        t = np.arange(n) / 16000.0
        return (0.3 * np.sin(2 * np.pi * (220.0 + 10 * seed) * t)
                + 0.05 * rng.standard_normal(n)).astype(np.float32)

    block = int(16000 * args.block_ms / 1000)

    def drive(sess, wave, latencies):
        """Feed one stream; record latency of every feed that processed a
        window (seek advanced) — including silence/degenerate windows that
        emit no segments but still cost a decode."""
        for lo in range(0, len(wave), block):
            seek_before = sess._seek
            t0 = time.perf_counter()
            sess.feed(wave[lo:lo + block])
            dt = time.perf_counter() - t0
            if sess._seek > seek_before:
                latencies.append(dt)
            if args.realtime:
                time.sleep(max(0.0, args.block_ms / 1000 - dt))
        t0 = time.perf_counter()
        result = sess.finish()
        return result, time.perf_counter() - t0

    if args.streams == 1:
        # warmup session compiles the streaming mel + decode programs
        warm = wat.StreamingTranscriber(model, **opts)
        warm.feed(make_wave(99)[: 16000 * 31])
        warm.finish()
        latencies = []
        t_start = time.perf_counter()
        result, finish_s = drive(
            wat.StreamingTranscriber(model, **opts), make_wave(0), latencies
        )
        wall = time.perf_counter() - t_start
        n_segments = len(result["segments"])
        stats_line = ""
    else:
        import threading

        service = wat.StreamingService(
            model, max_wait_s=args.max_wait,
            max_total_wait_s=args.max_total_wait,
        )
        # full bucket-ladder warmup (the bench row's path): a single-session
        # warmup leaves the multi-stream buckets cold and ONE mid-drive
        # large-v1 bucket compile (tens of seconds tunneled) wrecks the
        # aggregate + p95
        service.warmup(args.streams, **opts)
        warm_stats = service.stats()         # excluded from the drive's

        waves = [make_wave(i) for i in range(args.streams)]
        sessions = [service.open(**opts) for _ in range(args.streams)]
        latencies: list = []
        finishes = []
        t_start = time.perf_counter()

        def run(i):
            _, fin = drive(sessions[i], waves[i], latencies)
            finishes.append(fin)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(args.streams)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t_start
        finish_s = max(finishes)
        n_segments = None
        st = service.stats()
        stats_line = (
            f"  service: {st['windows'] - warm_stats['windows']} window "
            f"decodes in {st['batches'] - warm_stats['batches']} batches "
            f"(max {st['max_batch_windows']}/batch; warmup excluded)")
        service.close()

    lat = sorted(latencies)
    total_audio = 60 * args.minutes * args.streams
    print(f"{args.streams} stream(s), {args.minutes:.1f} min each, fed in "
          f"{args.block_ms} ms blocks: {len(lat)} window finalizations"
          + (f", {n_segments} segments" if n_segments is not None else ""))
    if stats_line:
        print(stats_line)
    if lat:
        print(f"window-finalize latency: p50 {lat[len(lat) // 2]:.3f}s  "
              f"p95 {lat[int(len(lat) * 0.95) if len(lat) > 1 else 0]:.3f}s  "
              f"max {lat[-1]:.3f}s  (finish(): {finish_s:.3f}s)")
        rt_budget = 30.0  # a window spans 30 s of audio
        print(f"real-time headroom: {rt_budget / lat[-1]:.1f}x "
              f"(worst window vs its 30 s budget); aggregate "
              f"{total_audio / wall:.1f} audio-s/s over the drive")

    if args.host_prof:
        from whisper_at_tpu.streaming import prof_snapshot

        snap = prof_snapshot()
        n_windows = max((v["count"] for k, v in snap.items()
                         if k == "decode-wait"), default=1)
        print(f"\nhost-work profile over the whole drive "
              f"({n_windows} windows; wall vs CPU separates blocked-wait "
              f"from GIL-holding work):")
        for k, v in sorted(snap.items(), key=lambda kv: -kv[1]["wall_ms"]):
            print(f"  {k:<18} wall {v['wall_ms']:>9.1f} ms  "
                  f"cpu {v['cpu_ms']:>8.1f} ms  x{v['count']:<5} "
                  f"({v['wall_us_each']:.0f} us each)")


if __name__ == "__main__":
    main()
