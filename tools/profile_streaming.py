"""Streaming-session latency profile: feed a live stream in small blocks,
measure the wall time each 30 s window takes to finalize into segments.

The interactive serving metric the batch benches don't capture: when a
window's last sample arrives, how long until its transcript (and tags) are
in hand? That is one window's mel + encode + decode + host assembly at
batch 1 (plus the quality-ladder re-decodes when the gate rejects).

Usage:
  python tools/profile_streaming.py --size large-v1 --minutes 3
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
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--realtime", action="store_true",
                        help="sleep between blocks to simulate a live mic "
                             "(default: feed as fast as possible and "
                             "measure only the finalize latency)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import whisper_at_tpu as wat

    model = wat.build_model(args.size, seed=0)
    opts = dict(language="en", temperature=0.0, sample_len=args.sample_len,
                logprob_threshold=None, compression_ratio_threshold=None,
                no_speech_threshold=None, fp16=not args.cpu)

    rng = np.random.default_rng(0)
    n = int(16000 * 60 * args.minutes)
    t = np.arange(n) / 16000.0
    wave = (0.3 * np.sin(2 * np.pi * 220.0 * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)

    # warmup session compiles the streaming mel + decode programs
    warm = wat.StreamingTranscriber(model, **opts)
    warm.feed(wave[: 16000 * 31])
    warm.finish()

    sess = wat.StreamingTranscriber(model, **opts)
    block = int(16000 * args.block_ms / 1000)
    latencies, n_segments = [], 0
    for lo in range(0, n, block):
        piece = wave[lo:lo + block]
        t0 = time.perf_counter()
        segs = sess.feed(piece)
        dt = time.perf_counter() - t0
        if segs:
            latencies.append(dt)
            n_segments += len(segs)
        elif args.realtime:
            time.sleep(max(0.0, args.block_ms / 1000 - dt))
    t0 = time.perf_counter()
    result = sess.finish()
    finish_s = time.perf_counter() - t0
    n_segments = len(result["segments"])

    lat = sorted(latencies)
    print(f"fed {args.minutes:.1f} min in {args.block_ms} ms blocks: "
          f"{len(lat)} window finalizations, {n_segments} segments total")
    if lat:
        print(f"window-finalize latency: p50 {lat[len(lat) // 2]:.3f}s  "
              f"max {lat[-1]:.3f}s  (finish(): {finish_s:.3f}s)")
        rt_budget = 30.0  # a window spans 30 s of audio
        print(f"real-time headroom: {rt_budget / lat[-1]:.1f}x "
              f"(worst window vs its 30 s budget)")


if __name__ == "__main__":
    main()
