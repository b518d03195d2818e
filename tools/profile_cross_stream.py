"""A/B the decode cross-attention kernels: shipped vs manual-DMA-ring.

Runs tools/profile_decode.py in fresh subprocesses (the kernel selection
and ring geometry are import-time env constants) for the shipped fused
kernel and a grid of stream-kernel (nbuf, chunk) configs, and reports the
full-decode-loop step time for each. This is the adoption gate for
ops/cross_decode_stream.py: the stream kernel must beat the shipped one at
the bench config (large-v1, batch 24, 96 steps, int8) to become a default.

Usage (real TPU; ~3 min per config incl. compile):
    python tools/profile_cross_stream.py [--size large-v1] [--batch 24]
        [--steps 96] [--kv-bits 8] [--quick]
"""

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(env_overlay, args):
    env = dict(os.environ, **env_overlay)
    cmd = [sys.executable, os.path.join(REPO, "tools", "profile_decode.py"),
           "--size", args.size, "--batch", str(args.batch),
           "--steps", str(args.steps), "--layout", "fused",
           "--kv-bits", str(args.kv_bits)]
    if args.cpu:
        cmd.append("--cpu")
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=1200)
    if proc.returncode != 0:
        return None, proc.stderr[-400:]
    m = re.search(r"L \+ logits: ([0-9.]+) ms total, ([0-9.]+) ms/step",
                  proc.stdout)
    if not m:
        return None, f"no timing line: {proc.stdout[-300:]}"
    return (float(m.group(1)), float(m.group(2))), ""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="large-v1")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--kv-bits", type=int, default=8, choices=(8, 4))
    ap.add_argument("--quick", action="store_true",
                    help="shipped kernel + one stream config only")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend in the workers (smoke runs)")
    args = ap.parse_args()

    configs = [("shipped", {})]
    # (nbuf, chunk, global_ring): the global ring keeps its DMA depth
    # across batch elements — at Ta_pad=1536/chunk=512 a per-element ring
    # only ever has 3 chunks in flight, so the global variants are the
    # ones expected to show a queue-depth effect
    grid = ([(4, 512, True)] if args.quick
            else [(2, 512, False), (4, 512, False), (8, 256, False),
                  (4, 1536, False), (8, 512, False),
                  (4, 512, True), (8, 512, True), (8, 256, True),
                  (16, 128, True)])
    for nbuf, chunk, global_ring in grid:
        configs.append((
            f"stream n{nbuf} c{chunk}{' G' if global_ring else ''}",
            {"WHISPER_AT_TPU_CROSS_DECODE": "stream",
             "WHISPER_AT_TPU_STREAM_NBUF": str(nbuf),
             "WHISPER_AT_TPU_STREAM_CHUNK": str(chunk),
             "WHISPER_AT_TPU_STREAM_GLOBAL": "1" if global_ring else "0"},
        ))

    base = None
    for label, overlay in configs:
        r, err = run_one(overlay, args)
        if r is None:
            print(f"{label:18s} FAILED: {err}")
            continue
        total, step = r
        note = ""
        if label == "shipped":
            base = step
        elif base:
            note = f"  ({base / step:.2f}x vs shipped)"
        print(f"{label:18s} {total:8.1f} ms total  {step:6.3f} ms/step{note}",
              flush=True)


if __name__ == "__main__":
    main()
