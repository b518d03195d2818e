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
    # an ambient depth override must not leak into rows that don't pin one
    # (the global rows derive their depth; see ops/cross_decode_stream.py)
    if "WHISPER_AT_TPU_STREAM_NBUF" not in env_overlay:
        env.pop("WHISPER_AT_TPU_STREAM_NBUF", None)
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
    # per-element rings sweep (nbuf, chunk); the global ring pins its depth
    # to chunks-per-element (the kernel's static-slot requirement — an
    # explicit conflicting NBUF raises), so global rows sweep depth via
    # chunk only and are labeled with the DERIVED depth
    ta_bytes = 1536 // (2 if args.kv_bits == 4 else 1)  # large-v1 Ta_pad
    grid = ([(4, 512, False)] if args.quick
            else [(2, 512, False), (4, 512, False), (8, 256, False),
                  (4, 1536, False), (8, 512, False)])
    for nbuf, chunk, global_ring in grid:
        configs.append((
            f"stream n{nbuf} c{chunk}",
            {"WHISPER_AT_TPU_CROSS_DECODE": "stream",
             "WHISPER_AT_TPU_STREAM_NBUF": str(nbuf),
             "WHISPER_AT_TPU_STREAM_CHUNK": str(chunk),
             "WHISPER_AT_TPU_STREAM_GLOBAL": "0"},
        ))
    if not args.quick:
        for chunk in (512, 256, 128):
            configs.append((
                f"stream G c{chunk} d{ta_bytes // chunk}",
                {"WHISPER_AT_TPU_CROSS_DECODE": "stream",
                 "WHISPER_AT_TPU_STREAM_CHUNK": str(chunk),
                 "WHISPER_AT_TPU_STREAM_GLOBAL": "1"},
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
