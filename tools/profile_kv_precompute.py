"""A/B the fused cross-KV precompute implementations on the current backend.

Times precompute_cross_kv(layout="fused") with the XLA formulation vs the
ops/kv_quant.py pallas projection+quantize kernel, and cross-checks their
artifacts. This is the gate for flipping WHISPER_AT_TPU_KV_PRECOMPUTE's
default to "kernel" on TPU (models/decoder.py): the kernel must (a) compile
under Mosaic, (b) match the XLA artifacts within the rounding-boundary
budget, and (c) be measurably faster.

Usage (real TPU; ~2 min including compiles):
    python tools/profile_kv_precompute.py [--size large-v1] [--batch 24]
        [--bits 8] [--iters 5]

Tunnel measurement rules (STATUS.md): completion forced with np.asarray on
a data-dependent slice; best-of-N to dodge service-window noise.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="large-v1")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--bits", type=int, default=8, choices=(8, 4))
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import whisper_at_tpu as wat
    from whisper_at_tpu.models.decoder import precompute_cross_kv

    model = wat.build_model(args.size, storage_dtype=jnp.bfloat16, seed=0)
    dims = model.dims
    cd = jnp.bfloat16 if not args.cpu else jnp.float32
    dec_params = model.decoder_params_decode(True)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        rng.standard_normal(
            (args.batch, dims.n_audio_ctx, dims.n_audio_state)
        ).astype(np.float32), cd)

    def force(kv):
        ck, cv = kv
        payload = "q4" if "q4" in ck else "q"
        return (np.asarray(ck[payload][-1, -1, :1, :1]),
                np.asarray(cv[payload][-1, -1, :1, :1]))

    results = {}
    arts = {}
    for impl in ("xla", "kernel"):
        os.environ["WHISPER_AT_TPU_KV_PRECOMPUTE"] = impl
        t0 = time.perf_counter()
        kv = precompute_cross_kv(dec_params, xa, dims.n_text_head, cd,
                                 quantize=True, layout="fused",
                                 bits=args.bits)
        force(kv)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            kv = precompute_cross_kv(dec_params, xa, dims.n_text_head, cd,
                                     quantize=True, layout="fused",
                                     bits=args.bits)
            force(kv)
            times.append(time.perf_counter() - t0)
        arts[impl] = kv
        results[impl] = (compile_s, min(times), times)
        print(f"{impl:7s} compile {compile_s:6.1f}s  "
              f"best {min(times) * 1e3:8.2f} ms  "
              f"all {[round(t * 1e3, 1) for t in times]}")

    # artifact cross-check (bf16 MXU accumulation-order differences can flip
    # rounding-boundary values by one level; anything more is a bug)
    payload = "q4" if args.bits == 4 else "q"
    for idx, name in ((0, "K"), (1, "V")):
        qx = np.asarray(arts["xla"][idx][payload]).astype(np.int32)
        qk = np.asarray(arts["kernel"][idx][payload]).astype(np.int32)
        diff = np.abs(qx - qk)
        frac = float((diff > 0).mean())
        print(f"{name}: max|dq|={int(diff.max())}  frac_diff={frac:.2e}")
        sx = np.asarray(arts["xla"][idx]["s"])
        sk = np.asarray(arts["kernel"][idx]["s"])
        denom = np.maximum(np.abs(sx), 1e-30)
        print(f"{name} scales: max rel diff="
              f"{float(np.max(np.abs(sx - sk) / denom)):.2e}")

    speedup = results["xla"][1] / results["kernel"][1]
    print(f"kernel speedup vs xla: {speedup:.2f}x "
          f"({results['xla'][1] * 1e3:.1f} -> "
          f"{results['kernel'][1] * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
