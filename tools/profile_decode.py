"""Decode-loop composition profiler: per-layer marginals vs speed-of-light.

Times the jitted N-step decode loop (prefill + token steps + logits) for
the full layer stack and truncated stacks; the per-layer marginal and the
fixed remainder localize where step time goes. Prints the int8 byte-bound
speed-of-light for comparison.

Usage (real TPU; ~5 min including compiles):
    python tools/profile_decode.py [--size large-v1] [--batch 8]
        [--steps 96] [--layout fused|heads]

Measurement notes for the tunneled chip (see STATUS.md): every dispatch
pays ~25-30 ms RTT, so all steps run inside ONE jitted while_loop, and
completion is forced with np.asarray (block_until_ready is unreliable
over the tunnel).
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="large-v1")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--layout", default="fused", choices=["fused", "heads"])
    ap.add_argument("--kv-bits", type=int, default=8, choices=(8, 4))
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="HBM bandwidth for the speed-of-light line (v5e)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the JAX_PLATFORMS env var is "
                         "overridden by the axon TPU plugin; only a config "
                         "update before backend init wins)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import whisper_at_tpu as wat
    from whisper_at_tpu.models.decoder import (
        decoder_forward, init_cache, precompute_cross_kv, project_logits)

    model = wat.build_model(args.size, storage_dtype=jnp.bfloat16, seed=0)
    dims = model.dims
    cd = jnp.bfloat16
    b, steps = args.batch, args.steps
    nh = dims.n_text_head
    dec_params = model.decoder_params_decode(True)  # int8 weights
    xa = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (b, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32), cd)
    ck, cv = precompute_cross_kv(dec_params, xa, nh, cd, quantize=True,
                                 layout=args.layout, bits=args.kv_bits)
    total, prefill = 128, 8

    @partial(jax.jit, static_argnames=("n", "with_logits", "n_layer"))
    def run_steps(dec_params, ck, cv, n, with_logits, n_layer=None):
        if n_layer is not None:
            sl = lambda t: t[:n_layer]  # noqa: E731
            dp = dict(dec_params)
            dp["blocks"] = jax.tree_util.tree_map(sl, dec_params["blocks"])
            ckl = jax.tree_util.tree_map(sl, ck)
            cvl = jax.tree_util.tree_map(sl, cv)
        else:
            dp, ckl, cvl = dec_params, ck, cv
            n_layer = dims.n_text_layer
        sk, sv = init_cache(n_layer, b, total, dims.n_text_state, cd, nh,
                            quantize=True)
        tok0 = jnp.zeros((b, prefill), jnp.int32)
        h, sk, sv = decoder_forward(dp, tok0, ckl, cvl, sk, sv, jnp.int32(0),
                                    jnp.int32(0), nh, cd)
        h = h[:, -1:]

        def body(state):
            t, h, sk, sv, acc = state
            tokv = jnp.full((b, 1), 100, jnp.int32)
            h, sk, sv = decoder_forward(dp, tokv, ckl, cvl, sk, sv,
                                        prefill + t, jnp.int32(0), nh, cd)
            if with_logits:
                acc = acc + project_logits(dp, h)[:, 0].sum()
            else:
                acc = acc + h.sum().astype(jnp.float32)
            return (t + 1, h, sk, sv, acc)

        out = jax.lax.while_loop(lambda s: s[0] < n, body,
                                 (jnp.int32(0), h, sk, sv, jnp.float32(0)))
        return out[4]

    def timeit(fn, iters=3):
        out = fn()
        np.asarray(out)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    half = dims.n_text_layer // 2
    for label, kw in [
        (f"{dims.n_text_layer}L + logits", dict(with_logits=True)),
        (f"{dims.n_text_layer}L no logits", dict(with_logits=False)),
        (f"{half}L no logits", dict(with_logits=False, n_layer=half)),
        (f"{half // 2}L no logits", dict(with_logits=False,
                                         n_layer=half // 2)),
    ]:
        dt = timeit(lambda: run_steps(dec_params, ck, cv, steps, **kw))
        print(f"{label}: {dt * 1000:.1f} ms total, "
              f"{dt / steps * 1e3:.3f} ms/step", flush=True)

    # int8 byte accounting per step
    ly, d, h, ta = (dims.n_text_layer, dims.n_text_state, dims.n_text_head,
                    dims.n_audio_ctx)
    w_bytes = ly * (d * 3 * d + 3 * d * d + 8 * d * d)
    ckv = 2 * ly * b * h * ta * (d // h) * args.kv_bits // 8
    skv = 2 * ly * b * h * total * (d // h)
    emb = dims.n_vocab * d * 2  # bf16 pre-transposed embedding
    sol = (w_bytes + ckv + skv + emb) / (args.hbm_gbps * 1e9) * 1e3
    print(f"weights {w_bytes / 1e6:.0f} MB, crossKV {ckv / 1e6:.0f} MB, "
          f"selfKV {skv / 1e6:.0f} MB, emb {emb / 1e6:.0f} MB per step")
    print(f"speed-of-light @{args.hbm_gbps:.0f} GB/s: {sol:.2f} ms/step")


if __name__ == "__main__":
    main()
