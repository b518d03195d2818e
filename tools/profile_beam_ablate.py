"""Beam-step component ablation: where do the milliseconds go — the A/B
decision record for the beam-step formulation choices.

The large-beam preset was the weakest perf point (r03: 97.93 audio-s/s =
1.96x target vs 6.58x for greedy). The first v5e ablation (2026-08-20)
measured: top-k formulation and finished-buffer gating both within noise
(+-0.06 ms/step), while the beam KV-cache reorder was 27.35 of the
38.33 ms/step (71%) — jnp.take over axis 1 of the [L, B, H, ctx, Dh]
cache lowers to a ~24 GB/s TPU gather. The shipped fix expresses the
permutation as a one-hot MXU matmul over bitcast uint8 lanes
(decoding._permute_rows_matmul). This measures the full jitted loop:

  A  shipped loop (full-cache one-hot-matmul permute, lax.top_k)
  B  jnp.take cache permute (the pre-fix formulation)
  E  live-prefix-bucketed matmul permute (helps take, hurts matmul:
     the cond + dynamic_update_slice write-back outweighs saved bytes)
  C  iterated-argmax top-k instead of lax.top_k
  D  no-op gather (bounds the remaining reorder cost; results invalid)

Usage (real TPU):
    python tools/profile_beam_ablate.py --size large-v1 --audios 16 \
        --beam 5 --steps 96
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="large-v1")
    ap.add_argument("--audios", type=int, default=16)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--with-ts-rules", action="store_true", default=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache (bench.py's)
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    import whisper_at_tpu as wat
    from whisper_at_tpu import decoding as dec
    from whisper_at_tpu.models.decoder import precompute_cross_kv

    model = wat.build_model(args.size, storage_dtype=jnp.bfloat16, seed=0)
    dims = model.dims
    cd = jnp.bfloat16
    a, k = args.audios, args.beam
    bk = a * k
    nh = dims.n_text_head

    dec_params = model.decoder_params_decode(True)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (a, dims.n_audio_ctx, dims.n_audio_state)
        ).astype(np.float32),
        cd,
    )
    ck, cv = precompute_cross_kv(
        dec_params, feats, nh, cd, quantize=True, layout="heads"
    )

    prefill, total = 4, 4 + args.steps
    buf = jnp.zeros((bk, total), jnp.int32)
    buf = buf.at[:, :prefill].set(
        jnp.asarray([[50258, 50259, 50359, 50364]], jnp.int32)
    )
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)

    def run(tag):
        fn = dec.beam_sample_loop
        fn.clear_cache()  # force retrace so patched components apply
        kw = dict(
            prefill=prefill, total=total, max_steps=args.steps,
            beam_size=k, max_candidates=k, n_head=nh, compute_dtype=cd,
            eot=50257, ts_begin=50364, blank_token=220, no_speech_id=50362,
            max_initial_ts_index=50, suppress_blank=True,
            with_ts_rules=args.with_ts_rules, self_kv_quant=True,
        )
        out = fn(dec_params, ck, cv, buf, jnp.int32(0), jnp.int32(0),
                 suppress, **kw)
        _ = np.asarray(out[0][:1, :1, :1])
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(dec_params, ck, cv, buf, jnp.int32(0), jnp.int32(0),
                     suppress, **kw)
            _ = np.asarray(out[0][:1, :1, :1])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{tag:<34} best {best*1e3:7.1f} ms "
              f"({best/args.steps*1e3:6.2f} ms/step) "
              f"all {[round(t*1e3) for t in times]}", flush=True)
        return best

    t_a = run("A shipped (matmul permute)")

    dec._GATHER_IMPL = "take"
    try:
        t_b = run("B jnp.take permute")
    finally:
        dec._GATHER_IMPL = "matmul"

    orig_bucket = dec._GATHER_BUCKET
    dec._GATHER_BUCKET = True
    try:
        t_e = run("E matmul, live-prefix bucketed")
    finally:
        dec._GATHER_BUCKET = orig_bucket

    def argmax_topk(x, kk):
        vals, idxs = [], []
        iota = jnp.arange(x.shape[-1], dtype=jnp.int32)[None, :]
        for _ in range(kk):
            i = jnp.argmax(x, axis=-1).astype(jnp.int32)
            vals.append(jnp.take_along_axis(x, i[:, None], axis=1)[:, 0])
            idxs.append(i)
            x = jnp.where(iota == i[:, None], dec.NEG_INF, x)
        return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)

    orig_topk = dec._beam_topk
    dec._beam_topk = argmax_topk
    try:
        t_c = run("C iterated-argmax top-k")
    finally:
        dec._beam_topk = orig_topk

    orig_gather = dec._gather_beam_cache
    dec._gather_beam_cache = lambda cache, src, live, total: cache
    try:
        t_d = run("D no beam-cache gather (invalid)")
    finally:
        dec._gather_beam_cache = orig_gather

    print(f"\ntake-permute tax: {(t_b - t_a) / args.steps * 1e3:+.2f} "
          f"ms/step; bucketing tax: {(t_e - t_a) / args.steps * 1e3:+.2f} "
          f"ms/step; argmax-topk tax: {(t_c - t_a) / args.steps * 1e3:+.2f} "
          f"ms/step; remaining cache-permute cost: "
          f"{(t_a - t_d) / args.steps * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
