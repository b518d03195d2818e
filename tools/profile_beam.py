"""Beam-loop gather A/B: bucketed live-prefix gather vs full-cache take.

The beam step re-gathers the whole self-KV cache along the beam axis every
step (decoding.beam_sample_loop); _gather_beam_cache moves only a static
bucket covering the live slots. This times the full jitted beam loop both
ways, back to back, on identical inputs — the decision record for keeping
the bucketed gather.

Usage (real TPU; ~5 min):
    python tools/profile_beam.py [--size large-v1] [--audios 4] [--beam 5]
        [--steps 96] [--reps 3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="large-v1")
    ap.add_argument("--audios", type=int, default=4)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import whisper_at_tpu as wat
    from whisper_at_tpu import decoding as dec

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
    from whisper_at_tpu.models.decoder import precompute_cross_kv

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
        fn = dec.beam_sample_loop  # module-level jitted
        fn.clear_cache()  # force a retrace so the gather variant applies
        kw = dict(
            prefill=prefill, total=total, max_steps=args.steps,
            beam_size=k, max_candidates=k, n_head=nh, compute_dtype=cd,
            eot=50257, ts_begin=50364, blank_token=220, no_speech_id=50362,
            max_initial_ts_index=50, suppress_blank=True,
            with_ts_rules=False, self_kv_quant=True,
        )
        out = fn(dec_params, ck, cv, buf, jnp.int32(0), jnp.int32(0),
                 suppress, **kw)
        _ = np.asarray(out[0][:1, :1, :1])  # force completion
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(dec_params, ck, cv, buf, jnp.int32(0), jnp.int32(0),
                     suppress, **kw)
            _ = np.asarray(out[0][:1, :1, :1])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{tag}: best {best*1e3:.1f} ms "
              f"({best/args.steps*1e3:.2f} ms/step), all "
              f"{[round(t*1e3, 1) for t in times]}", flush=True)
        return best

    # A: bucketed (current code)
    t_bucket = run("bucketed gather")
    # B: full take (monkeypatch before the jit trace)
    orig = dec._gather_beam_cache
    dec._gather_beam_cache = lambda cache, src, live, total: jax.tree.map(
        lambda x: jnp.take(x, src, axis=1), cache
    )
    try:
        t_full = run("full-cache gather")
    finally:
        dec._gather_beam_cache = orig
    print(f"speedup: {t_full / t_bucket:.3f}x "
          f"({'keep bucketed' if t_bucket < t_full else 'REVERT: full wins'})")


if __name__ == "__main__":
    main()
