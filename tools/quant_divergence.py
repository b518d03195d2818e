"""Per-step logit divergence of the quantized decode paths vs full precision.

The int8 options (cross-KV, weights, self-KV) ship default-on in bench.py
with token parity proven on synthetic models; released weights are
unreachable in this sandbox, so this tool makes the parity budget
QUANTIFIABLE instead of binary: it teacher-forces the full-precision
greedy token stream through each quantized variant and reports, per decode
step, the max-abs logit difference, the probability mass moved (total
variation), and whether the argmax token flips. A principled accept/reject
for a new quantization scheme (W8A8, int4 KV, ...) is then "TV distance
stays under X for N steps", not just "tokens happened to match once".

Usage:
    python tools/quant_divergence.py --size tiny --steps 32 [--seed 3]
    python tools/quant_divergence.py --size large-v1 --steps 96   # on TPU

Prints one table row per variant and a JSON summary line.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step_fn(model, weight_quant, kv_quant, self_kv_quant, kv_layout,
                  compute_dtype, kv_bits=8, weight_bits=8, self_kv_bits=8):
    import jax
    import jax.numpy as jnp

    from whisper_at_tpu.models.decoder import (
        decoder_forward,
        init_cache,
        precompute_cross_kv,
        project_logits,
    )

    dims = model.dims
    dec = model.decoder_params_decode(weight_quant, weight_bits)

    @jax.jit
    def prepare(feats):
        ck, cv = precompute_cross_kv(
            dec, feats, dims.n_text_head, compute_dtype,
            quantize=kv_quant, layout=kv_layout, bits=kv_bits,
        )
        return ck, cv

    @jax.jit
    def step(tokens, ck, cv, sk, sv, pos):
        hidden, sk, sv = decoder_forward(
            dec, tokens, ck, cv, sk, sv, pos, jnp.int32(0),
            dims.n_text_head, compute_dtype,
        )
        logits = project_logits(dec, hidden[:, -1:, :])[:, 0]
        return logits.astype(jnp.float32), sk, sv

    def run(feats, forced_tokens, sot_seq, n_steps):
        """Returns [n_steps, V] fp32 logits, teacher-forced on forced_tokens
        (or self-fed greedy when forced_tokens is None)."""
        import jax.numpy as jnp

        ck, cv = prepare(feats)
        sk, sv = init_cache(
            dims.n_text_layer, feats.shape[0], dims.n_text_ctx,
            dims.n_text_state, compute_dtype, dims.n_text_head,
            quantize=self_kv_quant, bits=self_kv_bits,
        )
        tokens = jnp.asarray([sot_seq], jnp.int32)
        logits_out = []
        chosen = []
        pos = 0
        for i in range(n_steps):
            logits, sk, sv = step(tokens, ck, cv, sk, sv, jnp.int32(pos))
            logits = np.asarray(logits[0])
            logits_out.append(logits)
            pos += tokens.shape[1]
            nxt = (int(np.argmax(logits)) if forced_tokens is None
                   else int(forced_tokens[i]))
            chosen.append(int(np.argmax(logits)))
            tokens = jnp.asarray([[nxt]], jnp.int32)
        return np.stack(logits_out), chosen

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="tiny")
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fp32", action="store_true",
                   help="fp32 compute for the reference stream (default bf16 "
                        "— the production dtype)")
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (the axon TPU plugin overrides "
                        "JAX_PLATFORMS, so an env var is not enough)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import whisper_at_tpu as wat
    from whisper_at_tpu.audio import log_mel_spectrogram, pad_or_trim, N_FRAMES
    from whisper_at_tpu.tokenizer import get_tokenizer

    compute_dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = wat.build_model(args.size, storage_dtype=compute_dtype,
                            seed=args.seed)
    tokenizer = get_tokenizer(model.is_multilingual, language="en",
                              task="transcribe")
    sot_seq = list(tokenizer.sot_sequence)

    # the same signal class (and int16 PCM grid) the benchmark runs, so the
    # parity budget is measured on the benchmark's actual input
    rng = np.random.default_rng(args.seed)
    t = np.arange(16000 * 30) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    audio = ((np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)
             .astype(np.float32) / 32768.0)
    mel = pad_or_trim(log_mel_spectrogram(audio), N_FRAMES)[None]
    feats, _ = model.embed_audio(mel, fp16=not args.fp32)

    # full-precision reference stream (self-fed greedy)
    ref_run = build_step_fn(model, False, False, False, "heads", compute_dtype)
    ref_logits, ref_tokens = ref_run(feats, None, sot_seq, args.steps)

    variants = {
        "cross-kv-int8": dict(weight_quant=False, kv_quant=True,
                              self_kv_quant=False, kv_layout="heads"),
        "weights-int8": dict(weight_quant=True, kv_quant=False,
                             self_kv_quant=False, kv_layout="heads"),
        "self-kv-int8": dict(weight_quant=False, kv_quant=False,
                             self_kv_quant=True, kv_layout="heads"),
        "all-int8": dict(weight_quant=True, kv_quant=True,
                         self_kv_quant=True, kv_layout="heads"),
        "cross-kv-int4": dict(weight_quant=False, kv_quant=True,
                              self_kv_quant=False, kv_layout="heads",
                              kv_bits=4),
        "int4kv+int8rest": dict(weight_quant=True, kv_quant=True,
                                self_kv_quant=True, kv_layout="heads",
                                kv_bits=4),
        # r5 int4 extensions: weights at +-7 levels (packed two per byte
        # along out), self-KV nibbles along Dh, and the full byte floor
        "weights-int4": dict(weight_quant=True, kv_quant=False,
                             self_kv_quant=False, kv_layout="heads",
                             weight_bits=4),
        "self-kv-int4": dict(weight_quant=False, kv_quant=False,
                             self_kv_quant=True, kv_layout="heads",
                             self_kv_bits=4),
        "all-int4": dict(weight_quant=True, kv_quant=True,
                         self_kv_quant=True, kv_layout="heads",
                         kv_bits=4, weight_bits=4, self_kv_bits=4),
        # fused pallas-kernel layouts (interpret mode off-TPU): the int8
        # row checks the block-diagonal kernel path, the int4 row the
        # Ta-halves nibble packing + in-kernel unpack (ops/cross_decode.py)
        "cross-int8-fused": dict(weight_quant=False, kv_quant=True,
                                 self_kv_quant=False, kv_layout="fused"),
        "cross-int4-fused": dict(weight_quant=False, kv_quant=True,
                                 self_kv_quant=False, kv_layout="fused",
                                 kv_bits=4),
        # precompute impl A/B (ops/kv_quant.py, the TPU default): both rows
        # measure against the SAME fp reference, so their difference from
        # each other is bounded by the triangle inequality — on-chip
        # 2026-08-18 the kernel-vs-xla delta measured the same rounding
        # class as int8-vs-fp itself (max|dlogit| 0.053, zero flips)
        "fused-impl-xla": dict(weight_quant=False, kv_quant=True,
                               self_kv_quant=False, kv_layout="fused",
                               kv_impl="xla"),
        "fused-impl-kernel": dict(weight_quant=False, kv_quant=True,
                                  self_kv_quant=False, kv_layout="fused",
                                  kv_impl="kernel"),
    }

    def softmax(x):
        x = x - x.max(axis=-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(axis=-1, keepdims=True)

    ref_probs = softmax(ref_logits)
    summary = {"size": args.size, "steps": args.steps,
               "dtype": "fp32" if args.fp32 else "bf16", "variants": {}}
    print(f"{'variant':16} {'max|dlogit|':>11} {'mean TV':>9} {'max TV':>8} "
          f"{'argmax flips':>12} {'first flip':>10}")
    for name, cfg in variants.items():
        cfg = dict(cfg)
        impl = cfg.pop("kv_impl", None)
        if impl is not None:
            os.environ["WHISPER_AT_TPU_KV_PRECOMPUTE"] = impl
        run = build_step_fn(model, compute_dtype=compute_dtype, **cfg)
        q_logits, q_argmax = run(feats, ref_tokens, sot_seq, args.steps)
        if impl is not None:
            del os.environ["WHISPER_AT_TPU_KV_PRECOMPUTE"]
        dlogit = np.abs(q_logits - ref_logits).max(axis=-1)
        tv = 0.5 * np.abs(softmax(q_logits) - ref_probs).sum(axis=-1)
        flips = [i for i in range(args.steps) if q_argmax[i] != ref_tokens[i]]
        row = {
            "max_abs_dlogit": float(dlogit.max()),
            "mean_tv": float(tv.mean()),
            "max_tv": float(tv.max()),
            "argmax_flips": len(flips),
            "first_flip_step": flips[0] if flips else None,
        }
        summary["variants"][name] = row
        print(f"{name:16} {row['max_abs_dlogit']:11.4f} {row['mean_tv']:9.5f} "
              f"{row['max_tv']:8.5f} {len(flips):12d} "
              f"{str(row['first_flip_step']):>10}")

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
