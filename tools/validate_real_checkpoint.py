#!/usr/bin/env python
"""Validate whisper_at_tpu against REAL released checkpoints, end to end.

The parity contract of the reference (package/whisper-at/README.md) is:
transcripts identical to OpenAI Whisper and AudioSet tag logits from the
released TL-TR heads. This harness checks that contract the moment real
weights are reachable (network, or files dropped into --download-root /
passed via --checkpoint/--at-checkpoint):

  stage 1  load        registry download (or local .pt/.pth pair) -> model
  stage 2  activations fp32 torch-oracle cross-check on one mel window
                       (encoder feats, TL-TR tag logits, decoder logits)
  stage 3  transcribe  sequential transcribe; --expect substring assert
                       (upstream's integration-test style: whisper fork
                       tests/test_transcribe.py asserts a known substring)
  stage 4  batched     TPU fast path; text vs sequential + tags sanity
  stage 5  quant       int8 cross-KV + int8 weight token parity on the
                       REAL weights (bench defaults are only trustworthy
                       once this passes here), plus the int4 cross-KV
                       opt-in
  stage 5b reference   the LITERAL reference package runs the same weights
                       (exported via checkpoint.export_torch_state_dict
                       into the reference Whisper) on the same audio;
                       transcripts diff token-by-token and tag logits
                       elementwise — the strongest offline-capable oracle
                       (--reference-package to point elsewhere,
                       --skip-reference to skip for big models)
  stage 5c draft       (--draft SIZE) speculative decoding on the real
                       weights: token parity vs plain greedy + the
                       measured draft-acceptance rate (tokens/round)
  stage 6  goldens     record transcript/tag-logit goldens to an .npz for
                       regression testing

Offline note (2026-08-16): this sandbox has zero egress and an empty
~/.cache/whisper, so stages can only run on synthetic checkpoints
(tests/test_real_checkpoint.py drives exactly that path). Run this script
with network or cached weights to produce the real parity evidence.

Usage:
  python tools/validate_real_checkpoint.py --model tiny --audio clip.wav \
      --expect "and so my fellow americans" --out goldens_tiny.npz
  python tools/validate_real_checkpoint.py --checkpoint tiny.pt \
      --at-checkpoint tiny_ori.pth --audio clip.wav
"""

import argparse
import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_oracle():
    """tests/oracle_torch.py: fp32 torch forward, module-parity-tested
    against the reference architecture."""
    path = os.path.join(REPO, "tests", "oracle_torch.py")
    spec = importlib.util.spec_from_file_location("oracle_torch", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def stage(name):
    print(f"\n=== stage: {name} ===", flush=True)


def check(ok, msg):
    print(("PASS  " if ok else "FAIL  ") + msg, flush=True)
    return bool(ok)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default=None,
                    help="official model name (downloads both checkpoints)")
    ap.add_argument("--checkpoint", default=None, help="local Whisper .pt")
    ap.add_argument("--at-checkpoint", default=None,
                    help="local TL-TR head .pth")
    ap.add_argument("--download-root", default=None)
    ap.add_argument("--audio", required=True, help="a real speech file")
    ap.add_argument("--expect", default=None,
                    help="substring the (normalized) transcript must contain")
    ap.add_argument("--language", default=None)
    ap.add_argument("--out", default=None, help="write goldens .npz here")
    ap.add_argument("--fp32", action="store_true",
                    help="run transcription in fp32 (default bf16)")
    ap.add_argument("--skip-activations", action="store_true")
    ap.add_argument("--skip-quant", action="store_true")
    ap.add_argument("--reference-package",
                    default="/root/reference/package/whisper-at",
                    help="path to the literal reference checkout for the "
                         "differential stage")
    ap.add_argument("--skip-reference", action="store_true",
                    help="skip the reference-package differential (the "
                         "reference runs on torch CPU — slow for large "
                         "models)")
    ap.add_argument("--draft", default=None,
                    help="official size for the speculative-decode stage "
                         "(e.g. base): token parity + measured acceptance "
                         "on the real weights")
    ap.add_argument("--atol", type=float, default=2e-2,
                    help="activation tolerance vs the fp32 torch oracle")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    import whisper_at_tpu as wat
    from whisper_at_tpu.audio import load_audio
    from whisper_at_tpu.normalizers import EnglishTextNormalizer

    failures = []

    # ---- stage 1: load -------------------------------------------------- #
    stage("load")
    if args.model is not None:
        model = wat.load_model(
            args.model, download_root=args.download_root,
            dtype=jnp.float32 if args.fp32 else None,
        )
        model_name = args.model
    elif args.checkpoint is not None:
        model = wat.load_model(
            args.checkpoint, at_checkpoint=args.at_checkpoint,
            dtype=jnp.float32 if args.fp32 else None,
        )
        model_name = os.path.basename(args.checkpoint)
    else:
        ap.error("need --model or --checkpoint")
    d = model.dims
    if not check(True, f"loaded {model_name}: {d.n_audio_layer}L audio / "
                       f"{d.n_text_layer}L text / {d.n_audio_state}d"):
        failures.append("load")

    audio = load_audio(args.audio)
    print(f"audio: {len(audio) / 16000:.1f}s @ 16 kHz")

    # ---- stage 2: activation cross-check vs fp32 torch oracle ----------- #
    if not args.skip_activations:
        stage("activations (fp32 torch oracle)")
        import jax

        from whisper_at_tpu.audio import (
            N_FRAMES, N_SAMPLES, log_mel_spectrogram, pad_or_trim,
        )
        from whisper_at_tpu.models.at_head import at_head_apply
        from whisper_at_tpu.models.decoder import (
            decoder_forward, init_cache, precompute_cross_kv, project_logits,
        )
        from whisper_at_tpu.models.encoder import encoder_apply

        oracle = _load_oracle()
        params32 = jax.tree.map(
            lambda x: np.asarray(x, np.float32), model.params
        )
        mel = np.asarray(
            pad_or_trim(log_mel_spectrogram(audio[:N_SAMPLES]), N_FRAMES),
            np.float32,
        )

        feats, at_feats = encoder_apply(
            params32["encoder"], jnp.asarray(mel[None]), d.n_audio_head,
            jnp.float32,
        )
        tags = at_head_apply(
            params32["at_model"], at_feats, model.at_mode, 25, 3
        )
        o_feats, o_at = oracle.encoder(
            params32["encoder"], mel[None], d.n_audio_head
        )
        o_feats = o_feats.detach().numpy()
        o_tags = oracle.at_head(
            params32["at_model"], o_at[0].detach().numpy(), model.at_mode,
            10, label_dim=int(tags.shape[-1]),
        ).detach().numpy()
        err_f = float(np.abs(np.asarray(feats[0]) - o_feats[0]).max())
        err_t = float(np.abs(np.asarray(tags[0]) - o_tags).max())
        if not check(err_f < args.atol, f"encoder feats max|Δ|={err_f:.2e}"):
            failures.append("activations:encoder")
        if not check(err_t < args.atol, f"TL-TR tag logits max|Δ|={err_t:.2e}"):
            failures.append("activations:tags")

        sot = [50258, 50259, 50359, 50364] if model.is_multilingual \
            else [50257, 50362]
        tokens = jnp.asarray([sot], jnp.int32)
        ck, cv = precompute_cross_kv(
            params32["decoder"], feats, d.n_text_head, jnp.float32
        )
        sk, sv = init_cache(
            d.n_text_layer, 1, len(sot), d.n_text_state, jnp.float32,
            d.n_text_head,
        )
        hid, _, _ = decoder_forward(
            params32["decoder"], tokens, ck, cv, sk, sv, jnp.int32(0),
            jnp.int32(0), d.n_text_head, jnp.float32,
        )
        logits = np.asarray(project_logits(params32["decoder"], hid)[0])
        o_logits = oracle.decoder_logits(
            params32["decoder"], np.asarray(tokens), o_feats, d.n_text_head
        ).detach().numpy()[0]
        err_l = float(np.abs(logits - o_logits).max())
        if not check(err_l < args.atol, f"decoder logits max|Δ|={err_l:.2e}"):
            failures.append("activations:decoder")

    # ---- stage 3: sequential transcribe --------------------------------- #
    stage("sequential transcribe")
    result = wat.transcribe(model, audio, fp16=not args.fp32,
                            language=args.language, verbose=None)
    print(f"text: {result['text']!r}")
    if args.expect is not None:
        norm = EnglishTextNormalizer()
        ok = norm(args.expect) in norm(result["text"])
        if not check(ok, f"transcript contains {args.expect!r}"):
            failures.append("transcribe:expect")

    # ---- stage 4: batched path ------------------------------------------ #
    stage("batched transcribe (TPU fast path)")
    batched = wat.transcribe_batched(
        model, audio, fp16=not args.fp32, language=args.language,
        kv_quant=False, weight_quant=False,
    )
    print(f"text: {batched['text']!r}")
    tags_arr = np.asarray(batched["audio_tag"])
    if not check(np.isfinite(tags_arr).all() and tags_arr.shape[-1] == 527,
                 f"tag logits finite, shape {tags_arr.shape}"):
        failures.append("batched:tags")
    top = wat.parse_at_label(batched, language="en", top_k=3)
    for seg in top[:3]:
        print("  tags@{}: {}".format(
            seg.get("time"), [t[0] for t in seg.get("audio tags", [])]))
    if args.expect is not None:
        norm = EnglishTextNormalizer()
        if not check(norm(args.expect) in norm(batched["text"]),
                     "batched transcript contains the expected text"):
            failures.append("batched:expect")

    # ---- stage 5: int8 quantization parity on REAL weights -------------- #
    if not args.skip_quant:
        stage("int8 KV+weight quantization parity")
        quant = wat.transcribe_batched(
            model, audio, fp16=not args.fp32, language=args.language,
            kv_quant=True, weight_quant=True,
        )
        same_text = quant["text"] == batched["text"]
        if not check(same_text, "int8 tokens identical to bf16 tokens"):
            norm = EnglishTextNormalizer()
            close = norm(quant["text"]) == norm(batched["text"])
            check(close, "  (normalized texts still match)")
            failures.append("quant:tokens" if not close else "quant:raw-only")

        # the fused-layout precompute ships two implementations (XLA and
        # the ops/kv_quant.py pallas kernel, the TPU default); their int8
        # artifacts can differ at bf16 rounding boundaries, so check the
        # impl choice does not move REAL-weight tokens either
        old = os.environ.get("WHISPER_AT_TPU_KV_PRECOMPUTE")
        try:
            impl_text = {}
            for impl in ("xla", "kernel"):
                os.environ["WHISPER_AT_TPU_KV_PRECOMPUTE"] = impl
                r = wat.transcribe_batched(
                    model, audio, fp16=not args.fp32,
                    language=args.language, kv_quant=True,
                    weight_quant=True, kv_layout="fused",
                )
                impl_text[impl] = r["text"]
            if not check(impl_text["xla"] == impl_text["kernel"],
                         "kernel-precompute tokens identical to xla"):
                failures.append("quant:impl-ab")
        finally:
            if old is None:
                os.environ.pop("WHISPER_AT_TPU_KV_PRECOMPUTE", None)
            else:
                os.environ["WHISPER_AT_TPU_KV_PRECOMPUTE"] = old

        # int4 cross-KV opt-in: the remaining byte-level decode lever ships
        # off by default pending exactly this real-weight check
        quant4 = wat.transcribe_batched(
            model, audio, fp16=not args.fp32, language=args.language,
            kv_quant=True, weight_quant=True, kv_bits=4,
        )
        if not check(quant4["text"] == batched["text"],
                     "int4 cross-KV tokens identical to bf16 tokens"):
            norm = EnglishTextNormalizer()
            close = norm(quant4["text"]) == norm(batched["text"])
            check(close, "  (normalized texts still match)")
            failures.append("quant:int4" if not close else "quant:int4-raw")

    # ---- stage 5b: literal-reference differential ------------------------ #
    ref_pkg = os.path.join(args.reference_package, "whisper_at")
    if not args.skip_reference and os.path.isdir(ref_pkg):
        stage("reference-package differential")
        spec = importlib.util.spec_from_file_location(
            "refpkg", os.path.join(REPO, "tests", "refpkg.py"))
        refpkg = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(refpkg)
        # point the loader at the requested checkout (globals are read at
        # call time)
        refpkg.REF_ROOT = args.reference_package
        refpkg.REF_PKG = ref_pkg

        import torch

        from whisper_at_tpu.checkpoint import export_torch_state_dict

        sd = export_torch_state_dict(model.params,
                                     at_low_compute=model.at_low_compute)
        dims_dict = {k: getattr(d, k) for k in (
            "n_mels", "n_audio_ctx", "n_audio_state", "n_audio_head",
            "n_audio_layer", "n_vocab", "n_text_ctx", "n_text_state",
            "n_text_head", "n_text_layer")}
        ref_model = refpkg.build_reference_model(
            dims_dict, sd, at_low_compute=model.at_low_compute)
        kw = dict(language=args.language or result["language"],
                  fp16=False, temperature=0.0, verbose=None)
        with torch.no_grad():
            ref_res = ref_model.transcribe(audio, **kw)
        mine_fp32 = wat.transcribe(model, audio, **kw)
        ref_toks = [list(s["tokens"]) for s in ref_res["segments"]]
        my_toks = [list(s["tokens"]) for s in mine_fp32["segments"]]
        if not check(ref_toks == my_toks,
                     "fp32 transcript tokens identical to the literal "
                     "reference"):
            failures.append("reference:tokens")
            print(f"  reference: {ref_res['text']!r}")
            print(f"  ours     : {mine_fp32['text']!r}")
        rtag = np.asarray(ref_res["audio_tag"])
        mtag = np.asarray(mine_fp32["audio_tag"])
        err = (float(np.abs(rtag - mtag).max())
               if rtag.shape == mtag.shape else float("inf"))
        if not check(err < 1e-2, f"tag logits vs reference max|Δ|={err:.2e}"):
            failures.append("reference:tags")
    elif not args.skip_reference:
        print(f"\n(reference package not found at {ref_pkg}; skipping "
              "differential stage)")

    # ---- stage 5c: speculative decoding on real weights ------------------ #
    if args.draft is not None:
        stage(f"speculative decode (draft={args.draft})")
        from whisper_at_tpu import decoding as _dec

        draft = wat.load_model(args.draft,
                               download_root=args.download_root,
                               dtype=jnp.float32 if args.fp32 else None)
        spec_res = wat.transcribe_batched(
            model, audio, fp16=not args.fp32, language=args.language,
            temperature=0.0, draft_model=draft,
        )
        plain = wat.transcribe_batched(
            model, audio, fp16=not args.fp32, language=args.language,
            temperature=0.0,
        )
        if not check(spec_res["text"] == plain["text"],
                     "speculative tokens identical to plain greedy"):
            failures.append("spec:tokens")
        stats = _dec._LAST_SPEC_STATS or {}
        print(f"  acceptance: {stats.get('tokens_per_round', float('nan')):.2f} "
              f"tokens/round over {stats.get('rounds')} rounds "
              "(>=3 on real speech makes speculation the latency default)")

    # ---- stage 6: goldens ------------------------------------------------ #
    if args.out:
        stage("record goldens")
        np.savez_compressed(
            args.out,
            model=model_name,
            text=batched["text"],
            language=batched["language"],
            audio_tag=tags_arr,
            segment_starts=np.asarray(
                [s["start"] for s in batched["segments"]], np.float64),
            segment_texts=np.asarray(
                [s["text"] for s in batched["segments"]], object),
        )
        print(f"wrote {args.out}")

    print("\n" + ("ALL STAGES PASSED" if not failures
                  else f"FAILURES: {failures}"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
