"""Speculative-decode floor accounting: measure the round components and the
implied speedup as a function of draft acceptance.

Speculative decoding replaces the reference's one-verifier-forward-per-token
hot loop (whisper_at/decoding.py:672-703) with rounds of: L cheap draft
steps + ONE verifier forward over the L-token run. The verifier's decode
step is DMA-bound (STATUS.md: stream-only kernel == full kernel), so a
(L+1)-position verify forward costs barely more than a 1-position step —
the speedup at acceptance ā tokens/round is

    speedup(ā) = (ā + 1) * T_step / (L * T_draft + T_verify)

This tool measures every term on the real device:
  - T_step       : verifier per-token decode cost (plain greedy loop)
  - T_draft      : draft per-token decode cost
  - T_verify     : the (L+1)-wide verify forward cost (amortized from the
                   full-agreement spec run, where every round is maximal)
  - end-to-end   : spec-vs-greedy wall time with the ACTUAL draft
                   (random weights here -> acceptance ~1/round, the
                   overhead bound; with real checkpoints the same command
                   reports the data-dependent gain)

Usage:
  python tools/profile_spec.py --size large-v1 --draft base --tokens 96
  python tools/profile_spec.py --size tiny --draft tiny --cpu --tokens 16
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, iters=3):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", default="large-v1")
    parser.add_argument("--draft", default="base")
    parser.add_argument("--batch", type=int, default=1,
                        help="speculation is a LATENCY lever: per-row "
                             "acceptance diverges across rows, so small "
                             "batches (live streams, single files) benefit "
                             "most")
    parser.add_argument("--tokens", type=int, default=96)
    parser.add_argument("--lookahead", type=int, default=8)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--kv-quant", action="store_true", default=True)
    parser.add_argument("--no-kv-quant", dest="kv_quant",
                        action="store_false")
    parser.add_argument("--weight-quant", action="store_true", default=True)
    parser.add_argument("--no-weight-quant", dest="weight_quant",
                        action="store_false")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache (bench.py's): large-v1 first compiles
        # are multi-minute on the tunneled compile service
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import whisper_at_tpu as wat
    from whisper_at_tpu import decoding

    print(f"backend: {jax.default_backend()}")
    model = wat.build_model(args.size, seed=0)
    draft = wat.build_model(args.draft, seed=1)

    rng = np.random.default_rng(0)
    mel = (0.4 * rng.standard_normal(
        (args.batch, 80, 3000))).astype(np.float32)
    mel = jax.device_put(mel)

    common = dict(language="en", temperature=0.0, sample_len=args.tokens,
                  kv_quant=args.kv_quant, weight_quant=args.weight_quant)
    L = args.lookahead

    def run(**kw):
        return wat.decode(model, mel, wat.DecodingOptions(**common, **kw))

    # ---- plain greedy: T_step --------------------------------------- #
    run()  # compile
    t_greedy = measure(lambda: run(), args.iters)
    t_step = t_greedy / args.tokens
    print(f"greedy: {t_greedy*1e3:.1f} ms total, "
          f"T_step = {t_step*1e3:.3f} ms/token")

    # ---- full-agreement spec (draft == verifier): isolates the round
    # machinery at maximal acceptance; every round commits L+1 tokens --- #
    run(draft_model=model, draft_lookahead=L)  # compile
    t_full = measure(lambda: run(draft_model=model, draft_lookahead=L),
                     args.iters)
    full_stats = dict(decoding._LAST_SPEC_STATS)
    rounds_full = max(full_stats["rounds"], 1)
    # here draft step == verifier step, so per round:
    #   t_round = L * T_step_v + T_verify  ->  T_verify
    t_verify = max(t_full / rounds_full - L * t_step, 0.0)
    print(f"spec(draft=self, 100% accept): {t_full*1e3:.1f} ms, "
          f"{full_stats['tokens_per_round']:.1f} tok/round, "
          f"T_verify({L + 1} pos) ~= {t_verify*1e3:.3f} ms "
          f"({t_verify / max(t_step, 1e-9):.2f}x a 1-token step)")

    # ---- draft cost: the draft model's own greedy loop ---------------- #
    def run_draft():
        return wat.decode(draft, mel, wat.DecodingOptions(
            language="en", temperature=0.0, sample_len=args.tokens))

    run_draft()
    t_draft_total = measure(run_draft, args.iters)
    t_draft = t_draft_total / args.tokens
    print(f"draft({args.draft}) T_draft = {t_draft*1e3:.3f} ms/token "
          f"({t_draft / max(t_step, 1e-9) * 100:.1f}% of verifier)")

    # ---- end-to-end with the real draft ------------------------------- #
    run(draft_model=draft, draft_lookahead=L)  # compile
    t_spec = measure(lambda: run(draft_model=draft, draft_lookahead=L),
                     args.iters)
    stats = dict(decoding._LAST_SPEC_STATS)
    print(f"spec(draft={args.draft}): {t_spec*1e3:.1f} ms "
          f"({t_greedy / t_spec:.2f}x vs greedy), "
          f"{stats['tokens_per_round']:.2f} tok/round over "
          f"{stats['rounds']} rounds")
    if jax.default_backend() == "tpu":
        print("NOTE: random weights -> near-zero draft agreement; this row "
              "is the OVERHEAD bound. Real checkpoints report the "
              "data-dependent gain with the same command.")

    # ---- implied speedup curve ---------------------------------------- #
    t_round = L * t_draft + t_verify
    print(f"\nimplied speedup(a) = (a+1) * {t_step*1e3:.3f} / "
          f"{t_round*1e3:.3f}  [measured terms]")
    for a in (0, 1, 2, 4, 6, L):
        s = (a + 1) * t_step / max(t_round, 1e-9)
        print(f"  acceptance {a}/{L} per round -> {s:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
