"""Sliding median filter over the last axis.

The reference JIT-compiles a source-templated Triton bubble-sort kernel
(whisper_at/triton_ops.py:43-109) with a torch unfold+sort fallback
(timing.py:19-54). On TPU the XLA-native formulation is an ELEMENTWISE
sorting network over the w shifted views — pairwise jnp.minimum/maximum
compare-exchanges that XLA fuses into one pass, touching each input
element O(w) times in registers. The earlier stack-then-jnp.sort
formulation materialized the [.., w] window tensor PLUS an s32 iota
companion (XLA's stable sort sorts (value, index) pairs): on the batched
word-timing path that was 2 x 7.5 GB of HLO temps for a
[8, 320, 64, 1500] qk slab and OOM'd the 16 GB chip by 194 MB
(bench --words, 2026-08-20). The network needs no index companion and no
stacked materialization; for NaN-free inputs (softmax outputs here) it is
element-exact to the sort.
"""

import jax.numpy as jnp


def median_filter(x: jnp.ndarray, filter_width: int) -> jnp.ndarray:
    """Median over sliding windows of `filter_width` along the last axis,
    with reflect padding (same semantics as the reference's F.pad(reflect))."""
    assert filter_width > 0 and filter_width % 2 == 1, (
        "`filter_width` should be an odd number"
    )
    pad = filter_width // 2
    if x.shape[-1] <= pad:
        return x

    padded = jnp.concatenate(
        [x[..., 1 : pad + 1][..., ::-1], x, x[..., -pad - 1 : -1][..., ::-1]],
        axis=-1,
    )
    length = x.shape[-1]
    vals = [padded[..., i : i + length] for i in range(filter_width)]
    # bubble sorting network: after pass i the largest i+1 elements sit at
    # the tail, so the middle slot holds the exact median when done
    for i in range(filter_width):
        for j in range(filter_width - 1 - i):
            lo = jnp.minimum(vals[j], vals[j + 1])
            hi = jnp.maximum(vals[j], vals[j + 1])
            vals[j], vals[j + 1] = lo, hi
    return vals[filter_width // 2]
