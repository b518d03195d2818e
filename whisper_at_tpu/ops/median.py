"""Sliding median filter over the last axis.

The reference JIT-compiles a source-templated Triton bubble-sort kernel
(whisper_at/triton_ops.py:43-109) with a torch unfold+sort fallback
(timing.py:19-54). On TPU the XLA-native formulation — stack the w shifted
views and jnp.sort over the tiny window axis — compiles to a fixed sorting
network and fuses with the surrounding ops, so no hand-written kernel is
needed for this one.
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
    windows = jnp.stack(
        [padded[..., i : i + length] for i in range(filter_width)], axis=-1
    )
    return jnp.sort(windows, axis=-1)[..., filter_width // 2]
