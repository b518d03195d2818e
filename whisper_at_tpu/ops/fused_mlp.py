"""Pallas fused MLP (fc1 -> GELU -> fc2) for the decode step.

In the token-at-a-time decode loop the MLP is three XLA ops per layer whose
[B, 4D] intermediate round-trips HBM and whose per-op dispatch latency adds
up across 32 layers. This kernel streams W1 column-tiles and W2 row-tiles
through VMEM on a hidden-dim grid, accumulating the output in a VMEM scratch:
one op per layer, no HBM intermediate.

Weights may be bf16 or int8 (per-output-channel scales, matching
layers.quantize_linear) — dequant happens in VMEM, so the int8 HBM saving is
actually realized (XLA's int8 path materializes the upcast).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False

TILE_H = 512  # hidden-dim tile


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf approximation (|err| < 1.5e-7).

    Mosaic has no erf/erfc lowering; 1.5e-7 absolute error is ~50x below
    bf16 resolution, so the kernel stays numerically indistinguishable from
    the exact-GELU reference path.
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0**-0.5)))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, acc_ref):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = jnp.dot(
        x_ref[:], w1_ref[:].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    h = _gelu_exact(h).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(
        h, w2_ref[:].astype(x_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = (acc_ref[:] + b2_ref[:].astype(jnp.float32)).astype(
            out_ref.dtype
        )


def _kernel_q(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
              out_ref, acc_ref):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w1 = w1_ref[:].astype(x_ref.dtype)
    h = jnp.dot(x_ref[:], w1, preferred_element_type=jnp.float32)
    h = h * s1_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    h = _gelu_exact(h).astype(x_ref.dtype)
    w2 = w2_ref[:].astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(h, w2, preferred_element_type=jnp.float32) * s2_ref[
        :
    ].astype(jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = (acc_ref[:] + b2_ref[:].astype(jnp.float32)).astype(
            out_ref.dtype
        )


@partial(jax.jit, static_argnames=("interpret",))
def fused_mlp(x: jnp.ndarray, mlp_params: dict, interpret: bool = False):
    """x [B, D] -> mlp(x) [B, D]. mlp_params = {fc1, fc2} (bf16 or int8)."""
    b, d = x.shape
    fc1, fc2 = mlp_params["fc1"], mlp_params["fc2"]
    quantized = "w_q" in fc1
    w1 = fc1["w_q"] if quantized else fc1["w"]
    w2 = fc2["w_q"] if quantized else fc2["w"]
    h4 = w1.shape[-1]
    grid = (h4 // TILE_H,)

    x_spec = pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((d, TILE_H), lambda j: (0, j), memory_space=pltpu.VMEM)
    colv_spec = pl.BlockSpec((1, TILE_H), lambda j: (0, j), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((TILE_H, d), lambda j: (j, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM)

    if quantized:
        return pl.pallas_call(
            _kernel_q,
            grid=grid,
            in_specs=[x_spec, w1_spec, colv_spec, colv_spec, w2_spec,
                      row_spec, row_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
            scratch_shapes=[pltpu.VMEM((b, d), jnp.float32)],
            interpret=interpret,
        )(x, w1, fc1["w_s"].reshape(1, -1), fc1["b"].reshape(1, -1),
          w2, fc2["w_s"].reshape(1, -1), fc2["b"].reshape(1, -1))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[x_spec, w1_spec, colv_spec, w2_spec, row_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, d), jnp.float32)],
        interpret=interpret,
    )(x, w1, fc1["b"].reshape(1, -1), w2, fc2["b"].reshape(1, -1))
