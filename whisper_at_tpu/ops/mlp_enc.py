"""Fused encoder MLP half-block: h + fc2(gelu(fc1(LN(h)))) in one kernel.

The encoder's MLP half-block measured 11.74 ms/layer standalone at
large-v1 batch 24 (82 TFLOP/s, ~40% MFU): XLA materializes the [B*T, 4D]
gelu intermediate (377 MB bf16 per layer) through HBM and runs LN / gelu /
residual as separate passes. This kernel never materializes it:

  grid = (M / block_m, 4D / block_ff), ff innermost. Per (i, j) step the
  kernel computes h_j = gelu(LN(x_i) @ W1[:, j] + b1[j]) as a [block_m,
  block_ff] VMEM tile and accumulates h_j @ W2[j, :] into a [block_m, D]
  fp32 scratch; the LN'd input is computed once per m-block (at j == 0)
  into a second scratch. The [B*T, 4D] intermediate never touches HBM;
  note W1/W2 (~26 MB bf16 at large-v1) ARE re-streamed once per m-block
  (M/block_m = 144 times at batch 24, ~3.7 GB/layer of weight traffic) —
  acceptable here because at M = 36864 the kernel is MXU-bound, but it is
  why this shape of kernel loses at small M (see ops/fused_mlp.py's
  decode-step negative result) and why shrinking batch/block_m or growing
  d_ff moves the bandwidth floor.

On-chip at [24, 1536, 1280] (large-v1 batch 24): XLA half-block 11.75
ms/layer (82 TFLOP/s) vs this kernel 8.83 ms/layer (109 TFLOP/s) at the
swept optimum block_m=256, block_ff=512 (block_m >= 1024 or block_ff =
2560 fail Mosaic compilation — VMEM).

GELU uses the Abramowitz-Stegun 7.1.26 erf approximation (|err| < 1.5e-7,
~50x below bf16 resolution — same rationale and lowering as
ops/fused_mlp.py, which targeted the M=24 decode step and lost to XLA
there; THIS geometry has M = B*T = 36864 rows, where MXU tiles are full
and the win is the VMEM residency of the 4D intermediate).

Matches the reference block structure package/whisper-at/whisper_at/
model.py:110-141 (pre-LN residual MLP, exact-erf gelu).
"""

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False


def _erf(x):
    # Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7); Mosaic has no erf lowering
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu(x):
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bta_ref, o_ref,
            xn_ref, acc_ref, *, n_ff):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def ln_and_init():
        x32 = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = (jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
               - jnp.square(mean))
        xn = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        xn_ref[...] = (xn * g_ref[...] + bta_ref[...]).astype(xn_ref.dtype)
        # residual + fc2 bias live in the accumulator from the start
        acc_ref[...] = x32 + b2_ref[...]

    h = jax.lax.dot(
        xn_ref[...], w1_ref[...], preferred_element_type=jnp.float32
    ) + b1_ref[...]
    h = _gelu(h).astype(xn_ref.dtype)  # [block_m, block_ff], VMEM-only
    acc_ref[...] += jax.lax.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(j == n_ff - 1)
    def store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("block_m", "block_ff", "interpret"))
def mlp_block_fused(
    x: jnp.ndarray,      # [B, T, D]
    ln: dict,            # {"scale": [D], "bias": [D]}
    fc1: dict,           # {"w": [D, 4D], "b": [4D]}
    fc2: dict,           # {"w": [4D, D], "b": [D]}
    *,
    block_m: int = 256,
    block_ff: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + fc2(gelu(fc1(layer_norm(x)))) — the encoder MLP half-block."""
    b, t, d = x.shape
    d_ff = fc1["w"].shape[-1]
    assert d_ff % block_ff == 0
    n_ff = d_ff // block_ff
    m = b * t
    m_pad = -(-m // block_m) * block_m
    x2 = x.reshape(m, d)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    dtype = x.dtype
    w1 = fc1["w"].astype(dtype)
    w2 = fc2["w"].astype(dtype)
    b1 = fc1["b"].astype(jnp.float32)[None, :]
    b2 = fc2["b"].astype(jnp.float32)[None, :]
    g = ln["scale"].astype(jnp.float32)[None, :]
    bta = ln["bias"].astype(jnp.float32)[None, :]

    out = pl.pallas_call(
        partial(_kernel, n_ff=n_ff),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), dtype),
        grid=(m_pad // block_m, n_ff),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_ff), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_ff), lambda i, j: (0, j)),
            pl.BlockSpec((block_ff, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_m, d), dtype),        # LN'd input
            pltpu.VMEM((block_m, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, w1, b1, w2, b2, g, bta)

    return out[:m].reshape(b, t, d)
