"""Pallas TPU kernel for wavefront DTW.

TPU-native equivalent of the reference's Triton DTW kernel
(whisper_at/triton_ops.py:13-40): the DP runs over anti-diagonals in skewed
storage — row k of the skewed cost matrix holds all cells with i+j == k, so
each wavefront step is one VPU vector op over the token axis, and the whole
cost/trace state lives in VMEM (a few MB for the 448 x 1500 worst case).
Predecessor shifts use pltpu.roll; tie-breaking matches the reference
(diagonal < up < left, timing.py:95-100). The scalar backtrace stays on host
(ops/dtw.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

INF = float("inf")


def _dtw_kernel(xs_ref, cost_ref, trace_ref):
    """xs_ref: [K, W] skewed cost inputs; outputs skewed cost [K, W] fp32 and
    trace [K, W] int32. W = padded (N+1); K = padded (N+M+1)."""
    k_total = xs_ref.shape[0]
    w = xs_ref.shape[1]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    # row 0: only cell (0,0) is 0; row 1 is all borders (inf)
    cost_ref[0:1, :] = jnp.where(col == 0, 0.0, INF)
    trace_ref[0:1, :] = jnp.full((1, w), -1, jnp.int32)
    cost_ref[1:2, :] = jnp.full((1, w), INF)
    trace_ref[1:2, :] = jnp.full((1, w), -1, jnp.int32)

    def body(k, _):
        prev1 = cost_ref[k - 1, :].reshape(1, w)
        prev2 = cost_ref[k - 2, :].reshape(1, w)
        # shift right along the token axis: index i reads predecessor i-1
        prev1_s = jnp.where(col == 0, INF, pltpu.roll(prev1, 1, 1))
        prev2_s = jnp.where(col == 0, INF, pltpu.roll(prev2, 1, 1))

        c0 = prev2_s  # diagonal  (i-1, j-1)
        c1 = prev1_s  # up        (i-1, j)
        c2 = prev1  # left        (i, j-1)

        t = jnp.where(
            (c0 < c1) & (c0 < c2),
            0,
            jnp.where((c1 < c0) & (c1 < c2), 1, 2),
        ).astype(jnp.int32)
        c = jnp.where(t == 0, c0, jnp.where(t == 1, c1, c2))

        cost_ref[k, :] = (xs_ref[k, :].reshape(1, w) + c).reshape(w)
        trace_ref[k, :] = t.reshape(w)
        return 0

    jax.lax.fori_loop(2, k_total, body, 0)


try:  # pallas import kept optional so CPU-only installs still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("n", "m", "interpret"))
def _dtw_device(x: jnp.ndarray, n: int, m: int, interpret: bool = False):
    """Skew the cost matrix, run the wavefront kernel, unskew the trace."""
    w = _round_up(n + 1, 128)
    k_total = _round_up(n + m + 1, 8)

    # skewed inputs: xs[k, i] = x[i-1, (k-i)-1] for valid interior cells
    xp = jnp.full((n + 2, m + 2), INF)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (1, 1))
    kk = jnp.arange(k_total)[:, None]
    ii = jnp.arange(w)[None, :]
    jj = kk - ii
    valid = (ii >= 1) & (ii <= n) & (jj >= 1) & (jj <= m)
    xs = jnp.where(
        valid, xp[jnp.clip(ii, 0, n + 1), jnp.clip(jj, 0, m + 1)], INF
    )

    cost, trace = pl.pallas_call(
        _dtw_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k_total, w), jnp.float32),
            jax.ShapeDtypeStruct((k_total, w), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xs)

    # unskew: trace[i, j] = trace_s[i + j, i]
    io = jnp.arange(n + 1)[:, None]
    jo = jnp.arange(m + 1)[None, :]
    return cost[io + jo, io], trace[io + jo, io]


# worst case [449, 1501]: cost+trace+inputs ~ 3 * K*W*4B ~ 14 MB VMEM
_MAX_VMEM_CELLS = (448 + 1504 + 8) * 512


def dtw_pallas(x, interpret: bool = False) -> np.ndarray:
    """DTW path via the Pallas wavefront kernel; backtrace on host.

    Same contract as ops.dtw.dtw: x [N, M] cost matrix -> [2, path_len].
    """
    from .dtw import backtrace

    n, m = int(x.shape[0]), int(x.shape[1])
    _, trace = _dtw_device(jnp.asarray(x), n, m, interpret=interpret)
    return backtrace(np.asarray(trace))


def dtw_auto(x) -> np.ndarray:
    """DTW with backend selection.

    Default is the vectorized numpy wavefront (ops/dtw.py) — measured faster
    than the device kernel for Whisper-sized matrices (the anti-diagonal loop
    is latency-bound either way, and host numpy avoids kernel dispatch and
    skew/unskew overhead: ~74 ms vs ~130 ms at 200x1400 on v5e). Set
    WHISPER_AT_TPU_DTW=pallas to force the TPU kernel, e.g. to keep the host
    CPU free in a pipelined batch transcription.
    """
    import os

    from .dtw import dtw as dtw_np

    n, m = int(x.shape[0]), int(x.shape[1])
    want_pallas = os.environ.get("WHISPER_AT_TPU_DTW") == "pallas"
    on_tpu = HAVE_PALLAS and jax.default_backend() == "tpu"
    if (
        want_pallas
        and on_tpu
        and _round_up(n + m + 1, 8) * _round_up(n + 1, 128) <= _MAX_VMEM_CELLS
    ):
        try:
            return dtw_pallas(x)
        except Exception:  # pragma: no cover - compile/runtime fallback
            pass
    return dtw_np(np.asarray(x))
