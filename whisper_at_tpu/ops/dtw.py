"""Dynamic time warping for word-level timestamp alignment.

The reference ships a Triton wavefront kernel (whisper_at/triton_ops.py:13-40)
plus a numba CPU fallback (whisper_at/timing.py:57-105). Here the DP runs as
a vectorized anti-diagonal wavefront (each diagonal updates in one vector op;
only the O(N+M) diagonal loop is sequential) in numpy on host — the matrices
are tiny (<=224 x 1500) and the backtrace is inherently scalar-sequential.
A Pallas TPU kernel with the same skewed-wavefront layout lives in
ops/dtw_pallas.py and is used on TPU when the matrix is device-resident.

Tie-breaking matches the reference exactly: prefer diagonal, then up, then
left (timing.py:95-100).
"""

from typing import Tuple

import numpy as np


def dtw_cost_trace(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Wavefront DP over the cost matrix x [N, M] -> (cost, trace)."""
    n, m = x.shape
    cost = np.full((n + 1, m + 1), np.inf, dtype=np.float64)
    trace = -np.ones((n + 1, m + 1), dtype=np.int32)
    cost[0, 0] = 0.0

    # anti-diagonal k holds cells (i, j) with i + j == k
    for k in range(2, n + m + 1):
        i_lo = max(1, k - m)
        i_hi = min(n, k - 1)
        if i_lo > i_hi:
            continue
        i = np.arange(i_lo, i_hi + 1)
        j = k - i
        c0 = cost[i - 1, j - 1]  # diagonal
        c1 = cost[i - 1, j]  # up
        c2 = cost[i, j - 1]  # left
        # reference tie-breaking (timing.py:95-100): strict-less for 0 and 1
        t = np.where(
            (c0 < c1) & (c0 < c2), 0, np.where((c1 < c0) & (c1 < c2), 1, 2)
        )
        c = np.where(t == 0, c0, np.where(t == 1, c1, c2))
        cost[i, j] = x[i - 1, j - 1] + c
        trace[i, j] = t

    return cost, trace


def backtrace(trace: np.ndarray) -> np.ndarray:
    """Walk the trace matrix back from (N, M) -> [2, path_len] indices."""
    i = trace.shape[0] - 1
    j = trace.shape[1] - 1
    trace = trace.copy()
    trace[0, :] = 2
    trace[:, 0] = 1

    result = []
    while i > 0 or j > 0:
        result.append((i - 1, j - 1))
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        elif t == 2:
            j -= 1
        else:
            raise ValueError("Unexpected trace value")

    return np.array(result)[::-1].T


def dtw(x) -> np.ndarray:
    """Monotonic alignment path through cost matrix x [N, M].

    Returns [2, path_len] (text_indices, time_indices). Accepts numpy or jax
    arrays; computation is host-side (see module docstring).
    """
    x = np.asarray(x, dtype=np.float64)
    _, trace = dtw_cost_trace(x)
    return backtrace(trace)
