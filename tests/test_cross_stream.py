"""Parity: manual-DMA-ring streaming cross-attention vs the shipped kernel."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_at_tpu.ops.cross_decode import cross_attention_int8, pad_ta
from whisper_at_tpu.ops.cross_decode_stream import cross_attention_int8_stream


def _make_inputs(rng, b, n_head, dh, ta, groups, bits):
    hd = n_head * dh
    ta_pad = pad_ta(ta)
    q = jnp.asarray(
        rng.standard_normal((b, n_head * groups, dh)).astype(np.float32))
    k = rng.integers(-127, 127, (b, hd, ta_pad)).astype(np.int8)
    v = rng.integers(-127, 127, (b, ta_pad, hd)).astype(np.int8)
    k[..., ta:] = 0
    v[:, ta:, :] = 0
    ks = np.abs(rng.standard_normal((b, n_head, ta_pad))).astype(np.float32)
    vs = np.abs(rng.standard_normal((b, n_head, ta_pad))).astype(np.float32)
    ks[..., ta:] = 0
    vs[..., ta:] = 0
    bias = np.zeros((1, ta_pad), np.float32)
    bias[:, ta:] = -1e30
    if bits == 4:
        k = np.clip(k, -7, 7)
        v = np.clip(v, -7, 7)
        half = ta_pad // 2

        def pack(x, axis):
            lo = np.take(x, range(half), axis=axis).astype(np.int8)
            hi = np.take(x, range(half, ta_pad), axis=axis).astype(np.int8)
            return ((lo & 0x0F) | (hi << 4)).astype(np.int8)

        k = pack(k, axis=-1)
        v = pack(v, axis=1)
    return (q, jnp.asarray(k), jnp.asarray(ks), jnp.asarray(v),
            jnp.asarray(vs), jnp.asarray(bias))


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("groups", [1, 3])
@pytest.mark.parametrize("global_ring", [False, True])
def test_stream_matches_shipped_kernel(bits, groups, global_ring):
    rng = np.random.default_rng(5)
    b, n_head, dh, ta = 2, 4, 8, 200
    args = _make_inputs(rng, b, n_head, dh, ta, groups, bits)
    want = cross_attention_int8(*args, n_head=n_head, interpret=True,
                                bits=bits)
    # per-element rings sweep depth via nbuf; the global ring pins depth
    # to chunks-per-element (an explicit conflicting nbuf raises), so its
    # depth sweep rides the chunk size instead
    cases = ([(64, None), (128, None), (32, None)] if global_ring
             else [(64, 2), (64, 4), (128, 8)])
    for chunk, nbuf in cases:
        got = cross_attention_int8_stream(
            *args, n_head=n_head, interpret=True, chunk=chunk, nbuf=nbuf,
            bits=bits, global_ring=global_ring)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_stream_global_ring_rejects_conflicting_nbuf():
    """A global-ring depth request that contradicts the structural pin
    must raise, not silently measure a different depth than its label."""
    rng = np.random.default_rng(5)
    args = _make_inputs(rng, 2, 4, 8, 200, 1, 8)
    with pytest.raises(ValueError, match="global_ring pins nbuf"):
        cross_attention_int8_stream(
            *args, n_head=4, interpret=True, chunk=64, nbuf=2,
            bits=8, global_ring=True)


def test_stream_full_decode_token_parity():
    """decode() tokens (greedy + beam) must be identical under the shipped
    kernel and both stream-kernel ring modes. The kernel choice is an
    import-time env constant (decode traces are jit-cached by shape), so
    each variant runs in a fresh subprocess on the same fixed model/mel."""
    worker = os.path.join(os.path.dirname(__file__),
                          "stream_decode_worker.py")
    # every kernel-selection var is pinned in EVERY variant — an ambient
    # WHISPER_AT_TPU_CROSS_DECODE=stream (the A/B workflow exports exactly
    # these) must not leak into the "shipped" baseline and make the
    # comparison vacuous
    variants = {
        "shipped": {"WHISPER_AT_TPU_CROSS_DECODE": "",
                    "WHISPER_AT_TPU_STREAM_GLOBAL": "0"},
        "stream": {"WHISPER_AT_TPU_CROSS_DECODE": "stream",
                   "WHISPER_AT_TPU_STREAM_NBUF": "4",
                   "WHISPER_AT_TPU_STREAM_CHUNK": "512",
                   "WHISPER_AT_TPU_STREAM_GLOBAL": "0"},
        # no NBUF: the global ring derives its depth from the chunk count
        # (an explicit conflicting value raises by design)
        "stream-global": {"WHISPER_AT_TPU_CROSS_DECODE": "stream",
                          "WHISPER_AT_TPU_STREAM_NBUF": "",
                          "WHISPER_AT_TPU_STREAM_CHUNK": "512",
                          "WHISPER_AT_TPU_STREAM_GLOBAL": "1"},
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tokens = {}
    for name, overlay in variants.items():
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo,
                   **overlay)
        proc = subprocess.run(
            [sys.executable, worker], capture_output=True, text=True,
            env=env, timeout=900, cwd=repo)
        assert proc.returncode == 0, f"{name}: {proc.stderr[-800:]}"
        tokens[name] = json.loads(proc.stdout.strip().splitlines()[-1])
    assert tokens["stream"] == tokens["shipped"]
    assert tokens["stream-global"] == tokens["shipped"]


def test_stream_chunk_not_dividing_ta_pad():
    """chunk is halved until it divides the packed Ta axis."""
    rng = np.random.default_rng(9)
    b, n_head, dh, ta = 1, 2, 8, 100   # ta_pad = 128
    args = _make_inputs(rng, b, n_head, dh, ta, 1, 8)
    want = cross_attention_int8(*args, n_head=n_head, interpret=True)
    got = cross_attention_int8_stream(*args, n_head=n_head, interpret=True,
                                      chunk=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
