"""Parity: manual-DMA-ring streaming cross-attention vs the shipped kernel."""

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
def test_stream_matches_shipped_kernel(bits, groups):
    rng = np.random.default_rng(5)
    b, n_head, dh, ta = 2, 4, 8, 200
    args = _make_inputs(rng, b, n_head, dh, ta, groups, bits)
    want = cross_attention_int8(*args, n_head=n_head, interpret=True,
                                bits=bits)
    for chunk, nbuf in ((64, 2), (64, 4), (128, 8)):
        got = cross_attention_int8_stream(
            *args, n_head=n_head, interpret=True, chunk=chunk, nbuf=nbuf,
            bits=bits)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


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
