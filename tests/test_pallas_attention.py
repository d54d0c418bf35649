"""Pallas flash-attention: parity with the reference math (interpret mode
on CPU), gradient parity via the custom VJP, and fallback semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _inputs(b=2, h=2, t=50, d=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    lens = [t, t // 2]
    bias = np.zeros((b, 1, 1, t), np.float32)
    for i, l in enumerate(lens):
        bias[i, :, :, l:] = np.finfo(np.float32).min
    return q, k, v, jnp.asarray(bias)


def test_flash_matches_reference_forward():
    from espnet_tpu.ops.pallas_attention import (
        _reference_attention, flash_attention,
    )

    q, k, v, bias = _inputs()
    out = flash_attention(q, k, v, bias, 16, 16)
    ref = _reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # no bias at all
    out0 = flash_attention(q, k, v, None, 16, 16)
    ref0 = _reference_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_reference():
    from espnet_tpu.ops.pallas_attention import (
        _reference_attention, flash_attention,
    )

    q, k, v, bias = _inputs(t=34)  # non-multiple of block size
    f1 = lambda q, k, v: jnp.sum(flash_attention(q, k, v, bias, 16, 16) ** 2)
    f2 = lambda q, k, v: jnp.sum(_reference_attention(q, k, v, bias) ** 2)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_query_dependent_bias_falls_back():
    """A causal (query-dependent) bias must route to the XLA reference and
    still be exact."""
    from espnet_tpu.ops.pallas_attention import (
        _reference_attention, flash_attention,
    )

    q, k, v, _ = _inputs(t=20)
    t = 20
    causal = jnp.where(
        jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0,
        jnp.finfo(jnp.float32).min,
    )[None, None]
    out = flash_attention(q, k, v, causal, 16, 16)
    ref = _reference_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mha_uses_flash_above_threshold():
    """MultiHeadAttention with a low flash_threshold must equal the
    default (XLA) path — same params, same output."""
    from espnet_tpu.models.attention import MultiHeadAttention

    b, t, d, h = 2, 64, 16, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    bias = jnp.zeros((b, 1, 1, t))
    mha_flash = MultiHeadAttention(h, d, flash_threshold=32)
    mha_plain = MultiHeadAttention(h, d, flash_threshold=10 ** 9)
    params = mha_plain.init(jax.random.PRNGKey(1), x, x, x, bias)
    want = mha_plain.apply(params, x, x, x, bias)
    got = mha_flash.apply(params, x, x, x, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_lane_reverse_butterfly():
    """XOR-butterfly lane reverse (the ESPNET_TPU_REV=butterfly variant of
    `_unskew_rev`'s anti-identity matmul) is an exact reversal."""
    from jax.experimental import pallas as pl

    from espnet_tpu.ops.pallas_relpos_attention import _lane_reverse

    for w in (128, 256, 512):
        x = jnp.arange(8 * w, dtype=jnp.float32).reshape(8, w)
        y = pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(
                slice(None), _lane_reverse(x_ref[:])),
            out_shape=jax.ShapeDtypeStruct((8, w), jnp.float32),
            interpret=True,
        )(x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[:, ::-1])
