"""Parity of the Pallas rel-pos flash attention (interpret mode on CPU)
against the materialised XLA oracle, forward and all gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.ops.pallas_relpos_attention import (
    relpos_attention_reference,
    relpos_flash_attention,
)


def _inputs(b=2, h=2, t=100, d=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32) * 0.3
    p = jnp.asarray(rng.randn(h, 2 * t - 1, d), jnp.float32) * 0.3
    u = jnp.asarray(rng.randn(h, d), jnp.float32) * 0.1
    vb = jnp.asarray(rng.randn(h, d), jnp.float32) * 0.1
    lens = np.full((b,), t, np.int64)
    lens[0] = t - 17
    mask = np.arange(t)[None, :] < lens[:, None]
    bias = jnp.asarray(
        np.where(mask, 0.0, np.finfo(np.float32).min / 2), jnp.float32
    )[:, None, None, :]
    return (q, k, v, p, u, vb, bias), lens


@pytest.mark.parametrize("t", [100, 128])
def test_forward_parity(t):
    (q, k, v, p, u, vb, bias), lens = _inputs(t=t)
    ref = relpos_attention_reference(q, k, v, p, u, vb, bias)
    out = relpos_flash_attention(q, k, v, p, u, vb, bias, block=None if t == 128 else 64,
                                 interpret=True)
    # compare only valid positions (masked queries are junk in both)
    for b_ in range(q.shape[0]):
        np.testing.assert_allclose(
            np.asarray(out)[b_, :, : lens[b_]],
            np.asarray(ref)[b_, :, : lens[b_]],
            rtol=2e-5, atol=2e-5,
        )


# block=32 -> m=3 exercises the 2-kernel general backward; block=96 -> m=1
# exercises the fused single-pass backward
@pytest.mark.parametrize("block", [32, 96])
def test_grad_parity(block):
    (q, k, v, p, u, vb, bias), lens = _inputs(t=96)
    tmask = jnp.asarray(
        (np.arange(96)[None, :] < lens[:, None]).astype(np.float32)
    )[:, None, :, None]
    gproj = jnp.asarray(np.random.RandomState(1).randn(2, 2, 96, 16),
                        jnp.float32)

    def loss(fn, q, k, v, p, u, vb):
        out = fn(q, k, v, p, u, vb, bias)
        return jnp.sum(out * tmask * gproj)

    args = (q, k, v, p, u, vb)
    g_ref = jax.grad(
        lambda *a: loss(relpos_attention_reference, *a), argnums=(0, 1, 2, 3, 4, 5)
    )(*args)
    g_out = jax.grad(
        lambda *a: loss(
            lambda *aa: relpos_flash_attention(
                *aa, block=block, interpret=True),
            *a,
        ),
        argnums=(0, 1, 2, 3, 4, 5),
    )(*args)
    names = ["dq", "dk", "dv", "dp", "du", "dvb"]
    for n, a, b_ in zip(names, g_ref, g_out):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=3e-4, atol=3e-4, err_msg=n
        )


def test_fold_matches_unfolded(monkeypatch):
    """The head-folded m==1 kernels (grid (B,)) must match the per-(B,H)
    grid bit-for... well, numerically — forward and every gradient."""
    (q, k, v, p, u, vb, bias), lens = _inputs(t=96)
    gproj = jnp.asarray(np.random.RandomState(2).randn(2, 2, 96, 16),
                        jnp.float32)

    def run():
        def loss(q, k, v, p, u, vb):
            out = relpos_flash_attention(q, k, v, p, u, vb, bias,
                                         block=96, interpret=True)
            return jnp.sum(out * gproj), out
        (l, out), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4, 5), has_aux=True)(q, k, v, p, u, vb)
        return out, g

    monkeypatch.setenv("ESPNET_TPU_ATTN_FOLD", "1")
    out1, g1 = run()
    monkeypatch.setenv("ESPNET_TPU_ATTN_FOLD", "0")
    out0, g0 = run()
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
