"""FastDropout (ops/dropout.py): uint8-bit dropout with 1/256-quantized
rate — identity in eval, unbiased scaling and ~rate drop fraction in train."""

import numpy as np

import jax
import jax.numpy as jnp

from espnet_tpu.ops.dropout import FastDropout


def test_eval_identity_and_zero_rate():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
    d = FastDropout(0.5)
    y = d.apply({}, x, True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    y0 = FastDropout(0.0).apply({}, x, False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))


def test_rate_and_unbiasedness():
    rate = 0.1
    x = jnp.ones((512, 512), jnp.float32)
    d = FastDropout(rate)
    y = np.asarray(d.apply({}, x, False,
                           rngs={"dropout": jax.random.PRNGKey(0)}))
    q = round(rate * 256)
    expect_rate = q / 256.0
    drop_frac = float((y == 0).mean())
    assert abs(drop_frac - expect_rate) < 0.01
    # kept elements are scaled so E[y] == x
    assert abs(float(y.mean()) - 1.0) < 0.02
    scale = 256.0 / (256 - q)
    kept = y[y != 0]
    np.testing.assert_allclose(kept, scale, rtol=1e-6)


def test_recompute_vjp_mask_matches_forward():
    """The backward regenerates the SAME mask from the stored key: the
    gradient is exactly 0 where the forward output is 0, and exactly the
    keep-scale where it is not (the one property the recompute-VJP could
    silently break)."""
    rate = 0.3
    x = jnp.asarray(np.random.RandomState(1).randn(64, 256), jnp.float32)
    d = FastDropout(rate)
    rngs = {"dropout": jax.random.PRNGKey(42)}

    y = d.apply({}, x, False, rngs=rngs)
    g = jax.grad(lambda x_: jnp.sum(d.apply({}, x_, False, rngs=rngs)))(x)

    q = round(rate * 256)
    scale = 256.0 / (256 - q)
    y_np, g_np = np.asarray(y), np.asarray(g)
    dropped = y_np == 0.0
    # grad exactly zero where output was dropped...
    np.testing.assert_array_equal(g_np[dropped], 0.0)
    # ...and exactly the keep scale where it was not.
    np.testing.assert_allclose(g_np[~dropped], scale, rtol=1e-6)


def test_recompute_vjp_matches_autodiff_oracle():
    """Custom VJP == autodiff through the (mask-storing) plain formulation."""
    from espnet_tpu.ops.dropout import _masked_scale

    q = 77
    x = jnp.asarray(np.random.RandomState(2).randn(32, 128), jnp.float32)
    key = jax.random.PRNGKey(7)

    def plain(x_):
        bits = jax.random.bits(key, x_.shape, dtype=jnp.uint8)
        scale = jnp.asarray(256.0 / (256 - q), x_.dtype)
        return jnp.where(bits >= q, x_ * scale, jnp.zeros_like(x_))

    ct = jnp.asarray(np.random.RandomState(3).randn(32, 128), jnp.float32)
    g_custom = jax.vjp(lambda x_: _masked_scale(x_, key, q), x)[1](ct)[0]
    g_auto = jax.vjp(plain, x)[1](ct)[0]
    np.testing.assert_array_equal(np.asarray(g_custom), np.asarray(g_auto))
