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
