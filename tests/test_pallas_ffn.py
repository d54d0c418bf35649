"""Fused FFN Pallas kernel: interpret-mode parity, grads, dropout semantics.

Reference formulation under test: `espnet/nets/pytorch_backend/transformer/
positionwise_feed_forward.py:11` (w1 -> act -> dropout -> w2).  The kernel
(`ops/pallas_ffn.py`) runs in interpret mode on CPU; its dropout bitstream
is a counter hash shared bit-exactly with `ffn_reference`, so dropout-ON
gradients can be checked against plain jax.grad through the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.ops.pallas_ffn import ffn_reference, fused_ffn


def _make(m=300, d=128, dff=256, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (m, d), dtype)
    k1 = (jax.random.normal(ks[1], (d, dff)) * 0.05).astype(dtype)
    b1 = jax.random.normal(ks[2], (dff,)) * 0.1
    k2 = (jax.random.normal(ks[3], (dff, d)) * 0.05).astype(dtype)
    b2 = jax.random.normal(ks[4], (d,)) * 0.1
    return x, k1, b1, k2, b2


@pytest.mark.parametrize("activation", ["swish", "relu"])
@pytest.mark.parametrize("m", [256, 300])  # 300 exercises row padding
def test_forward_parity_no_dropout(activation, m):
    x, k1, b1, k2, b2 = _make(m=m)
    y = fused_ffn(x, k1, b1, k2, b2, activation=activation, interpret=True)
    ref = ffn_reference(x, k1, b1, k2, b2, activation=activation)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("activation", ["swish", "relu"])
def test_grad_parity_no_dropout(activation):
    x, k1, b1, k2, b2 = _make(m=520)  # 3 tiles: accumulation across grid

    def loss_fused(x, k1, b1, k2, b2):
        y = fused_ffn(x, k1, b1, k2, b2, activation=activation,
                      interpret=True)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    def loss_ref(x, k1, b1, k2, b2):
        y = ffn_reference(x, k1, b1, k2, b2, activation=activation)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    for a, b, name in zip(g_f, g_r, ["dx", "dk1", "db1", "dk2", "db2"]):
        assert a.dtype == b.dtype, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_dropout_rate_and_scale():
    x, k1, b1, k2, b2 = _make(m=512, d=128, dff=512)
    # Identity second matmul exposes the dropped activations directly.
    k2_eye = jnp.zeros((512, 128)).at[:128, :].set(jnp.eye(128))
    seed = jnp.array([7], jnp.int32)
    rate = 0.25
    y = fused_ffn(x, k1, b1, k2_eye, jnp.zeros_like(b2), seed,
                  drop_rate=rate, activation="relu", interpret=True)
    ref_clean = ffn_reference(x, k1, b1, k2_eye, jnp.zeros_like(b2),
                              activation="relu")
    # hidden dims 128..512 are dead through k2_eye; compare the live part.
    dropped = float(jnp.sum((y == 0) & (ref_clean != 0)))
    alive_before = float(jnp.sum(ref_clean != 0))
    q = round(rate * 256)
    assert abs(dropped / alive_before - q / 256) < 0.03
    live = (y != 0) & (ref_clean != 0)
    ratio = jnp.where(live, y / jnp.where(live, ref_clean, 1.0), 0.0)
    expected = 256.0 / (256 - q)
    vals = np.asarray(ratio[live])
    np.testing.assert_allclose(vals, expected, rtol=1e-4)


def test_dropout_deterministic_in_seed():
    x, k1, b1, k2, b2 = _make(m=256)
    s = jnp.array([3], jnp.int32)
    y1 = fused_ffn(x, k1, b1, k2, b2, s, drop_rate=0.1, interpret=True)
    y2 = fused_ffn(x, k1, b1, k2, b2, s, drop_rate=0.1, interpret=True)
    y3 = fused_ffn(x, k1, b1, k2, b2, jnp.array([4], jnp.int32),
                   drop_rate=0.1, interpret=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))


def test_grad_parity_with_dropout():
    """bwd regenerates the SAME mask the fwd used (shared counter hash)."""
    x, k1, b1, k2, b2 = _make(m=520)
    seed = jnp.array([11], jnp.int32)

    def loss_fused(x, k1, b1, k2, b2):
        return jnp.sum(fused_ffn(x, k1, b1, k2, b2, seed, drop_rate=0.3,
                                 interpret=True) ** 2)

    def loss_ref(x, k1, b1, k2, b2):
        return jnp.sum(ffn_reference(x, k1, b1, k2, b2, seed,
                                     drop_rate=0.3) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    for a, b, name in zip(g_f, g_r, ["dx", "dk1", "db1", "dk2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_module_fused_matches_unfused():
    """PositionwiseFeedForward(fused=True) == (fused=False), shared ckpt."""
    from espnet_tpu.models.transformer import PositionwiseFeedForward

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 160, 128))
    mod_f = PositionwiseFeedForward(128, 256, 0.1, activation="swish",
                                    fused=True)
    mod_u = PositionwiseFeedForward(128, 256, 0.1, activation="swish",
                                    fused=False)
    params = mod_u.init(jax.random.PRNGKey(1), x, True)
    # identical parameter tree (checkpoint compatibility with nn.Dense era)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = sorted("/".join(str(p) for p in path) for path, _ in flat)
    assert len(names) == 4
    assert any("w1" in n and "kernel" in n for n in names)
    assert any("w2" in n and "bias" in n for n in names)

    y_f = mod_f.apply(params, x, True)
    y_u = mod_u.apply(params, x, True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=2e-5, atol=2e-5)

    def loss(fn, p):
        return jnp.sum(fn.apply(p, x, True) ** 2)

    g_f = jax.grad(lambda p: loss(mod_f, p))(params)
    g_u = jax.grad(lambda p: loss(mod_u, p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4),
        g_f, g_u)


def test_module_small_m_falls_back():
    """Token counts below one tile skip the kernel (e.g. decode steps)."""
    from espnet_tpu.models.transformer import PositionwiseFeedForward

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 128))
    mod = PositionwiseFeedForward(128, 256, 0.0, fused=True)
    params = mod.init(jax.random.PRNGKey(1), x, True)
    y = mod.apply(params, x, True)  # must not attempt a pallas_call
    assert y.shape == x.shape


def test_bf16_grad_close_to_f32():
    x, k1, b1, k2, b2 = _make(m=256)

    def loss(dtype):
        def f(args):
            x_, k1_, k2_ = args
            y = fused_ffn(x_.astype(dtype), k1_.astype(dtype), b1,
                          k2_.astype(dtype), b2, interpret=True)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f)((x, k1, k2))

    g16 = loss(jnp.bfloat16)
    g32 = loss(jnp.float32)
    for a, b in zip(g16, g32):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.1, atol=0.5)


# ---------------------------------------------------------------------------
# Pre-norm residual variant
# ---------------------------------------------------------------------------


def _pffn_case(m=300, d=128, dff=256, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (m, d))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
    lnb = 0.1 * jax.random.normal(ks[2], (d,))
    k1 = jax.random.normal(ks[3], (d, dff)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[4], (dff,))
    k2 = jax.random.normal(ks[5], (dff, d)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[6], (d,))
    return x, lns, lnb, k1, b1, k2, b2


@pytest.mark.parametrize("res_scale", [1.0, 0.5])
def test_prenorm_forward_and_grads(res_scale):
    from espnet_tpu.ops.pallas_ffn import (
        fused_prenorm_ffn, prenorm_ffn_reference)

    x, lns, lnb, k1, b1, k2, b2 = _pffn_case(m=520)
    args = (x, lns, lnb, k1, b1, k2, b2)
    y = fused_prenorm_ffn(*args, residual_scale=res_scale, interpret=True)
    ref = prenorm_ffn_reference(*args, residual_scale=res_scale)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    w = jnp.cos(jnp.arange(x.size)).reshape(x.shape)

    def lf(*a):
        return jnp.sum(fused_prenorm_ffn(
            *a, residual_scale=res_scale, interpret=True) * w)

    def lr(*a):
        return jnp.sum(prenorm_ffn_reference(
            *a, residual_scale=res_scale) * w)

    gf = jax.grad(lf, argnums=tuple(range(7)))(*args)
    gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
    for a, b, n in zip(gf, gr, ["dx", "dlns", "dlnb", "dk1", "db1", "dk2",
                                "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=4e-4, atol=4e-4, err_msg=n)


def test_prenorm_matches_module_chain():
    """Kernel == nn.LayerNorm -> PositionwiseFeedForward -> +residual."""
    import flax.linen as nn

    from espnet_tpu.models.transformer import PositionwiseFeedForward
    from espnet_tpu.ops.pallas_ffn import fused_prenorm_ffn

    x, lns, lnb, k1, b1, k2, b2 = _pffn_case(m=256)
    ffn = PositionwiseFeedForward(128, 256, 0.0, activation="swish",
                                  fused=False)
    params = {"params": {"w1": {"kernel": k1, "bias": b1},
                         "w2": {"kernel": k2, "bias": b2}}}
    ln = nn.LayerNorm()
    lnp = {"params": {"scale": lns, "bias": lnb}}
    ref = x + 0.5 * ffn.apply(params, ln.apply(lnp, x), True)
    y = fused_prenorm_ffn(x, lns, lnb, k1, b1, k2, b2,
                          residual_scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prenorm_dropout_two_streams():
    from espnet_tpu.ops.pallas_ffn import (
        fused_prenorm_ffn, prenorm_ffn_reference)

    x, lns, lnb, k1, b1, k2, b2 = _pffn_case(m=512, seed=3)
    seeds = jnp.asarray([11, 12], jnp.int32)
    args = (x, lns, lnb, k1, b1, k2, b2)
    y = fused_prenorm_ffn(*args, seeds=seeds, drop_rate=0.2, interpret=True)
    ref = prenorm_ffn_reference(*args, seeds=seeds, drop_rate=0.2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def lf(x_, k1_):
        return jnp.sum(fused_prenorm_ffn(
            x_, lns, lnb, k1_, b1, k2, b2, seeds=seeds, drop_rate=0.2,
            interpret=True) ** 2)

    def lr(x_, k1_):
        return jnp.sum(prenorm_ffn_reference(
            x_, lns, lnb, k1_, b1, k2, b2, seeds=seeds,
            drop_rate=0.2) ** 2)

    gf = jax.grad(lf, argnums=(0, 1))(x, k1)
    gr = jax.grad(lr, argnums=(0, 1))(x, k1)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=4e-4, atol=4e-4)
