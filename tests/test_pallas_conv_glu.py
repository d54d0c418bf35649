"""Split-fused conv-module kernels (head GLU / tail proj): parity vs oracle.

Covers `ops/pallas_conv_glu.py` (the round-5 split fusion: kernels at the
module's matmul ends, XLA depthwise between) and the ConformerBlock
`fused_conv_split` wiring. Reference semantics:
`espnet/nets/pytorch_backend/conformer/convolution.py:13`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.pallas_conv_glu import (
    fused_postnorm_proj, fused_prenorm_glu, postnorm_proj_reference,
    prenorm_glu_reference)


def _case(m=300, d=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (m, d))
    return dict(
        x=x,
        lns=1.0 + 0.1 * jax.random.normal(ks[1], (d,)),
        lnb=0.1 * jax.random.normal(ks[2], (d,)),
        k1=jax.random.normal(ks[3], (d, 2 * d)) * 0.1,
        b1=0.1 * jax.random.normal(ks[4], (2 * d,)),
        k2=jax.random.normal(ks[5], (d, d)) * 0.1,
        b2=0.1 * jax.random.normal(ks[6], (d,)),
        xr=jax.random.normal(ks[7], (m, d)),
    )


def test_glu_head_forward_and_grads():
    p = _case()
    y = fused_prenorm_glu(p["x"], p["lns"], p["lnb"], p["k1"], p["b1"],
                          interpret=True)
    ref = prenorm_glu_reference(p["x"], p["lns"], p["lnb"], p["k1"], p["b1"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    w = jnp.cos(jnp.arange(y.size)).reshape(y.shape)

    def lf(x, lns, lnb, k1, b1):
        return jnp.sum(fused_prenorm_glu(x, lns, lnb, k1, b1,
                                         interpret=True) * w)

    def lr(x, lns, lnb, k1, b1):
        return jnp.sum(prenorm_glu_reference(x, lns, lnb, k1, b1) * w)

    gf = jax.grad(lf, argnums=(0, 1, 2, 3, 4))(
        p["x"], p["lns"], p["lnb"], p["k1"], p["b1"])
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(
        p["x"], p["lns"], p["lnb"], p["k1"], p["b1"])
    for a, b_, name in zip(gf, gr, ["dx", "dlns", "dlnb", "dk1", "db1"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_tail_forward_and_grads_with_dropout():
    p = _case(seed=1)
    seed = jnp.array([29], jnp.int32)
    y = fused_postnorm_proj(p["x"], p["xr"], p["lns"], p["lnb"], p["k2"],
                            p["b2"], seed=seed, drop_rate=0.3, interpret=True)
    ref = postnorm_proj_reference(p["x"], p["xr"], p["lns"], p["lnb"],
                                  p["k2"], p["b2"], seed=seed, drop_rate=0.3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def lf(g, xr, lns, lnb, k2, b2):
        return jnp.sum(fused_postnorm_proj(g, xr, lns, lnb, k2, b2,
                                           seed=seed, drop_rate=0.3,
                                           interpret=True) ** 2)

    def lr(g, xr, lns, lnb, k2, b2):
        return jnp.sum(postnorm_proj_reference(g, xr, lns, lnb, k2, b2,
                                               seed=seed,
                                               drop_rate=0.3) ** 2)

    gf = jax.grad(lf, argnums=tuple(range(6)))(
        p["x"], p["xr"], p["lns"], p["lnb"], p["k2"], p["b2"])
    gr = jax.grad(lr, argnums=tuple(range(6)))(
        p["x"], p["xr"], p["lns"], p["lnb"], p["k2"], p["b2"])
    for a, b_, name in zip(gf, gr, ["dg", "dxr", "dlns", "dlnb", "dk2",
                                    "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_tail_no_dropout_matches_plain_math():
    p = _case(m=260, seed=2)
    y = fused_postnorm_proj(p["x"], p["xr"], p["lns"], p["lnb"], p["k2"],
                            p["b2"], interpret=True)
    g32 = p["x"].astype(jnp.float32)
    mu = jnp.mean(g32, axis=-1, keepdims=True)
    var = jnp.mean((g32 - mu) ** 2, axis=-1, keepdims=True)
    gn = (g32 - mu) * jax.lax.rsqrt(var + 1e-6) * p["lns"] + p["lnb"]
    a = gn * jax.nn.sigmoid(gn)
    ref = p["xr"] + a @ p["k2"] + p["b2"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_bf16_close_to_f32():
    p = _case(m=256, seed=3)
    y32 = fused_prenorm_glu(p["x"], p["lns"], p["lnb"], p["k1"], p["b1"],
                            interpret=True)
    y16 = fused_prenorm_glu(p["x"].astype(jnp.bfloat16), p["lns"], p["lnb"],
                            p["k1"].astype(jnp.bfloat16), p["b1"],
                            interpret=True)
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.1, atol=0.15)


def test_conformer_block_split_matches_unfused():
    """ConformerBlock(fused_conv_split=True) == baseline, one param tree."""
    from espnet_tpu.models.conformer import ConformerBlock
    from espnet_tpu.models.embedding import rel_position_encoding
    from espnet_tpu.ops.masks import attention_bias, make_valid_mask

    d, t, b = 128, 160, 2  # b*t >= 256 so the split path engages
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    lens = jnp.asarray([t, t - 13])
    pad_mask = make_valid_mask(lens, t)
    bias = attention_bias(pad_mask[:, None, None, :])
    pos = rel_position_encoding(t, d, jnp.float32)

    blk_u = ConformerBlock(d, 4, 256, fused_conv_split=False)
    blk_f = ConformerBlock(d, 4, 256, fused_conv_split=True)
    params = blk_u.init(jax.random.PRNGKey(1), x, pos, bias, pad_mask, True)
    y_u = blk_u.apply(params, x, pos, bias, pad_mask, True)
    y_f = blk_f.apply(params, x, pos, bias, pad_mask, True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=5e-5, atol=5e-5)

    def loss(blk, p):
        return jnp.sum(blk.apply(p, x, pos, bias, pad_mask, True) ** 2)

    g_u = jax.grad(lambda p: loss(blk_u, p))(params)
    g_f = jax.grad(lambda p: loss(blk_f, p))(params)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3),
        g_u, g_f)


def test_split_respects_padding_mask():
    from espnet_tpu.models.conformer import ConformerBlock
    from espnet_tpu.models.embedding import rel_position_encoding
    from espnet_tpu.ops.masks import attention_bias, make_valid_mask

    d, t = 128, 160
    x = jax.random.normal(jax.random.PRNGKey(2), (2, t, d))
    lens = jnp.asarray([t, 100])
    pad_mask = make_valid_mask(lens, t)
    bias = attention_bias(pad_mask[:, None, None, :])
    pos = rel_position_encoding(t, d, jnp.float32)
    blk = ConformerBlock(d, 4, 256, fused_conv_split=True)
    params = blk.init(jax.random.PRNGKey(3), x, pos, bias, pad_mask, True)
    y1 = blk.apply(params, x, pos, bias, pad_mask, True)
    x2 = x.at[1, 120:].set(7.0)
    y2 = blk.apply(params, x2, pos, bias, pad_mask, True)
    # valid rows far from the padding edge are untouched (depthwise halo 15)
    np.testing.assert_allclose(np.asarray(y1[1, :84]), np.asarray(y2[1, :84]),
                               rtol=1e-5, atol=1e-5)
