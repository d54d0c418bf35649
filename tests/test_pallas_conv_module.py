"""Fused conformer conv-module kernel: parity vs the flax/XLA oracle.

Oracle = the exact computation of `models/conformer.py` ConformerBlock's
conv sub-block (LN -> ConvolutionModule(norm_type=layer) -> dropout ->
residual), using the same parameters. Reference semantics:
`espnet/nets/pytorch_backend/conformer/convolution.py:13`.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.ops.pallas_conv_module import (
    conv_module_reference, fused_conv_module)

K = 31


def _params(d=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    return dict(
        ln1_scale=1.0 + 0.1 * jax.random.normal(ks[0], (d,)),
        ln1_bias=0.1 * jax.random.normal(ks[1], (d,)),
        w1=(jax.random.normal(ks[2], (d, 2 * d)) * 0.1),
        b1=0.1 * jax.random.normal(ks[3], (2 * d,)),
        dw=(jax.random.normal(ks[4], (K, d)) * 0.2),
        db=0.05 * jax.random.normal(ks[5], (d,)),
        ln2_scale=1.0 + 0.1 * jax.random.normal(ks[6], (d,)),
        ln2_bias=jnp.zeros((d,)),
        w2=(jax.random.normal(ks[7], (d, d)) * 0.1),
        b2=jnp.zeros((d,)),
    )


def _xla_oracle(x, pad_mask, p, deterministic=True):
    """LN + ConvolutionModule(flax) + residual with shared params."""
    from espnet_tpu.models.conformer import ConvolutionModule

    d = x.shape[-1]
    mod = ConvolutionModule(d, K, "layer")
    variables = {"params": {
        "pointwise_conv1": {"kernel": p["w1"], "bias": p["b1"]},
        "depthwise_conv": {"kernel": p["dw"][:, None, :], "bias": p["db"]},
        "norm": {"scale": p["ln2_scale"], "bias": p["ln2_bias"]},
        "pointwise_conv2": {"kernel": p["w2"], "bias": p["b2"]},
    }}
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["ln1_scale"] + p["ln1_bias"]
    h = mod.apply(variables, xn, pad_mask, deterministic)
    return x + h


def _case(b=2, t=37, d=128, seed=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    x = jax.random.normal(ks[0], (b, t, d))
    lens = jnp.asarray([t, t - 9, t - 3][:b])
    pad_mask = jnp.arange(t)[None, :] < lens[:, None]
    return x, pad_mask


def test_forward_matches_xla_oracle():
    x, pad_mask = _case()
    p = _params()
    y = fused_conv_module(x, pad_mask, *[p[k] for k in (
        "ln1_scale", "ln1_bias", "w1", "b1", "dw", "db", "ln2_scale",
        "ln2_bias", "w2", "b2")], interpret=True)
    ref = _xla_oracle(x, pad_mask, p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla_oracle():
    x, pad_mask = _case(b=3, t=29)
    p = _params(seed=2)
    names = ["ln1_scale", "ln1_bias", "w1", "b1", "dw", "db", "ln2_scale",
             "ln2_bias", "w2", "b2"]
    w = jnp.cos(jnp.arange(x.size)).reshape(x.shape)

    def loss_fused(x, *args):
        return jnp.sum(fused_conv_module(x, pad_mask, *args,
                                         interpret=True) * w)

    def loss_ref(x, *args):
        pp = dict(zip(names, args))
        return jnp.sum(_xla_oracle(x, pad_mask, pp) * w)

    args = [p[k] for k in names]
    gf = jax.grad(loss_fused, argnums=tuple(range(11)))(x, *args)
    gr = jax.grad(loss_ref, argnums=tuple(range(11)))(x, *args)
    for a, b_, name in zip(gf, gr, ["dx"] + names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_padding_mask_blocks_leakage():
    """Changing samples beyond the valid length must not change valid rows."""
    x, _ = _case(b=1, t=40)
    lens = jnp.asarray([25])
    pad_mask = jnp.arange(40)[None, :] < lens[:, None]
    p = _params(seed=3)
    args = [p[k] for k in ("ln1_scale", "ln1_bias", "w1", "b1", "dw", "db",
                           "ln2_scale", "ln2_bias", "w2", "b2")]
    y1 = fused_conv_module(x, pad_mask, *args, interpret=True)
    x2 = x.at[:, 30:].set(9.0)
    y2 = fused_conv_module(x2, pad_mask, *args, interpret=True)
    # rows < 25 - receptive field influence only through masked GLU output,
    # which is zeroed -> identical
    np.testing.assert_allclose(np.asarray(y1[:, :25]), np.asarray(y2[:, :25]),
                               rtol=1e-6, atol=1e-6)


def test_dropout_parity_and_grad():
    x, pad_mask = _case(b=2, t=24, seed=4)
    p = _params(seed=5)
    names = ["ln1_scale", "ln1_bias", "w1", "b1", "dw", "db", "ln2_scale",
             "ln2_bias", "w2", "b2"]
    args = [p[k] for k in names]
    seed = jnp.array([13], jnp.int32)

    y = fused_conv_module(x, pad_mask, *args, seed=seed, drop_rate=0.3,
                          interpret=True)
    ref = conv_module_reference(x, pad_mask, *args, seed=seed, drop_rate=0.3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(*a):
        return jnp.sum(fused_conv_module(a[0], pad_mask, *a[1:], seed=seed,
                                         drop_rate=0.3, interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(conv_module_reference(a[0], pad_mask, *a[1:],
                                             seed=seed, drop_rate=0.3) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 3, 5))(x, *args)
    gr = jax.grad(loss_ref, argnums=(0, 3, 5))(x, *args)
    for a, b_, name in zip(gf, gr, ["dx", "dw1", "ddw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_bf16_close_to_f32():
    x, pad_mask = _case(b=2, t=32, seed=6)
    p = _params(seed=7)
    args = [p[k] for k in ("ln1_scale", "ln1_bias", "w1", "b1", "dw", "db",
                           "ln2_scale", "ln2_bias", "w2", "b2")]
    y32 = fused_conv_module(x, pad_mask, *args, interpret=True)
    a16 = [x.astype(jnp.bfloat16)] + [
        args[i].astype(jnp.bfloat16) if i in (2, 4, 8) else args[i]
        for i in range(10)]
    y16 = fused_conv_module(a16[0], pad_mask, *a16[1:], interpret=True)
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), rtol=0.1, atol=0.2)


def test_conformer_block_fused_matches_unfused():
    """ConformerBlock(fused_conv=True) == (False) with one param tree."""
    from espnet_tpu.models.conformer import ConformerBlock
    from espnet_tpu.models.embedding import rel_position_encoding
    from espnet_tpu.ops.masks import attention_bias, make_valid_mask

    d, t, b = 128, 40, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    lens = jnp.asarray([t, t - 7])
    pad_mask = make_valid_mask(lens, t)
    bias = attention_bias(pad_mask[:, None, None, :])
    pos = rel_position_encoding(t, d, jnp.float32)

    blk_u = ConformerBlock(d, 4, 256, fused_conv=False)
    blk_f = ConformerBlock(d, 4, 256, fused_conv=True)
    params = blk_u.init(jax.random.PRNGKey(1), x, pos, bias, pad_mask, True)
    y_u = blk_u.apply(params, x, pos, bias, pad_mask, True)
    y_f = blk_f.apply(params, x, pos, bias, pad_mask, True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)

    def loss(blk, p):
        return jnp.sum(blk.apply(p, x, pos, bias, pad_mask, True) ** 2)

    g_u = jax.grad(lambda p: loss(blk_u, p))(params)
    g_f = jax.grad(lambda p: loss(blk_f, p))(params)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4),
        g_u, g_f)


def test_conformer_block_fused_ffn_matches_unfused():
    """fused_prenorm_ffn macaron path == module path, one param tree."""
    from espnet_tpu.models.conformer import ConformerBlock
    from espnet_tpu.models.embedding import rel_position_encoding
    from espnet_tpu.ops.masks import attention_bias, make_valid_mask

    d, t, b = 128, 160, 2  # b*t >= 256 so the fused path engages
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    lens = jnp.asarray([t, t - 13])
    pad_mask = make_valid_mask(lens, t)
    bias = attention_bias(pad_mask[:, None, None, :])
    pos = rel_position_encoding(t, d, jnp.float32)

    blk_u = ConformerBlock(d, 4, 256, fused_ffn=False)
    blk_f = ConformerBlock(d, 4, 256, fused_ffn=True)
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


def test_transformer_layer_fused_ffn_matches_unfused():
    from espnet_tpu.models.transformer import TransformerEncoderLayer
    from espnet_tpu.ops.masks import attention_bias, make_valid_mask

    d, t, b = 128, 160, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    lens = jnp.asarray([t, t - 13])
    bias = attention_bias(make_valid_mask(lens, t)[:, None, None, :])
    lay_u = TransformerEncoderLayer(d, 4, 256, fused_ffn=False)
    lay_f = TransformerEncoderLayer(d, 4, 256, fused_ffn=True)
    params = lay_u.init(jax.random.PRNGKey(1), x, bias, True)
    y_u = lay_u.apply(params, x, bias, True)
    y_f = lay_f.apply(params, x, bias, True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=5e-5, atol=5e-5)
