"""Fused conformer convolution-module Pallas kernel.

One kernel computes the WHOLE pre-norm conv sub-block of a conformer layer

    y = x + drop( PW2( swish( LN2( DW( mask * GLU( PW1( LN1(x) ) ) ) ) ) ) )

per utterance, VMEM-resident end to end.  Reference semantics:
`espnet/nets/pytorch_backend/conformer/convolution.py:13` (pointwise 2d ->
GLU -> depthwise k=31 -> norm -> swish -> pointwise) plus the surrounding
pre-LayerNorm, dropout and residual of the encoder block
(`conformer/encoder_layer.py`).  In the XLA formulation this chain is ~9 ms
of the bench step — almost entirely HBM round-trips and a depthwise conv
that lax lowers poorly (3.6 ms for 0.24 GFLOP); here the whole (T, d)
activation set stays on-chip, the depthwise conv is 31 shifted
multiply-adds on VMEM rows, and only x and y ever touch HBM.

Backward is flash-style: everything is recomputed from the residual x and
the weights; dropout regenerates its mask from the same counter hash as
`ops/pallas_ffn.py`.  Weight/norm-parameter gradients accumulate across the
grid run.  Grid = (B,) — one program per utterance (T x d fits VMEM for
any bucketed length).

Only norm_type="layer" (the shard_map-safe default of
`models/conformer.py`) is fused; the BatchNorm variant falls back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from espnet_tpu.ops.pallas_ffn import _keep_mask, _ln_bwd, _ln_fwd


def _depthwise(h, dw, t, k):
    """SAME depthwise conv along rows: h (T, d), dw (k, d) -> (T, d)."""
    p = (k - 1) // 2
    d = h.shape[-1]
    hp = jnp.pad(h, ((p, p), (0, 0)))
    acc = jnp.zeros((t, d), jnp.float32)
    for j in range(k):
        acc = acc + hp[j:j + t, :] * dw[j][None, :]
    return acc


def _depthwise_input_grad(dc, dw, t, k):
    """d h for c = depthwise(h): correlation with the flipped kernel."""
    p = (k - 1) // 2
    d = dc.shape[-1]
    dcp = jnp.pad(dc, ((p, p), (0, 0)))
    acc = jnp.zeros((t, d), jnp.float32)
    for j in range(k):
        acc = acc + dcp[k - 1 - j:k - 1 - j + t, :] * dw[j][None, :]
    return acc


def _forward_chain(x, mask, ln1s, ln1b, w1, b1, dw, db, ln2s, ln2b, w2, b2,
                   *, k: int, want_residuals: bool):
    """Shared fwd math on one (T, d) utterance (f32 activations)."""
    t = x.shape[0]
    xn, xhat1, inv1 = _ln_fwd(x.astype(jnp.float32), ln1s, ln1b)
    h = jax.lax.dot_general(
        xn.astype(w1.dtype), w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1
    d = x.shape[-1]
    a, g = h[:, :d], h[:, d:]
    sg = jax.nn.sigmoid(g)
    u = a * sg * mask  # GLU + padding mask
    c = _depthwise(u.astype(jnp.float32), dw, t, k) + db
    cn, xhat2, inv2 = _ln_fwd(c, ln2s, ln2b)
    ssig = jax.nn.sigmoid(cn)
    s = cn * ssig  # swish
    y = jax.lax.dot_general(
        s.astype(w2.dtype), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2
    if not want_residuals:
        return y
    return y, (xn, xhat1, inv1, a, g, sg, u, xhat2, inv2, cn, ssig, s)


def _conv_fwd_kernel(seed_ref, x_ref, mask_ref, ln1s_ref, ln1b_ref, w1_ref,
                     b1_ref, dw_ref, db_ref, ln2s_ref, ln2b_ref, w2_ref,
                     b2_ref, y_ref, *, k: int, q: int):
    b = pl.program_id(0)
    x = x_ref[0]
    mask = mask_ref[0].astype(jnp.float32)
    y = _forward_chain(
        x, mask, ln1s_ref[...], ln1b_ref[...], w1_ref[...], b1_ref[...],
        dw_ref[...], db_ref[...], ln2s_ref[...], ln2b_ref[...], w2_ref[...],
        b2_ref[...], k=k, want_residuals=False)
    if q > 0:
        keep = _keep_mask(y.shape, seed_ref[0], b, q)
        y = jnp.where(keep, y * (256.0 / (256 - q)), 0.0)
    y_ref[0] = (x.astype(jnp.float32) + y).astype(y_ref.dtype)


def _conv_bwd_kernel(seed_ref, x_ref, mask_ref, ln1s_ref, ln1b_ref, w1_ref,
                     b1_ref, dw_ref, db_ref, ln2s_ref, ln2b_ref, w2_ref,
                     b2_ref, g_ref,
                     dx_ref, dln1s_ref, dln1b_ref, dw1_ref, db1_ref,
                     ddw_ref, ddb_ref, dln2s_ref, dln2b_ref, dw2_ref,
                     db2_ref, *, k: int, q: int):
    b = pl.program_id(0)
    x = x_ref[0]
    mask = mask_ref[0].astype(jnp.float32)
    w1, w2, dwk = w1_ref[...], w2_ref[...], dw_ref[...]
    ln1s, ln2s = ln1s_ref[...], ln2s_ref[...]
    g = g_ref[0].astype(jnp.float32)
    t, d = x.shape

    _, res = _forward_chain(
        x, mask, ln1s, ln1b_ref[...], w1, b1_ref[...], dwk, db_ref[...],
        ln2s, ln2b_ref[...], w2, b2_ref[...], k=k, want_residuals=True)
    xn, xhat1, inv1, a, gg, sg, u, xhat2, inv2, cn, ssig, s = res

    # residual: dL/dx direct term is g; branch gradient flows below
    dy = g
    if q > 0:
        keep = _keep_mask((t, d), seed_ref[0], b, q)
        dy = jnp.where(keep, dy * (256.0 / (256 - q)), 0.0)
    # pw2
    dy_b = dy.astype(x.dtype)
    ds = jax.lax.dot_general(
        dy_b, w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s_b = s.astype(x.dtype)
    dw2_t = jax.lax.dot_general(
        s_b, dy_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_t = jnp.sum(dy, axis=0, keepdims=True)
    # swish
    dcn = ds * (ssig * (1.0 + cn * (1.0 - ssig)))
    # LN2
    dc, dln2s_t, dln2b_t = _ln_bwd(dcn, xhat2, inv2, ln2s)
    ddb_t = jnp.sum(dc, axis=0, keepdims=True)
    # depthwise: input grad + per-tap weight grads
    du = _depthwise_input_grad(dc, dwk, t, k)
    p = (k - 1) // 2
    up = jnp.pad(u.astype(jnp.float32), ((p, p), (0, 0)))
    ddw_rows = [
        jnp.sum(up[j:j + t, :] * dc, axis=0,
                keepdims=True)
        for j in range(k)
    ]
    ddw_t = jnp.concatenate(ddw_rows, axis=0)  # (k, d)
    # mask + GLU
    du = du * mask
    da = du * sg
    dgg = du * a * sg * (1.0 - sg)
    dh = jnp.concatenate([da, dgg], axis=1)
    # pw1
    dh_b = dh.astype(x.dtype)
    dxn = jax.lax.dot_general(
        dh_b, w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    xn_b = xn.astype(x.dtype)
    dw1_t = jax.lax.dot_general(
        xn_b, dh_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_t = jnp.sum(dh, axis=0, keepdims=True)
    # LN1 + residual
    dx_ln, dln1s_t, dln1b_t = _ln_bwd(dxn, xhat1, inv1, ln1s)
    dx_ref[0] = (g + dx_ln).astype(dx_ref.dtype)

    @pl.when(b == 0)
    def _():
        dln1s_ref[...] = dln1s_t
        dln1b_ref[...] = dln1b_t
        dw1_ref[...] = dw1_t
        db1_ref[...] = db1_t
        ddw_ref[...] = ddw_t
        ddb_ref[...] = ddb_t
        dln2s_ref[...] = dln2s_t
        dln2b_ref[...] = dln2b_t
        dw2_ref[...] = dw2_t
        db2_ref[...] = db2_t

    @pl.when(b != 0)
    def _():
        dln1s_ref[...] += dln1s_t
        dln1b_ref[...] += dln1b_t
        dw1_ref[...] += dw1_t
        db1_ref[...] += db1_t
        ddw_ref[...] += ddw_t
        ddb_ref[...] += ddb_t
        dln2s_ref[...] += dln2s_t
        dln2b_ref[...] += dln2b_t
        dw2_ref[...] += dw2_t
        db2_ref[...] += db2_t


def _pad_t(x, mult):
    t = x.shape[1]
    tp = -(-t // mult) * mult
    if tp == t:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, tp - t)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def _fused_conv_core(x, mask, ln1s, ln1b, w1, b1, dw, db, ln2s, ln2b, w2,
                     b2, seed, k: int, q: int, interpret: bool):
    y, _ = _fused_conv_fwd(x, mask, ln1s, ln1b, w1, b1, dw, db, ln2s, ln2b,
                           w2, b2, seed, k, q, interpret)
    return y


def _specs(bsz, t, d, k):
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
        pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),   # x
        pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0)),   # mask
        row(d), row(d),                                  # ln1 scale/bias
        pl.BlockSpec((d, 2 * d), lambda i: (0, 0)),      # w1
        row(2 * d),                                      # b1
        pl.BlockSpec((k, d), lambda i: (0, 0)),          # dw
        row(d),                                          # db
        row(d), row(d),                                  # ln2 scale/bias
        pl.BlockSpec((d, d), lambda i: (0, 0)),          # w2
        row(d),                                          # b2
    ]


def _fused_conv_fwd(x, mask, ln1s, ln1b, w1, b1, dw, db, ln2s, ln2b, w2, b2,
                    seed, k, q, interpret):
    bsz, t0, d = x.shape
    xp = _pad_t(x, 8)
    mp = _pad_t(mask.astype(jnp.float32)[..., None], 8)
    t = xp.shape[1]
    args = (seed, xp, mp, ln1s.reshape(1, d), ln1b.reshape(1, d), w1,
            b1.reshape(1, 2 * d), dw, db.reshape(1, d), ln2s.reshape(1, d),
            ln2b.reshape(1, d), w2, b2.reshape(1, d))
    y = pl.pallas_call(
        functools.partial(_conv_fwd_kernel, k=k, q=q),
        grid=(bsz,),
        in_specs=_specs(bsz, t, d, k),
        out_shape=jax.ShapeDtypeStruct((bsz, t, d), x.dtype),
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(*args)
    return y[:, :t0], (x, mask, ln1s, ln1b, w1, b1, dw, db, ln2s, ln2b, w2,
                       b2, seed)


def _fused_conv_bwd(k, q, interpret, res, g):
    (x, mask, ln1s, ln1b, w1, b1, dw, db, ln2s, ln2b, w2, b2, seed) = res
    bsz, t0, d = x.shape
    xp = _pad_t(x, 8)
    mp = _pad_t(mask.astype(jnp.float32)[..., None], 8)
    gp = _pad_t(g.astype(x.dtype), 8)
    t = xp.shape[1]
    args = (seed, xp, mp, ln1s.reshape(1, d), ln1b.reshape(1, d), w1,
            b1.reshape(1, 2 * d), dw, db.reshape(1, d), ln2s.reshape(1, d),
            ln2b.reshape(1, d), w2, b2.reshape(1, d), gp)
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    outs = pl.pallas_call(
        functools.partial(_conv_bwd_kernel, k=k, q=q),
        grid=(bsz,),
        in_specs=_specs(bsz, t, d, k)
        + [pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))],
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((1, d), jnp.float32),        # dln1s
            jax.ShapeDtypeStruct((1, d), jnp.float32),        # dln1b
            jax.ShapeDtypeStruct((d, 2 * d), jnp.float32),    # dw1
            jax.ShapeDtypeStruct((1, 2 * d), jnp.float32),    # db1
            jax.ShapeDtypeStruct((k, d), jnp.float32),        # ddw
            jax.ShapeDtypeStruct((1, d), jnp.float32),        # ddb
            jax.ShapeDtypeStruct((1, d), jnp.float32),        # dln2s
            jax.ShapeDtypeStruct((1, d), jnp.float32),        # dln2b
            jax.ShapeDtypeStruct((d, d), jnp.float32),        # dw2
            jax.ShapeDtypeStruct((1, d), jnp.float32),        # db2
        ),
        out_specs=(
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
            row(d), row(d),
            pl.BlockSpec((d, 2 * d), lambda i: (0, 0)), row(2 * d),
            pl.BlockSpec((k, d), lambda i: (0, 0)), row(d),
            row(d), row(d),
            pl.BlockSpec((d, d), lambda i: (0, 0)), row(d),
        ),
        interpret=interpret,
    )(*args)
    (dx, dln1s, dln1b, dw1, db1, ddw, ddb, dln2s, dln2b, dw2, db2) = outs
    return (dx[:, :t0], None,
            dln1s.reshape(d).astype(ln1s.dtype),
            dln1b.reshape(d).astype(ln1b.dtype),
            dw1.astype(w1.dtype), db1.reshape(2 * d).astype(b1.dtype),
            ddw.astype(dw.dtype), ddb.reshape(d).astype(db.dtype),
            dln2s.reshape(d).astype(ln2s.dtype),
            dln2b.reshape(d).astype(ln2b.dtype),
            dw2.astype(w2.dtype), db2.reshape(d).astype(b2.dtype), None)


_fused_conv_core.defvjp(_fused_conv_fwd, _fused_conv_bwd)


def fused_conv_module(
    x: jnp.ndarray,
    pad_mask: jnp.ndarray,
    ln1_scale, ln1_bias,
    w1, b1,
    dw, db,
    ln2_scale, ln2_bias,
    w2, b2,
    seed: jnp.ndarray | None = None,
    drop_rate: float = 0.0,
    kernel_size: int = 31,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x (B, T, d) -> x + drop(conv_module(LN(x))) in one Pallas kernel.

    pad_mask: (B, T) True=valid. w1 (d, 2d); dw (kernel_size, d);
    w2 (d, d); LN params (d,). seed: (1,) int32, used only when
    drop_rate > 0. All parameter gradients are exact (LayerNorm included).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q = 0 if drop_rate <= 0.0 else max(1, min(255, round(drop_rate * 256)))
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return _fused_conv_core(
        x, pad_mask, ln1_scale, ln1_bias, w1, b1, dw, db, ln2_scale,
        ln2_bias, w2, b2, seed.astype(jnp.int32), kernel_size, q, interpret)


def conv_module_reference(x, pad_mask, ln1_scale, ln1_bias, w1, b1, dw, db,
                          ln2_scale, ln2_bias, w2, b2, seed=None,
                          drop_rate: float = 0.0, kernel_size: int = 31):
    """Unfused jnp reference with the SAME dropout bitstream (per-batch
    program id), for parity tests."""
    bsz, t0, d = x.shape
    outs = []
    q = 0 if drop_rate <= 0.0 else max(1, min(255, round(drop_rate * 256)))
    tp = -(-t0 // 8) * 8
    for b in range(bsz):
        xx = jnp.pad(x[b].astype(jnp.float32), ((0, tp - t0), (0, 0)))
        mm = jnp.pad(pad_mask[b].astype(jnp.float32), (0, tp - t0))[:, None]
        y = _forward_chain(xx, mm, ln1_scale, ln1_bias,
                           w1.astype(jnp.float32), b1, dw.astype(jnp.float32),
                           db, ln2_scale, ln2_bias, w2.astype(jnp.float32),
                           b2, k=kernel_size, want_residuals=False)
        if q > 0:
            keep = _keep_mask((tp, d), seed.astype(jnp.int32)[0],
                              jnp.int32(b), q)
            y = jnp.where(keep, y * (256.0 / (256 - q)), 0.0)
        outs.append((xx + y)[:t0])
    return jnp.stack(outs).astype(x.dtype)
