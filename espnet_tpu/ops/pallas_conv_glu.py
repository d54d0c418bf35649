"""Split-fused conformer conv-module kernels: head and tail around the
depthwise conv.

Round-4's whole-module fused kernel (`ops/pallas_conv_module.py`) won in
isolation but LOST in the full train step: the depthwise conv chain is
memory-bound and XLA overlaps it with neighbouring ops better than one
opaque custom call can. This module takes the round-5 verdict's suggested
middle road — fuse only the two matmul-anchored *ends* of the module and
leave the depthwise conv (plus the pad-mask multiply) to XLA so its
scheduler keeps the overlap freedom:

  head: g = GLU(LN(x) @ W1 + b1)            one read of x, one write of g
  (XLA: g = depthwise(g * pad_mask))
  tail: y = x + drop(swish(LN(g)) @ W2 + b2) one read of g/x, one write

versus the unfused chain where each LN, the GLU, swish and dropout are
separate HBM round-trips XLA cannot fold into both surrounding matmuls.

Semantics mirror `ConvolutionModule` (`models/conformer.py`, reference
`espnet/nets/pytorch_backend/conformer/convolution.py:13`) with
norm_type="layer"; dropout uses the same counter-hash keep rule as
`ops/pallas_ffn.py` (bit-identical on TPU and in interpret mode). All
parameter/input gradients are exact analytic VJPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from espnet_tpu.ops.pallas_ffn import (
    _keep_mask,
    _ln_bwd,
    _ln_fwd,
    _pad_rows,
)


# ---------------------------------------------------------------------------
# head: g = GLU(LN(x) @ W1 + b1)
# ---------------------------------------------------------------------------


def _glu_fwd_kernel(x_ref, lns_ref, lnb_ref, k1_ref, b1_ref, g_ref):
    x = x_ref[...]
    xn, _, _ = _ln_fwd(x.astype(jnp.float32), lns_ref[...], lnb_ref[...])
    h = jax.lax.dot_general(
        xn.astype(x.dtype), k1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    d = g_ref.shape[-1]
    a = h[:, :d]
    b = h[:, d:]
    g_ref[...] = (a * jax.nn.sigmoid(b)).astype(g_ref.dtype)


def _glu_bwd_kernel(x_ref, lns_ref, lnb_ref, k1_ref, b1_ref, dg_ref,
                    dx_ref, dlns_ref, dlnb_ref, dk1_ref, db1_ref):
    pid = pl.program_id(0)
    x = x_ref[...]
    k1 = k1_ref[...]
    lns = lns_ref[...]
    dg = dg_ref[...].astype(jnp.float32)
    xn, xhat, inv = _ln_fwd(x.astype(jnp.float32), lns, lnb_ref[...])
    xn_b = xn.astype(x.dtype)
    h = jax.lax.dot_general(
        xn_b, k1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    d = dg.shape[-1]
    a = h[:, :d]
    b = h[:, d:]
    s = jax.nn.sigmoid(b)
    da = dg * s
    db = dg * a * s * (1.0 - s)
    dh = jnp.concatenate([da, db], axis=-1)
    dh_b = dh.astype(x.dtype)
    dxn = jax.lax.dot_general(
        dh_b, k1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk1_t = jax.lax.dot_general(
        xn_b, dh_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_t = jnp.sum(dh, axis=0, keepdims=True)
    dx_ln, dlns_t, dlnb_t = _ln_bwd(dxn, xhat, inv, lns)
    dx_ref[...] = dx_ln.astype(dx_ref.dtype)

    @pl.when(pid == 0)
    def _():
        dlns_ref[...] = dlns_t
        dlnb_ref[...] = dlnb_t
        dk1_ref[...] = dk1_t
        db1_ref[...] = db1_t

    @pl.when(pid != 0)
    def _():
        dlns_ref[...] += dlns_t
        dlnb_ref[...] += dlnb_t
        dk1_ref[...] += dk1_t
        db1_ref[...] += db1_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _glu_core(x, lns, lnb, k1, b1, tm: int, interpret: bool):
    y, _ = _glu_fwd(x, lns, lnb, k1, b1, tm, interpret)
    return y


def _glu_fwd(x, lns, lnb, k1, b1, tm, interpret):
    m, d = x.shape
    d2 = k1.shape[1]
    xp, m0 = _pad_rows(x, tm)
    nm = xp.shape[0] // tm
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    g = pl.pallas_call(
        _glu_fwd_kernel,
        grid=(nm,),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            row(d), row(d),
            pl.BlockSpec((d, d2), lambda i: (0, 0)),
            row(d2),
        ],
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], d2 // 2), x.dtype),
        out_specs=pl.BlockSpec((tm, d2 // 2), lambda i: (i, 0)),
        interpret=interpret,
    )(xp, lns.reshape(1, d), lnb.reshape(1, d), k1, b1.reshape(1, d2))
    return g[:m0], (x, lns, lnb, k1, b1)


def _glu_bwd(tm, interpret, res, g):
    x, lns, lnb, k1, b1 = res
    m, d = x.shape
    d2 = k1.shape[1]
    xp, m0 = _pad_rows(x, tm)
    gp, _ = _pad_rows(g.astype(x.dtype), tm)
    nm = xp.shape[0] // tm
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    dx, dlns, dlnb, dk1, db1 = pl.pallas_call(
        _glu_bwd_kernel,
        grid=(nm,),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            row(d), row(d),
            pl.BlockSpec((d, d2), lambda i: (0, 0)),
            row(d2),
            pl.BlockSpec((tm, d2 // 2), lambda i: (i, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, d2), jnp.float32),
            jax.ShapeDtypeStruct((1, d2), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            row(d), row(d),
            pl.BlockSpec((d, d2), lambda i: (0, 0)), row(d2),
        ),
        interpret=interpret,
    )(xp, lns.reshape(1, d), lnb.reshape(1, d), k1, b1.reshape(1, d2), gp)
    return (dx[:m0], dlns.reshape(d).astype(lns.dtype),
            dlnb.reshape(d).astype(lnb.dtype), dk1.astype(k1.dtype),
            db1.reshape(d2).astype(b1.dtype))


_glu_core.defvjp(_glu_fwd, _glu_bwd)


def fused_prenorm_glu(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    tile_m: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """g = GLU(LN(x) @ k1 + b1); x (..., d), k1 (d, 2d) -> (..., d)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    d = x.shape[-1]
    y = _glu_core(x.reshape(-1, d), ln_scale, ln_bias, k1, b1, tile_m,
                  interpret)
    return y.reshape(*lead, d)


# ---------------------------------------------------------------------------
# tail: y = x_res + drop(swish(LN(g)) @ W2 + b2)
# ---------------------------------------------------------------------------


def _tail_fwd_kernel(seed_ref, g_ref, xr_ref, lns_ref, lnb_ref, k2_ref,
                     b2_ref, y_ref, *, q: int):
    pid = pl.program_id(0)
    g = g_ref[...]
    gn, _, _ = _ln_fwd(g.astype(jnp.float32), lns_ref[...], lnb_ref[...])
    a = gn * jax.nn.sigmoid(gn)
    z = jax.lax.dot_general(
        a.astype(g.dtype), k2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    if q > 0:
        keep = _keep_mask(z.shape, seed_ref[0], pid, q)
        z = jnp.where(keep, z * (256.0 / (256 - q)), 0.0)
    y_ref[...] = (xr_ref[...].astype(jnp.float32) + z).astype(y_ref.dtype)


def _tail_bwd_kernel(seed_ref, g_ref, lns_ref, lnb_ref, k2_ref, dy_ref,
                     dg_ref, dlns_ref, dlnb_ref, dk2_ref, db2_ref,
                     *, q: int):
    pid = pl.program_id(0)
    g = g_ref[...]
    k2 = k2_ref[...]
    lns = lns_ref[...]
    dy = dy_ref[...].astype(jnp.float32)
    gn, ghat, inv = _ln_fwd(g.astype(jnp.float32), lns, lnb_ref[...])
    s = jax.nn.sigmoid(gn)
    a = gn * s
    dz = dy
    if q > 0:
        keep = _keep_mask(dz.shape, seed_ref[0], pid, q)
        dz = jnp.where(keep, dz * (256.0 / (256 - q)), 0.0)
    db2_t = jnp.sum(dz, axis=0, keepdims=True)
    dz_b = dz.astype(g.dtype)
    da = jax.lax.dot_general(
        dz_b, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a_b = a.astype(g.dtype)
    dk2_t = jax.lax.dot_general(
        a_b, dz_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgn = da * (s * (1.0 + gn * (1.0 - s)))
    dg_ln, dlns_t, dlnb_t = _ln_bwd(dgn, ghat, inv, lns)
    dg_ref[...] = dg_ln.astype(dg_ref.dtype)

    @pl.when(pid == 0)
    def _():
        dlns_ref[...] = dlns_t
        dlnb_ref[...] = dlnb_t
        dk2_ref[...] = dk2_t
        db2_ref[...] = db2_t

    @pl.when(pid != 0)
    def _():
        dlns_ref[...] += dlns_t
        dlnb_ref[...] += dlnb_t
        dk2_ref[...] += dk2_t
        db2_ref[...] += db2_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _tail_core(g, x_res, lns, lnb, k2, b2, seed, q: int, tm: int,
               interpret: bool):
    y, _ = _tail_fwd(g, x_res, lns, lnb, k2, b2, seed, q, tm, interpret)
    return y


def _tail_fwd(g, x_res, lns, lnb, k2, b2, seed, q, tm, interpret):
    m, d = g.shape
    gp, m0 = _pad_rows(g, tm)
    xrp, _ = _pad_rows(x_res, tm)
    nm = gp.shape[0] // tm
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    y = pl.pallas_call(
        functools.partial(_tail_fwd_kernel, q=q),
        grid=(nm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            row(d), row(d),
            pl.BlockSpec((d, d), lambda i: (0, 0)),
            row(d),
        ],
        out_shape=jax.ShapeDtypeStruct((gp.shape[0], d), g.dtype),
        out_specs=pl.BlockSpec((tm, d), lambda i: (i, 0)),
        interpret=interpret,
    )(seed, gp, xrp, lns.reshape(1, d), lnb.reshape(1, d), k2,
      b2.reshape(1, d))
    return y[:m0], (g, lns, lnb, k2, b2, seed)


def _tail_bwd(q, tm, interpret, res, dy):
    g, lns, lnb, k2, b2, seed = res
    m, d = g.shape
    gp, m0 = _pad_rows(g, tm)
    dyp, _ = _pad_rows(dy.astype(g.dtype), tm)
    nm = gp.shape[0] // tm
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    dg, dlns, dlnb, dk2, db2 = pl.pallas_call(
        functools.partial(_tail_bwd_kernel, q=q),
        grid=(nm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            row(d), row(d),
            pl.BlockSpec((d, d), lambda i: (0, 0)),
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((gp.shape[0], d), g.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            row(d), row(d),
            pl.BlockSpec((d, d), lambda i: (0, 0)), row(d),
        ),
        interpret=interpret,
    )(seed, gp, lns.reshape(1, d), lnb.reshape(1, d), k2, dyp)
    # residual input passes dy straight through
    return (dg[:m0], dy.astype(g.dtype),
            dlns.reshape(d).astype(lns.dtype),
            dlnb.reshape(d).astype(lnb.dtype), dk2.astype(k2.dtype),
            db2.reshape(d).astype(b2.dtype), None)


_tail_core.defvjp(_tail_fwd, _tail_bwd)


def fused_postnorm_proj(
    g: jnp.ndarray,
    x_res: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    seed: jnp.ndarray | None = None,
    drop_rate: float = 0.0,
    tile_m: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y = x_res + drop(swish(LN(g)) @ k2 + b2); g, x_res (..., d)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q = 0 if drop_rate <= 0.0 else max(1, min(255, round(drop_rate * 256)))
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    lead = g.shape[:-1]
    d = g.shape[-1]
    y = _tail_core(g.reshape(-1, d), x_res.reshape(-1, d), ln_scale, ln_bias,
                   k2, b2, seed.astype(jnp.int32), q, tile_m, interpret)
    return y.reshape(*lead, d)


# ---------------------------------------------------------------------------
# references for parity tests
# ---------------------------------------------------------------------------


def prenorm_glu_reference(x, ln_scale, ln_bias, k1, b1):
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d).astype(jnp.float32)
    xn, _, _ = _ln_fwd(x2, ln_scale, ln_bias)
    h = xn.astype(x.dtype).astype(jnp.float32) @ k1.astype(jnp.float32) + b1
    a, b = h[:, : k1.shape[1] // 2], h[:, k1.shape[1] // 2:]
    return (a * jax.nn.sigmoid(b)).astype(x.dtype).reshape(*lead, d)


def postnorm_proj_reference(g, x_res, ln_scale, ln_bias, k2, b2, seed=None,
                            drop_rate: float = 0.0, tile_m: int = 256):
    lead = g.shape[:-1]
    d = g.shape[-1]
    g2 = g.reshape(-1, d).astype(jnp.float32)
    gn, _, _ = _ln_fwd(g2, ln_scale, ln_bias)
    a = gn * jax.nn.sigmoid(gn)
    z = a.astype(g.dtype).astype(jnp.float32) @ k2.astype(jnp.float32) + b2
    q = 0 if drop_rate <= 0.0 else max(1, min(255, round(drop_rate * 256)))
    if q > 0:
        mp = -(-z.shape[0] // tile_m) * tile_m
        keeps = [_keep_mask((tile_m, d), seed.astype(jnp.int32)[0],
                            jnp.int32(i), q) for i in range(mp // tile_m)]
        keep = jnp.concatenate(keeps, axis=0)[: z.shape[0]]
        z = jnp.where(keep, z * (256.0 / (256 - q)), 0.0)
    y = x_res.reshape(-1, d).astype(jnp.float32) + z
    return y.astype(g.dtype).reshape(*lead, d)
