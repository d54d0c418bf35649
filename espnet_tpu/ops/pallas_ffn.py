"""Fused position-wise FFN Pallas kernel: x @ W1 -> act -> dropout -> @ W2.

The conformer's macaron FFN pairs are the single largest FLOP block in the
bench model, but the XLA formulation runs at ~45% of bf16 peak: the
(B*T, d_ff) activation/dropout chain costs several HBM round-trips per
layer that XLA cannot fuse into BOTH surrounding matmuls, and autodiff
materialises the d_ff-wide intermediates as residuals. This kernel keeps
the whole chain VMEM-resident per (TM, d_ff) tile:

  forward : h = x@W1 + b1; a = drop(act(h)); y = a@W2 + b2 — one pass,
            nothing d_ff-wide ever touches HBM.
  backward: recomputes h/a from x (flash-style), regenerates the dropout
            mask from the same per-tile counter hash, and accumulates
            dW1/db1/dW2/db2 across the grid run; dx streams out per tile.

Dropout bits come from a counter-based hash (murmur3 finalizer over the
flat element index mixed with seed + tile id) written in plain jnp uint32
ops, so the SAME bitstream is produced on real TPU (Mosaic) and in
`interpret=True` CPU tests — no `pltpu.prng_*` dependency.  The keep rule
is the 1/256-quantized one of `ops.dropout.FastDropout` (byte >= q keeps,
scale 256/(256-q)); the stream itself necessarily differs from
FastDropout's threefry stream, which is fine for dropout.

Equivalent of the reference `PositionwiseFeedForward`
(`espnet/nets/pytorch_backend/transformer/positionwise_feed_forward.py:11`)
at kernel speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(h, activation: str):
    if activation == "swish":
        return h * jax.nn.sigmoid(h)
    if activation == "relu":
        return jnp.maximum(h, 0.0)
    raise ValueError(f"unsupported activation {activation!r}")


def _act_grad(h, activation: str):
    if activation == "swish":
        s = jax.nn.sigmoid(h)
        return s * (1.0 + h * (1.0 - s))
    if activation == "relu":
        return (h > 0.0).astype(h.dtype)
    raise ValueError(f"unsupported activation {activation!r}")


_LN_EPS = 1e-6


def _ln_fwd(x, scale, bias):
    """Row LayerNorm in f32. Returns (y, xhat, inv_std) for reuse in bwd."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy, xhat, inv, scale):
    """d x for y = xhat*scale+bias; plus (dscale, dbias) partial sums."""
    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * inv
    return dx, jnp.sum(dy * xhat, axis=0, keepdims=True), \
        jnp.sum(dy, axis=0, keepdims=True)


def _keep_mask(shape, seed_i32, pid, q: int):
    """Per-element keep mask from a counter hash; identical fwd/bwd.

    Element (r, c) of tile `pid` hashes flat counter r*C + c together with
    a per-(seed, tile) stream id through the murmur3 finalizer; the top
    byte is compared against q like FastDropout.  Pure jnp uint32 ops ->
    works both under Mosaic and in interpret mode with bit-identical
    results.

    The stream id is finalizer(seed) ^ (pid * phi32), NOT seed + pid: with
    plain addition, (seed, pid) and (seed + 1, pid - 1) are the SAME
    stream exactly, so nearby layers sharing a step seed would reuse masks
    deterministically (round-4 advisor finding). Hashing the seed first
    removes all such structured collisions; residual random collisions are
    birthday-rare and statistically harmless for dropout.
    """
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    # modulo-2^32 convert (scalar bitcast isn't lowerable in Mosaic)
    s = seed_i32.astype(jnp.uint32)
    s = s ^ (s >> 16)
    s = s * jnp.uint32(0x85EBCA6B)
    s = s ^ (s >> 13)
    s = s * jnp.uint32(0xC2B2AE35)
    s = s ^ (s >> 16)
    seed = s ^ (pid.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = r * jnp.uint32(shape[1]) + c
    # (A 4-elements-per-finalizer byte-packed variant was measured on v5e:
    # bit-exact A/B possible but NO speedup — the 12-layer FFN chain ran
    # 13.05 vs 12.72 ms; the hash hides behind the matmuls. Kept 1:1.)
    x = x + seed * jnp.uint32(0x9E3779B9)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return (x >> 24) >= jnp.uint32(q)


def _ffn_fwd_kernel(seed_ref, x_ref, k1_ref, b1_ref, k2_ref, b2_ref, y_ref,
                    *, q: int, activation: str):
    pid = pl.program_id(0)
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, k1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    a = _act(h, activation)
    if q > 0:
        keep = _keep_mask(a.shape, seed_ref[0], pid, q)
        a = jnp.where(keep, a * (256.0 / (256 - q)), 0.0)
    y = jax.lax.dot_general(
        a.astype(x.dtype), k2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _ffn_bwd_kernel(seed_ref, x_ref, k1_ref, b1_ref, k2_ref, dy_ref,
                    dx_ref, dk1_ref, db1_ref, dk2_ref, db2_ref,
                    *, q: int, activation: str):
    pid = pl.program_id(0)
    x = x_ref[...]
    k1 = k1_ref[...]
    k2 = k2_ref[...]
    dy = dy_ref[...]
    h = jax.lax.dot_general(
        x, k1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    a = _act(h, activation)
    if q > 0:
        keep = _keep_mask(a.shape, seed_ref[0], pid, q)
        scale = 256.0 / (256 - q)
        a = jnp.where(keep, a * scale, 0.0)
    da = jax.lax.dot_general(
        dy, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if q > 0:
        da = jnp.where(keep, da * scale, 0.0)
    dh = da * _act_grad(h, activation)
    dh_b = dh.astype(x.dtype)
    dx_ref[...] = jax.lax.dot_general(
        dh_b, k1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    a_b = a.astype(x.dtype)
    dk1_t = jax.lax.dot_general(
        x, dh_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_t = jnp.sum(dh, axis=0, keepdims=True)
    dk2_t = jax.lax.dot_general(
        a_b, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_t = jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(pid == 0)
    def _():
        dk1_ref[...] = dk1_t
        db1_ref[...] = db1_t
        dk2_ref[...] = dk2_t
        db2_ref[...] = db2_t

    @pl.when(pid != 0)
    def _():
        dk1_ref[...] += dk1_t
        db1_ref[...] += db1_t
        dk2_ref[...] += dk2_t
        db2_ref[...] += db2_t


def _pad_rows(x, tm):
    m = x.shape[0]
    mp = -(-m // tm) * tm
    if mp == m:
        return x, m
    return jnp.pad(x, ((0, mp - m), (0, 0))), m


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_ffn_core(x, k1, b1, k2, b2, seed, q: int, activation: str,
                    tm: int, interpret: bool):
    y, _ = _fused_ffn_fwd(x, k1, b1, k2, b2, seed, q, activation, tm,
                          interpret)
    return y


def _fused_ffn_fwd(x, k1, b1, k2, b2, seed, q, activation, tm, interpret):
    m, d = x.shape
    dff = k1.shape[1]
    xp, m0 = _pad_rows(x, tm)
    nm = xp.shape[0] // tm
    grid = (nm,)
    y = pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, q=q, activation=activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            pl.BlockSpec((d, dff), lambda i: (0, 0)),
            pl.BlockSpec((1, dff), lambda i: (0, 0)),
            pl.BlockSpec((dff, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
        out_specs=pl.BlockSpec((tm, d), lambda i: (i, 0)),
        interpret=interpret,
    )(seed, xp, k1, b1.reshape(1, dff), k2, b2.reshape(1, d))
    return y[:m0], (x, k1, b1, k2, b2, seed)


def _fused_ffn_bwd(q, activation, tm, interpret, res, g):
    x, k1, b1, k2, b2, seed = res
    m, d = x.shape
    dff = k1.shape[1]
    xp, m0 = _pad_rows(x, tm)
    gp, _ = _pad_rows(g.astype(x.dtype), tm)
    nm = xp.shape[0] // tm
    dx, dk1, db1, dk2, db2 = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, q=q, activation=activation),
        grid=(nm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            pl.BlockSpec((d, dff), lambda i: (0, 0)),
            pl.BlockSpec((1, dff), lambda i: (0, 0)),
            pl.BlockSpec((dff, d), lambda i: (0, 0)),
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
            jax.ShapeDtypeStruct((d, dff), jnp.float32),
            jax.ShapeDtypeStruct((1, dff), jnp.float32),
            jax.ShapeDtypeStruct((dff, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            pl.BlockSpec((d, dff), lambda i: (0, 0)),
            pl.BlockSpec((1, dff), lambda i: (0, 0)),
            pl.BlockSpec((dff, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ),
        interpret=interpret,
    )(seed, xp, k1, b1.reshape(1, dff), k2, gp)
    return (dx[:m0], dk1.astype(k1.dtype), db1.reshape(dff).astype(b1.dtype),
            dk2.astype(k2.dtype), db2.reshape(d).astype(b2.dtype), None)


_fused_ffn_core.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def _tile_m_default() -> int:
    """Rows per FFN-kernel grid step (ESPNET_TPU_FFN_TILE overrides).

    256 keeps the bwd kernel's ~3 (TM, d_ff) f32 intermediates + 4 MB of
    weight-grad accumulators inside the 16 MB scoped-VMEM limit; the knob
    exists for A/B on other geometries."""
    import os

    return int(os.environ.get("ESPNET_TPU_FFN_TILE", "256"))


def fused_ffn(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    seed: jnp.ndarray | None = None,
    drop_rate: float = 0.0,
    activation: str = "swish",
    tile_m: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused FFN over flattened tokens.

    x: (..., d); k1 (d, dff); b1 (dff,); k2 (dff, d); b2 (d,);
    seed: (1,) int32 (vary per step/layer for dropout; may be None when
    drop_rate == 0); drop_rate quantized to 1/256 steps like `FastDropout`.
    Returns (..., d).

    tile_m: rows per grid step, SHARED by forward and backward (the
    dropout mask is regenerated per tile from seed + tile index, so the
    partitions must match). 256 keeps the bwd kernel's ~3 (TM, d_ff) f32
    intermediates + 4 MB of weight-grad accumulators inside the 16 MB
    scoped-VMEM limit.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_m is None:
        tile_m = _tile_m_default()
    q = 0 if drop_rate <= 0.0 else max(1, min(255, round(drop_rate * 256)))
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y = _fused_ffn_core(x2, k1, b1, k2, b2, seed.astype(jnp.int32),
                        q, activation, tile_m, interpret)
    return y.reshape(*lead, d)


def ffn_reference(x, k1, b1, k2, b2, seed=None, drop_rate: float = 0.0,
                  activation: str = "swish", tile_m: int = 256):
    """Unfused jnp reference with the SAME dropout bitstream as the kernel.

    Used by parity tests; mirrors the tile partitioning so masks match.
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    h = x2.astype(jnp.float32) @ k1.astype(jnp.float32) + b1.astype(
        jnp.float32)
    a = _act(h, activation)
    q = 0 if drop_rate <= 0.0 else max(1, min(255, round(drop_rate * 256)))
    if q > 0:
        xp, m0 = _pad_rows(a, tile_m)
        keeps = []
        for pid in range(xp.shape[0] // tile_m):
            keeps.append(_keep_mask((tile_m, a.shape[1]),
                                    seed.astype(jnp.int32)[0],
                                    jnp.int32(pid), q))
        keep = jnp.concatenate(keeps, axis=0)[:a.shape[0]]
        a = jnp.where(keep, a * (256.0 / (256 - q)), 0.0)
    y = a.astype(x.dtype).astype(jnp.float32) @ k2.astype(jnp.float32) \
        + b2.astype(jnp.float32)
    return y.astype(x.dtype).reshape(*lead, d)


# ---------------------------------------------------------------------------
# Pre-norm residual variant: y = x + s * drop2( FFN_drop1( LN(x) ) )
# Absorbs the conformer/transformer block's pre-LayerNorm, both dropouts,
# the macaron 1/2 scale and the residual add into the same kernel, so the
# block's FFN section costs exactly one read of x and one write of y.
# ---------------------------------------------------------------------------


def _pffn_fwd_kernel(seed_ref, x_ref, lns_ref, lnb_ref, k1_ref, b1_ref,
                     k2_ref, b2_ref, y_ref,
                     *, q: int, activation: str, res_scale: float):
    pid = pl.program_id(0)
    x = x_ref[...]
    xn, _, _ = _ln_fwd(x.astype(jnp.float32), lns_ref[...], lnb_ref[...])
    h = jax.lax.dot_general(
        xn.astype(x.dtype), k1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    a = _act(h, activation)
    if q > 0:
        keep = _keep_mask(a.shape, seed_ref[0], pid, q)
        a = jnp.where(keep, a * (256.0 / (256 - q)), 0.0)
    z = jax.lax.dot_general(
        a.astype(x.dtype), k2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    if q > 0:
        keep2 = _keep_mask(z.shape, seed_ref[1], pid, q)
        z = jnp.where(keep2, z * (256.0 / (256 - q)), 0.0)
    y_ref[...] = (x.astype(jnp.float32) + res_scale * z).astype(y_ref.dtype)


def _pffn_bwd_kernel(seed_ref, x_ref, lns_ref, lnb_ref, k1_ref, b1_ref,
                     k2_ref, g_ref,
                     dx_ref, dlns_ref, dlnb_ref, dk1_ref, db1_ref, dk2_ref,
                     db2_ref,
                     *, q: int, activation: str, res_scale: float):
    pid = pl.program_id(0)
    x = x_ref[...]
    k1 = k1_ref[...]
    k2 = k2_ref[...]
    lns = lns_ref[...]
    g = g_ref[...].astype(jnp.float32)
    xn, xhat, inv = _ln_fwd(x.astype(jnp.float32), lns, lnb_ref[...])
    xn_b = xn.astype(x.dtype)
    h = jax.lax.dot_general(
        xn_b, k1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    a = _act(h, activation)
    if q > 0:
        keep = _keep_mask(a.shape, seed_ref[0], pid, q)
        scale = 256.0 / (256 - q)
        a = jnp.where(keep, a * scale, 0.0)
    dz = g * res_scale
    if q > 0:
        keep2 = _keep_mask(dz.shape, seed_ref[1], pid, q)
        dz = jnp.where(keep2, dz * scale, 0.0)
    db2_t = jnp.sum(dz, axis=0, keepdims=True)
    dz_b = dz.astype(x.dtype)
    da = jax.lax.dot_general(
        dz_b, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a_b = a.astype(x.dtype)
    dk2_t = jax.lax.dot_general(
        a_b, dz_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if q > 0:
        da = jnp.where(keep, da * scale, 0.0)
    dh = da * _act_grad(h, activation)
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
    dx_ref[...] = (g + dx_ln).astype(dx_ref.dtype)

    @pl.when(pid == 0)
    def _():
        dlns_ref[...] = dlns_t
        dlnb_ref[...] = dlnb_t
        dk1_ref[...] = dk1_t
        db1_ref[...] = db1_t
        dk2_ref[...] = dk2_t
        db2_ref[...] = db2_t

    @pl.when(pid != 0)
    def _():
        dlns_ref[...] += dlns_t
        dlnb_ref[...] += dlnb_t
        dk1_ref[...] += dk1_t
        db1_ref[...] += db1_t
        dk2_ref[...] += dk2_t
        db2_ref[...] += db2_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _pffn_core(x, lns, lnb, k1, b1, k2, b2, seeds, q: int, activation: str,
               res_scale: float, tm: int, interpret: bool):
    y, _ = _pffn_fwd(x, lns, lnb, k1, b1, k2, b2, seeds, q, activation,
                     res_scale, tm, interpret)
    return y


def _pffn_specs(tm, d, dff):
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((tm, d), lambda i: (i, 0)),
        row(d), row(d),
        pl.BlockSpec((d, dff), lambda i: (0, 0)),
        row(dff),
        pl.BlockSpec((dff, d), lambda i: (0, 0)),
    ]


def _pffn_fwd(x, lns, lnb, k1, b1, k2, b2, seeds, q, activation, res_scale,
              tm, interpret):
    m, d = x.shape
    dff = k1.shape[1]
    xp, m0 = _pad_rows(x, tm)
    nm = xp.shape[0] // tm
    y = pl.pallas_call(
        functools.partial(_pffn_fwd_kernel, q=q, activation=activation,
                          res_scale=res_scale),
        grid=(nm,),
        in_specs=_pffn_specs(tm, d, dff) + [
            pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
        out_specs=pl.BlockSpec((tm, d), lambda i: (i, 0)),
        interpret=interpret,
    )(seeds, xp, lns.reshape(1, d), lnb.reshape(1, d), k1,
      b1.reshape(1, dff), k2, b2.reshape(1, d))
    return y[:m0], (x, lns, lnb, k1, b1, k2, b2, seeds)


def _pffn_bwd(q, activation, res_scale, tm, interpret, res, g):
    x, lns, lnb, k1, b1, k2, b2, seeds = res
    m, d = x.shape
    dff = k1.shape[1]
    xp, m0 = _pad_rows(x, tm)
    gp, _ = _pad_rows(g.astype(x.dtype), tm)
    nm = xp.shape[0] // tm
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    outs = pl.pallas_call(
        functools.partial(_pffn_bwd_kernel, q=q, activation=activation,
                          res_scale=res_scale),
        grid=(nm,),
        in_specs=_pffn_specs(tm, d, dff) + [
            pl.BlockSpec((tm, d), lambda i: (i, 0))],
        out_shape=(
            jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, dff), jnp.float32),
            jax.ShapeDtypeStruct((1, dff), jnp.float32),
            jax.ShapeDtypeStruct((dff, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((tm, d), lambda i: (i, 0)),
            row(d), row(d),
            pl.BlockSpec((d, dff), lambda i: (0, 0)), row(dff),
            pl.BlockSpec((dff, d), lambda i: (0, 0)), row(d),
        ),
        interpret=interpret,
    )(seeds, xp, lns.reshape(1, d), lnb.reshape(1, d), k1,
      b1.reshape(1, dff), k2, gp)
    dx, dlns, dlnb, dk1, db1, dk2, db2 = outs
    return (dx[:m0], dlns.reshape(d).astype(lns.dtype),
            dlnb.reshape(d).astype(lnb.dtype), dk1.astype(k1.dtype),
            db1.reshape(dff).astype(b1.dtype), dk2.astype(k2.dtype),
            db2.reshape(d).astype(b2.dtype), None)


_pffn_core.defvjp(_pffn_fwd, _pffn_bwd)


def fused_prenorm_ffn(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    seeds: jnp.ndarray | None = None,
    drop_rate: float = 0.0,
    activation: str = "swish",
    residual_scale: float = 1.0,
    tile_m: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y = x + residual_scale * drop(FFN_drop(LN(x))) in one kernel.

    The pre-norm FFN sub-block of a conformer (residual_scale=0.5, swish)
    or transformer (1.0, relu) encoder layer. seeds: (2,) int32 — stream 0
    for the in-FFN dropout, stream 1 for the output dropout; both use the
    FastDropout 1/256-quantized keep rule. LayerNorm parameter gradients
    are exact.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_m is None:
        tile_m = _tile_m_default()
    q = 0 if drop_rate <= 0.0 else max(1, min(255, round(drop_rate * 256)))
    if seeds is None:
        seeds = jnp.zeros((2,), jnp.int32)
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y = _pffn_core(x2, ln_scale, ln_bias, k1, b1, k2, b2,
                   seeds.astype(jnp.int32), q, activation,
                   float(residual_scale), tile_m, interpret)
    return y.reshape(*lead, d)


def prenorm_ffn_reference(x, ln_scale, ln_bias, k1, b1, k2, b2, seeds=None,
                          drop_rate: float = 0.0, activation: str = "swish",
                          residual_scale: float = 1.0, tile_m: int = 256):
    """Unfused jnp reference with the kernel's dropout bitstreams."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d).astype(jnp.float32)
    xn, _, _ = _ln_fwd(x2, ln_scale, ln_bias)
    h = xn @ k1.astype(jnp.float32) + b1
    a = _act(h, activation)
    q = 0 if drop_rate <= 0.0 else max(1, min(255, round(drop_rate * 256)))

    def tiled_mask(shape, seed):
        mp = -(-shape[0] // tile_m) * tile_m
        keeps = [_keep_mask((tile_m, shape[1]), seed, jnp.int32(i), q)
                 for i in range(mp // tile_m)]
        return jnp.concatenate(keeps, axis=0)[:shape[0]]

    if q > 0:
        keep = tiled_mask(a.shape, seeds.astype(jnp.int32)[0])
        a = jnp.where(keep, a * (256.0 / (256 - q)), 0.0)
    z = a @ k2.astype(jnp.float32) + b2
    if q > 0:
        keep2 = tiled_mask(z.shape, seeds.astype(jnp.int32)[1])
        z = jnp.where(keep2, z * (256.0 / (256 - q)), 0.0)
    y = x2 + residual_scale * z
    return y.astype(x.dtype).reshape(*lead, d)
