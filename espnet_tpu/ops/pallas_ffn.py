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


def _keep_mask(shape, seed_i32, pid, q: int):
    """Per-element keep mask from a counter hash; identical fwd/bwd.

    Element (r, c) of tile `pid` hashes flat counter r*C + c together with
    (seed + pid) through the murmur3 finalizer; the top byte is compared
    against q like FastDropout.  Pure jnp uint32 ops -> works both under
    Mosaic and in interpret mode with bit-identical results.
    """
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    # modulo-2^32 convert (scalar bitcast isn't lowerable in Mosaic)
    seed = (seed_i32 + pid).astype(jnp.uint32)
    x = r * jnp.uint32(shape[1]) + c
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


def fused_ffn(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    seed: jnp.ndarray | None = None,
    drop_rate: float = 0.0,
    activation: str = "swish",
    tile_m: int = 256,
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
