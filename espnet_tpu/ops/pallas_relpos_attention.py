"""Pallas TPU flash attention with Transformer-XL relative positions.

The Conformer's hot op (`espnet/nets/pytorch_backend/transformer/attention.py:209`
RelPositionMultiHeadedAttention) computes

    score[b,h,i,j] = ((q+u)·k  +  (q+v)·p[T-1-(i-j)]) / sqrt(dk)

where the second ("bd") term is conventionally materialised as a
(B, H, T, 2T-1) tensor and then re-indexed by `rel_shift` — on TPU that
costs ~4x the whole rest of the attention (measured: the bd term alone is
64 ms of an 80 ms fwd+bwd for 12 layers at B=32, T=468). This module
computes both terms inside one blocked online-softmax kernel so no T^2
tensor ever touches HBM.

Key idea — block-local skew: with square blocks of size BLK and T padded
to m*BLK, the p-rows needed by the (qi, kj) tile are the contiguous window
p[(m-1 + j - i)*BLK : ... + 2*BLK]  (block-aligned!), and within the tile

    bd[r, c] = (qv_r · p_win)[c + BLK-1-r]

which is a per-row left-shift by (BLK-1-r): applied with log2(BLK)
conditional lane-rolls (`pltpu.roll`) — pure VPU work, no gather.

Backward is the standard flash decomposition in three recompute passes
(dq; dk/dv; dp), where the dp pass runs over p-window *diagonals* so each
output slab is accumulated across its grid run and overlap-added outside.

All passes are exact analytic gradients of the forward math. The public
entry `relpos_flash_attention` takes unpadded (B, H, T, D) tensors plus the
(2T-1) position table and handles padding/masking; gradients for the
pos-bias vectors u/v flow through the qu/qv construction in plain JAX.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(np.finfo(np.float32).min) / 2


def _butterfly_skew() -> bool:
    """ESPNET_TPU_RELPOS_SKEW=butterfly swaps the single strided
    `tpu.dynamic_rotate` for log2(BLK) constant rolls + selects — kept as
    an A/B escape hatch; the strided rotate measured faster in the full
    train step on v5e (85.6 vs 101 ms/step at BLK=512)."""
    import os

    return os.environ.get("ESPNET_TPU_RELPOS_SKEW", "") == "butterfly"


def _anti_identity(blk: int, dtype=jnp.float32) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    return (r + c == blk - 1).astype(dtype)


def _rev_butterfly() -> bool:
    """ESPNET_TPU_REV=butterfly swaps the (BLK, BLK) anti-identity matmul
    lane-reverse in `_unskew_rev` for a log2(BLK)-step xor permutation of
    constant rolls + selects (pure VPU) — A/B switch: the matmul costs
    ~BLK^3 MXU MACs per tile (the single largest matmul in the m==1 bwd),
    the butterfly costs ~2·log2(BLK) VPU passes over the tile."""
    import os

    return os.environ.get("ESPNET_TPU_REV", "") == "butterfly"


def _lane_reverse(x: jnp.ndarray) -> jnp.ndarray:
    """out[:, c] = x[:, w-1-c] for power-of-two lane width w.

    Reversal is index-XOR with (w-1); XOR with each bit decomposes into a
    pair of constant circular rolls + a lane-parity select, so the whole
    reverse is log2(w) roll/roll/select steps — no MXU work. Mosaic has no
    native `rev` (checked jax 0.9.0: "Unimplemented primitive ... rev").
    """
    w = x.shape[1]
    c = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    bit = 1
    while bit < w:
        right = pltpu.roll(x, bit, 1)      # x[c - bit]
        left = pltpu.roll(x, w - bit, 1)   # x[c + bit]
        x = jnp.where((c & bit) != 0, right, left)
        bit *= 2
    return x


def _roll_by_row(x: jnp.ndarray, blk: int) -> jnp.ndarray:
    """Right-roll row r of x by r lanes via constant rolls + selects."""
    r = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    bit = 1
    while bit < blk:
        sel = (r & bit) != 0  # (blk, 1) broadcasts over lanes
        x = jnp.where(sel, pltpu.roll(x, bit, 1), x)
        bit *= 2
    return x


def _skew(x: jnp.ndarray, blk: int, interpret: bool) -> jnp.ndarray:
    """x: (BLK, 2*BLK) -> out[r, c] = x[r, c + BLK-1-r], (BLK, BLK).

    Compiled path: one constant lane-roll plus a per-row roll (strided
    `tpu.dynamic_rotate`, or the butterfly decomposition under the env
    switch) — circular wraparound never contaminates the kept [0, BLK)
    columns because the source index c + BLK-1-r stays < 2*BLK-1.
    """
    w = x.shape[1]
    if interpret:
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        return jnp.take_along_axis(x, c + blk - 1 - r, axis=1)
    # right-roll each row by (w-blk+1) + r  ==  left-roll by blk-1-r
    y = pltpu.roll(x, w - blk + 1, 1)
    if _butterfly_skew():
        y = _roll_by_row(y, blk)
    else:
        y = pltpu.roll(y, 0, 1, stride=1, stride_axis=0)
    return y[:, :blk]


def _unskew(g: jnp.ndarray, blk: int, interpret: bool) -> jnp.ndarray:
    """Adjoint of `_skew`: g (BLK, BLK) -> (BLK, 2*BLK) with
    out[r, c + BLK-1-r] = g[r, c], zeros elsewhere.

    Compiled path: the target right-roll of row r by (blk-1-r) decomposes
    into a constant right-roll by blk-1 followed by a per-row LEFT roll by
    r, done with the same butterfly as `_roll_by_row` (left roll by `bit`
    == circular right roll by `w - bit`).
    """
    w = 2 * blk
    gz = jnp.concatenate([g, jnp.zeros((blk, w - blk), g.dtype)], axis=1)
    if interpret:
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, w), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (blk, w), 1)
        src = c - (blk - 1 - r)
        valid = (src >= 0) & (src < blk)
        return jnp.where(
            valid, jnp.take_along_axis(gz, jnp.clip(src, 0, blk - 1), axis=1), 0.0
        )
    # target: right-roll row r by (blk-1-r) on width w. (A single
    # negative-stride rotate would do it, but Mosaic's dynamic_rotate
    # only lowers small non-negative strides.)
    if _butterfly_skew():
        # constant right roll by blk-1 + binary per-row LEFT roll by r
        # (left roll by bit == circular right roll by w - bit)
        y = pltpu.roll(gz, blk - 1, 1)
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
        bit = 1
        while bit < blk:
            sel = (r & bit) != 0
            y = jnp.where(sel, pltpu.roll(y, w - bit, 1), y)
            bit *= 2
        return y
    # strided path: rows flipped with an anti-identity matmul (Mosaic has
    # no sublane-reverse), rolled with stride +1, flipped back. The flips
    # are permutations, so they run in the INPUT dtype exactly (one nonzero
    # product per output element) — callers cast ds to bf16 first, which
    # commutes with the permutation and quarters the MXU passes vs f32.
    j = _anti_identity(blk, gz.dtype)
    gf = jax.lax.dot_general(
        j, gz, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dynamic_rotate only lowers 32-bit data — roll in f32, matmuls in the
    # input dtype (the flips are permutations, exact in any dtype)
    hh = pltpu.roll(gf, 0, 1, stride=1, stride_axis=0)  # right-roll row r by r
    return jax.lax.dot_general(
        j, hh.astype(gz.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(gz.dtype)


def _unskew_rev(ds, blk: int, interpret: bool) -> jnp.ndarray:
    """Lane-REVERSED unskew: returns dsh (BLK, 2*BLK) with

        dsh[r, y] = ds[r, blk-1 - (y - r)]   (zero outside)

    so that the true unskew is ds2[r, x] = dsh[r, w-2-x]. Consumers absorb
    the lane reversal by contracting against row-reversed constants
    (pw -> pwf outside the kernel) and un-reversing the dp output rows in
    XLA after the pallas_call — leaving ONE (BLK, BLK) reverse matmul and
    one stride+1 rotate in-kernel, vs the two (BLK, 2BLK)-wide row-flip
    matmuls (K=BLK each) the direct `_unskew` needs. Those flips cost more
    MXU FLOPs than the whole real gradient math at D=64 (measured 5.7 ms
    of a 20.3 ms 12-layer bwd at B=32, T=512).
    """
    w = 2 * blk
    if interpret:
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, w), 0)
        y = jax.lax.broadcasted_iota(jnp.int32, (blk, w), 1)
        src = blk - 1 - (y - r)
        valid = (src >= 0) & (src < blk)
        return jnp.where(
            valid,
            jnp.take_along_axis(ds, jnp.clip(src, 0, blk - 1), axis=1),
            jnp.zeros((), ds.dtype),
        )
    if _rev_butterfly():
        ds_rev = _lane_reverse(ds.astype(jnp.float32))
    else:
        j = _anti_identity(blk, ds.dtype)
        ds_rev = jax.lax.dot_general(
            ds, j, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # ds_rev[r, c*] = ds[r, blk-1-c*]
    gz = jnp.concatenate(
        [ds_rev, jnp.zeros((blk, w - blk), jnp.float32)], axis=1
    )
    # right-shift row r by r: stride +1, no wraparound contamination
    # (data columns stay < blk + r < w)
    return pltpu.roll(gz, 0, 1, stride=1, stride_axis=0).astype(ds.dtype)


def _scores(qu, qv, ks, pw, kb_row, scale, blk, interpret):
    """One (BLK_q x BLK_k) masked score tile in f32."""
    ac = jax.lax.dot_general(
        qu, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s2 = jax.lax.dot_general(
        qv, pw, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    bd = _skew(s2, blk, interpret)
    return (ac + bd) * scale + kb_row[None, :]


def _fwd_kernel(q_ref, u_ref, vb_ref, k_ref, v_ref, p_ref, kb_ref, o_ref,
                lse_ref, *, blk: int, m: int, scale: float, interpret: bool):
    qb = pl.program_id(1)
    q = q_ref[0]
    # position biases are added in-kernel: one q stream from HBM instead of
    # two precomputed (q+u), (q+v) arrays
    qu = q + u_ref[0].astype(q.dtype)
    qv = q + vb_ref[0].astype(q.dtype)
    d = qu.shape[-1]

    def body(j, carry):
        acc, mx, l = carry
        ks = k_ref[0, pl.ds(j * blk, blk), :]
        vs = v_ref[0, pl.ds(j * blk, blk), :]
        pw = p_ref[0, pl.ds((m - 1 + j - qb) * blk, 2 * blk), :]
        kb = kb_ref[0, 0, pl.ds(j * blk, blk)]
        s = _scores(qu, qv, ks, pw, kb, scale, blk, interpret)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(mx, m_cur)
        alpha = jnp.exp(mx - m_new)
        pmat = jnp.exp(s - m_new[:, None])
        l_new = l * alpha + jnp.sum(pmat, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            pmat.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk, d), jnp.float32)
    m0 = jnp.full((blk,), NEG, jnp.float32)
    l0 = jnp.zeros((blk,), jnp.float32)
    acc, mx, l = jax.lax.fori_loop(0, m, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0, pl.ds(qb * blk, blk)] = mx + jnp.log(l_safe)


def _dqdp_kernel(qu_ref, qv_ref, k_ref, v_ref, p_ref, kb_ref, do_ref,
                 lse_ref, dl_ref, dqu_ref, dqv_ref, dp_ref, wide_ref,
                 *, blk: int, m: int, scale: float, interpret: bool):
    """Fused dq + dp pass. Grid (H, m q-blocks, B): for one (head, q-block)
    the per-batch steps run consecutively, so the dp slab output block is
    accumulated across the whole batch before moving on. The unskewed ds
    tiles are also accumulated into a (BLK, (m+1)*BLK) strip in p-window
    coordinates so dp needs a single matmul per step instead of a
    diagonal-sweep pass (round-1 design had a 7x finer dp grid)."""
    qb = pl.program_id(1)
    bb = pl.program_id(2)
    qu = qu_ref[0]
    qv = qv_ref[0]
    do = do_ref[0, pl.ds(qb * blk, blk), :]
    lse = lse_ref[0, 0, pl.ds(qb * blk, blk)]
    delta = dl_ref[0, 0, pl.ds(qb * blk, blk)]
    d = qu.shape[-1]
    wide_ref[:] = jnp.zeros_like(wide_ref)

    def body(j, carry):
        dqu, dqv = carry
        ks = k_ref[0, pl.ds(j * blk, blk), :]
        vs = v_ref[0, pl.ds(j * blk, blk), :]
        pw = p_ref[0, pl.ds((m - 1 + j - qb) * blk, 2 * blk), :]
        kb = kb_ref[0, 0, pl.ds(j * blk, blk)]
        s = _scores(qu, qv, ks, pw, kb, scale, blk, interpret)
        w = jnp.exp(s - lse[:, None])
        dp_s = jax.lax.dot_general(
            do, vs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = w * (dp_s - delta[:, None]) * scale
        dqu = dqu + jax.lax.dot_general(
            ds.astype(ks.dtype), ks, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds2 = _unskew(ds.astype(pw.dtype), blk, interpret)
        dqv = dqv + jax.lax.dot_general(
            ds2, pw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wide_ref[:, pl.ds(j * blk, 2 * blk)] += ds2.astype(jnp.float32)
        return dqu, dqv

    z = jnp.zeros((blk, d), jnp.float32)
    dqu, dqv = jax.lax.fori_loop(0, m, body, (z, z))
    dqu_ref[0] = dqu
    dqv_ref[0] = dqv
    contrib = jax.lax.dot_general(
        wide_ref[:].astype(qv.dtype), qv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # ((m+1)*BLK, D)

    @pl.when(bb == 0)
    def _():
        dp_ref[0, 0] = contrib

    @pl.when(bb != 0)
    def _():
        dp_ref[0, 0] += contrib


def _fused1_bwd_kernel(q_ref, u_ref, vb_ref, k_ref, v_ref, p_ref, kb_ref,
                       do_ref, lse_ref, dl_ref, dq_ref, dk_ref, dv_ref,
                       dp_ref, du_ref, dvb_ref,
                       *, blk: int, scale: float, interpret: bool):
    """Single-pass backward for the m == 1 case (whole sequence in one
    tile, the common bucket once T <= BLK): the score/weight tile is
    computed ONCE and every gradient (dq = dqu+dqv summed in-kernel, dk,
    dv, dp, du, dvb) falls out of it — versus the general 3-output/2-kernel
    path which recomputes the tile twice. Grid (H, B): for one head the
    batch steps run consecutively so the dp/du/dvb output blocks
    accumulate across the batch. Padded-query rows contribute zero
    automatically: the caller's output slice makes their `do` rows zero."""
    bb = pl.program_id(1)
    q = q_ref[0]
    qu = q + u_ref[0].astype(q.dtype)
    qv = q + vb_ref[0].astype(q.dtype)
    ks = k_ref[0]
    vs = v_ref[0]
    pw = p_ref[0]
    kb = kb_ref[0, 0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = dl_ref[0, 0]
    s = _scores(qu, qv, ks, pw, kb, scale, blk, interpret)
    w = jnp.exp(s - lse[:, None])
    dp_s = jax.lax.dot_general(
        do, vs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = w * (dp_s - delta[:, None]) * scale
    dqu = jax.lax.dot_general(
        ds.astype(ks.dtype), ks, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds2 = _unskew(ds.astype(pw.dtype), blk, interpret)
    dqv = jax.lax.dot_general(
        ds2, pw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = (dqu + dqv).astype(dq_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        w.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds.astype(qu.dtype), qu, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)
    contrib = jax.lax.dot_general(
        ds2, qv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2*BLK, D)
    du_t = jnp.sum(dqu, axis=0, keepdims=True)   # (1, D)
    dvb_t = jnp.sum(dqv, axis=0, keepdims=True)

    @pl.when(bb == 0)
    def _():
        dp_ref[0] = contrib
        du_ref[0] = du_t
        dvb_ref[0] = dvb_t

    @pl.when(bb != 0)
    def _():
        dp_ref[0] += contrib
        du_ref[0] += du_t
        dvb_ref[0] += dvb_t


def _flash_bwd_fused1(q, u2, vb2, k, v, p2, kbias3, do, lse, delta, blk,
                      interpret):
    """m == 1 backward: one pallas_call, grid (H, B)."""
    bh, t, d = q.shape
    h = p2.shape[0]
    b = kbias3.shape[0]
    scale = 1.0 / (d ** 0.5)
    per_bh = [
        pl.BlockSpec((1, t, d), lambda hh, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, 1, d), lambda hh, bb: (hh, 0, 0)),
        pl.BlockSpec((1, 1, d), lambda hh, bb: (hh, 0, 0)),
        pl.BlockSpec((1, t, d), lambda hh, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, t, d), lambda hh, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, 2 * t, d), lambda hh, bb: (hh, 0, 0)),
        pl.BlockSpec((1, 1, t), lambda hh, bb: (bb, 0, 0)),
        pl.BlockSpec((1, t, d), lambda hh, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, 1, t), lambda hh, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, 1, t), lambda hh, bb, H=h: (bb * H + hh, 0, 0)),
    ]
    out_bh = pl.BlockSpec((1, t, d), lambda hh, bb, H=h: (bb * H + hh, 0, 0))
    dq, dk, dv, dp2, du, dvb = pl.pallas_call(
        functools.partial(_fused1_bwd_kernel, blk=blk, scale=scale,
                          interpret=interpret),
        grid=(h, b),
        in_specs=per_bh,
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((h, 2 * t, d), jnp.float32),
            jax.ShapeDtypeStruct((h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((h, 1, d), jnp.float32),
        ),
        out_specs=(
            out_bh, out_bh, out_bh,
            pl.BlockSpec((1, 2 * t, d), lambda hh, bb: (hh, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda hh, bb: (hh, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda hh, bb: (hh, 0, 0)),
        ),
        interpret=interpret,
    )(q, u2, vb2, k, v, p2, kbias3, do, lse, delta)
    return dq, dk, dv, dp2, du, dvb


def _fwd_kernel_fold(q_ref, u_ref, vb_ref, k_ref, v_ref, p_ref, kb_ref,
                     o_ref, lse_ref, *, blk: int, h: int, scale: float,
                     interpret: bool):
    """m == 1 forward with ALL heads of one batch item per grid step.

    The m==1 tile work (a few (BLK, 64) matmuls + one softmax) is far too
    small to amortise per-grid-step dispatch: grid (B*H, 1) spends most of
    its time between steps. Folding the head loop into the kernel (static
    unroll, identical per-head math) cuts the grid from B*H to B steps and
    lets the per-head streams pipeline on the MXU/VPU."""
    kb = kb_ref[0, 0]
    for hh in range(h):
        q = q_ref[hh]
        qu = q + u_ref[hh].astype(q.dtype)
        qv = q + vb_ref[hh].astype(q.dtype)
        s = _scores(qu, qv, k_ref[hh], p_ref[hh], kb, scale, blk, interpret)
        mx = jnp.max(s, axis=-1)
        pmat = jnp.exp(s - mx[:, None])
        l = jnp.sum(pmat, axis=-1)
        l_safe = jnp.maximum(l, 1e-30)
        acc = jax.lax.dot_general(
            pmat.astype(v_ref.dtype), v_ref[hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[hh] = (acc / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[hh, 0] = mx + jnp.log(l_safe)


def _flash_fwd_fold(q, u2, vb2, k, v, p2, kbias3, blk, interpret):
    """m == 1 forward: one pallas_call, grid (B,), all heads per step."""
    bh, t, d = q.shape
    h = p2.shape[0]
    b = kbias3.shape[0]
    per_h_full = pl.BlockSpec((h, 1, d), lambda bb: (0, 0, 0))
    per_b = pl.BlockSpec((h, t, d), lambda bb: (bb, 0, 0))
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_fold, blk=blk, h=h,
                          scale=1.0 / (d ** 0.5), interpret=interpret),
        grid=(b,),
        in_specs=[
            per_b, per_h_full, per_h_full, per_b, per_b,
            pl.BlockSpec((h, 2 * t, d), lambda bb: (0, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda bb: (bb, 0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ),
        out_specs=(per_b, pl.BlockSpec((h, 1, t), lambda bb: (bb, 0, 0))),
        interpret=interpret,
    )(q, u2, vb2, k, v, p2, kbias3)
    return o, lse


def _fused1_bwd_kernel_fold(q_ref, u_ref, vb_ref, k_ref, v_ref, p_ref,
                            pf_ref, kb_ref, do_ref, lse_ref, dl_ref, dq_ref,
                            dk_ref, dv_ref, dp_ref, du_ref, dvb_ref,
                            *, blk: int, h: int, scale: float,
                            interpret: bool):
    """Head-folded `_fused1_bwd_kernel`: grid (B,), per-head math unrolled
    in-kernel; dp/du/dvb accumulate across the batch grid run.

    Works in lane-reversed score coordinates (`_unskew_rev`): pf_ref holds
    the row-reversed p-window (pf[y] = pw[2blk-2-y], built in XLA by the
    caller) and dp_ref is produced ROW-REVERSED (dp_rev[y] = dp[2blk-2-y]);
    the caller un-reverses it after the pallas_call."""
    bb = pl.program_id(0)
    kb = kb_ref[0, 0]
    for hh in range(h):
        q = q_ref[hh]
        qu = q + u_ref[hh].astype(q.dtype)
        qv = q + vb_ref[hh].astype(q.dtype)
        ks = k_ref[hh]
        vs = v_ref[hh]
        pw = p_ref[hh]
        pwf = pf_ref[hh]
        do = do_ref[hh]
        lse = lse_ref[hh, 0]
        delta = dl_ref[hh, 0]
        s = _scores(qu, qv, ks, pw, kb, scale, blk, interpret)
        w = jnp.exp(s - lse[:, None])
        dp_s = jax.lax.dot_general(
            do, vs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = w * (dp_s - delta[:, None]) * scale
        dqu = jax.lax.dot_general(
            ds.astype(ks.dtype), ks, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dsh = _unskew_rev(ds.astype(pw.dtype), blk, interpret)
        # dqv[r] = sum_x ds2[r,x] pw[x] = sum_y dsh[r,y] pwf[y]
        dqv = jax.lax.dot_general(
            dsh, pwf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[hh] = (dqu + dqv).astype(dq_ref.dtype)
        dv_ref[hh] = jax.lax.dot_general(
            w.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dk_ref[hh] = jax.lax.dot_general(
            ds.astype(qu.dtype), qu, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        # dp_rev[y] = sum_r dsh[r,y] qv[r]  ( = dp[2blk-2-y] )
        contrib = jax.lax.dot_general(
            dsh, qv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2*BLK, D), row-reversed dp
        du_t = jnp.sum(dqu, axis=0, keepdims=True)   # (1, D)
        dvb_t = jnp.sum(dqv, axis=0, keepdims=True)

        @pl.when(bb == 0)
        def _():
            dp_ref[hh] = contrib
            du_ref[hh] = du_t
            dvb_ref[hh] = dvb_t

        @pl.when(bb != 0)
        def _():
            dp_ref[hh] += contrib
            du_ref[hh] += du_t
            dvb_ref[hh] += dvb_t


def _flash_bwd_fold(q, u2, vb2, k, v, p2, kbias3, do, lse, delta, blk,
                    interpret):
    """m == 1 backward: one pallas_call, grid (B,), all heads per step."""
    bh, t, d = q.shape
    h = p2.shape[0]
    b = kbias3.shape[0]
    w = 2 * t
    scale = 1.0 / (d ** 0.5)
    # row-reversed p-window for the lane-reversed gradient coordinates:
    # pwf[y] = pw[w-2-y] (last row never touched -> zeros). Built here in
    # XLA (fused reverse, negligible), read by the kernel like p2.
    pwf = jnp.concatenate(
        [jnp.flip(p2[:, : w - 1], axis=1),
         jnp.zeros((h, 1, d), p2.dtype)], axis=1)
    per_h_full = pl.BlockSpec((h, 1, d), lambda bb: (0, 0, 0))
    per_b = pl.BlockSpec((h, t, d), lambda bb: (bb, 0, 0))
    per_b_row = pl.BlockSpec((h, 1, t), lambda bb: (bb, 0, 0))
    p_spec = pl.BlockSpec((h, w, d), lambda bb: (0, 0, 0))
    dq, dk, dv, dp_rev, du, dvb = pl.pallas_call(
        functools.partial(_fused1_bwd_kernel_fold, blk=blk, h=h, scale=scale,
                          interpret=interpret),
        grid=(b,),
        in_specs=[
            per_b, per_h_full, per_h_full, per_b, per_b,
            p_spec, p_spec,
            pl.BlockSpec((1, 1, t), lambda bb: (bb, 0, 0)),
            per_b, per_b_row, per_b_row,
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((h, w, d), jnp.float32),
            jax.ShapeDtypeStruct((h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((h, 1, d), jnp.float32),
        ),
        out_specs=(
            per_b, per_b, per_b,
            pl.BlockSpec((h, w, d), lambda bb: (0, 0, 0)),
            pl.BlockSpec((h, 1, d), lambda bb: (0, 0, 0)),
            pl.BlockSpec((h, 1, d), lambda bb: (0, 0, 0)),
        ),
        interpret=interpret,
    )(q, u2, vb2, k, v, p2, pwf, kbias3, do, lse, delta)
    # un-reverse dp rows: dp[x] = dp_rev[w-2-x], dp[w-1] = 0
    dp2 = jnp.concatenate(
        [jnp.flip(dp_rev[:, : w - 1], axis=1),
         jnp.zeros((h, 1, d), dp_rev.dtype)], axis=1)
    return dq, dk, dv, dp2, du, dvb


def _fold_heads() -> bool:
    """ESPNET_TPU_ATTN_FOLD=0 restores the per-(batch, head) grid."""
    import os

    return os.environ.get("ESPNET_TPU_ATTN_FOLD", "1") != "0"


def _dkv_kernel(qu_ref, qv_ref, k_ref, v_ref, p_ref, kb_ref, do_ref, lse_ref,
                dl_ref, dk_ref, dv_ref,
                *, blk: int, m: int, scale: float, interpret: bool):
    jb = pl.program_id(1)
    ks = k_ref[0, pl.ds(jb * blk, blk), :]
    vs = v_ref[0, pl.ds(jb * blk, blk), :]
    kb = kb_ref[0, 0, pl.ds(jb * blk, blk)]
    d = ks.shape[-1]

    def body(qb, carry):
        dk, dv = carry
        qu = qu_ref[0, pl.ds(qb * blk, blk), :]
        qv = qv_ref[0, pl.ds(qb * blk, blk), :]
        do = do_ref[0, pl.ds(qb * blk, blk), :]
        lse = lse_ref[0, 0, pl.ds(qb * blk, blk)]
        delta = dl_ref[0, 0, pl.ds(qb * blk, blk)]
        pw = p_ref[0, pl.ds((m - 1 + jb - qb) * blk, 2 * blk), :]
        s = _scores(qu, qv, ks, pw, kb, scale, blk, interpret)
        w = jnp.exp(s - lse[:, None])
        dv = dv + jax.lax.dot_general(
            w.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp_s = jax.lax.dot_general(
            do, vs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = w * (dp_s - delta[:, None]) * scale
        dk = dk + jax.lax.dot_general(
            ds.astype(qu.dtype), qu, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    z = jnp.zeros((blk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, m, body, (z, z))
    dk_ref[0] = dk
    dv_ref[0] = dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _flash_core(q, u2, vb2, k, v, p2, kbias, blk: int, interpret: bool):
    o, _ = _flash_fwd_impl(q, u2, vb2, k, v, p2, kbias, blk, interpret)
    return o


def _flash_fwd_impl(q, u2, vb2, k, v, p2, kbias, blk, interpret):
    bh, t, d = q.shape
    h = p2.shape[0]
    b = kbias.shape[0]
    m = t // blk
    kbias = kbias.reshape(b, 1, t)
    if m == 1 and _fold_heads():
        return _flash_fwd_fold(q, u2, vb2, k, v, p2, kbias, blk, interpret)
    grid = (bh, m)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, blk=blk, m=m,
                          scale=1.0 / (d ** 0.5), interpret=interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j, H=h: (i % H, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j, H=h: (i % H, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 2 * t, d), lambda i, j: (i % h, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j: (i // h, 0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),
        ),
        interpret=interpret,
    )(q, u2, vb2, k, v, p2, kbias)
    return o, lse


def _flash_fwd(q, u2, vb2, k, v, p2, kbias, blk, interpret):
    o, lse = _flash_fwd_impl(q, u2, vb2, k, v, p2, kbias, blk, interpret)
    return o, (q, u2, vb2, k, v, p2, kbias, o, lse)


def _flash_bwd(blk, interpret, res, g):
    q, u2, vb2, k, v, p2, kbias, o, lse = res
    bh, t, d = q.shape
    h = p2.shape[0]
    b = kbias.shape[0]
    m = t // blk
    scale = 1.0 / (d ** 0.5)
    do = g
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(bh, 1, t)
    kbias3 = kbias.reshape(b, 1, t)
    dkbias = jnp.zeros_like(kbias)  # mask bias is a non-learned constant

    if m == 1:
        bwd1 = _flash_bwd_fold if _fold_heads() else _flash_bwd_fused1
        dq, dk, dv, dp2, du, dvb = bwd1(
            q, u2, vb2, k, v, p2, kbias3, do, lse, delta, blk, interpret
        )
        return (dq.astype(q.dtype), du.astype(u2.dtype),
                dvb.astype(vb2.dtype), dk.astype(k.dtype),
                dv.astype(v.dtype), dp2.astype(p2.dtype), dkbias)

    # general path: build qu/qv once in XLA, reuse the 2-kernel backward,
    # aggregate dq/du/dvb from its dqu/dqv outputs (row i is head i % h)
    qu = q + jnp.tile(u2.astype(q.dtype), (bh // h, 1, 1))
    qv = q + jnp.tile(vb2.astype(q.dtype), (bh // h, 1, 1))

    common_specs = [
        pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),  # qu full
        pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),  # qv full
        pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),  # k full
        pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),  # v full
        pl.BlockSpec((1, 2 * t, d), lambda i, j: (i % h, 0, 0)),
        pl.BlockSpec((1, 1, t), lambda i, j: (i // h, 0, 0)),
        pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),  # do full
        pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),  # lse full
        pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),  # delta full
    ]

    # pass 1 (fused): dqu, dqv and the dp slabs. Grid (H, m, B) so the
    # per-(head, q-block) dp slab accumulates across the batch run.
    dqdp_specs = [
        pl.BlockSpec((1, blk, d), lambda hh, qb, bb, H=h: (bb * H + hh, qb, 0)),
        pl.BlockSpec((1, blk, d), lambda hh, qb, bb, H=h: (bb * H + hh, qb, 0)),
        pl.BlockSpec((1, t, d), lambda hh, qb, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, t, d), lambda hh, qb, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, 2 * t, d), lambda hh, qb, bb: (hh, 0, 0)),
        pl.BlockSpec((1, 1, t), lambda hh, qb, bb: (bb, 0, 0)),
        pl.BlockSpec((1, t, d), lambda hh, qb, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, 1, t), lambda hh, qb, bb, H=h: (bb * H + hh, 0, 0)),
        pl.BlockSpec((1, 1, t), lambda hh, qb, bb, H=h: (bb * H + hh, 0, 0)),
    ]
    dqu, dqv, slabs = pl.pallas_call(
        functools.partial(_dqdp_kernel, blk=blk, m=m, scale=scale,
                          interpret=interpret),
        grid=(h, m, b),
        in_specs=dqdp_specs,
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
            jax.ShapeDtypeStruct((h, m, (m + 1) * blk, d), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((1, blk, d), lambda hh, qb, bb, H=h: (bb * H + hh, qb, 0)),
            pl.BlockSpec((1, blk, d), lambda hh, qb, bb, H=h: (bb * H + hh, qb, 0)),
            pl.BlockSpec((1, 1, (m + 1) * blk, d), lambda hh, qb, bb: (hh, qb, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((blk, (m + 1) * blk), jnp.float32)],
        interpret=interpret,
    )(qu, qv, k, v, p2, kbias3, do, lse, delta)

    # pass 2: dk, dv (tiled over k-blocks)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, blk=blk, m=m, scale=scale,
                          interpret=interpret),
        grid=(bh, m),
        in_specs=common_specs,
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0)),
        ),
        interpret=interpret,
    )(qu, qv, k, v, p2, kbias3, do, lse, delta)

    # overlap-add the per-q-block dp slabs: slab qb covers p rows
    # [(m-1-qb)*blk, (m-1-qb)*blk + (m+1)*blk) -> (H, 2T, D)
    dp2 = jnp.zeros((h, 2 * t, d), jnp.float32)
    for qb in range(m):
        dp2 = dp2 + jnp.pad(
            slabs[:, qb],
            ((0, 0), ((m - 1 - qb) * blk, qb * blk), (0, 0)),
        )

    dq = dqu + dqv
    du = jnp.sum(dqu.reshape(b, h, t, d), axis=(0, 2))[:, None, :]
    dvb = jnp.sum(dqv.reshape(b, h, t, d), axis=(0, 2))[:, None, :]
    return (dq.astype(q.dtype), du.astype(u2.dtype), dvb.astype(vb2.dtype),
            dk.astype(k.dtype), dv.astype(v.dtype), dp2.astype(p2.dtype),
            dkbias)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def relpos_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    p: jnp.ndarray,
    pos_bias_u: jnp.ndarray,
    pos_bias_v: jnp.ndarray,
    lengths_bias: Optional[jnp.ndarray] = None,
    block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Blocked rel-pos attention.

    q, k, v: (B, H, T, D); p: (H, 2T-1, D) per-head projected position
    embeddings, ordered positive-to-negative relative positions (the
    `rel_positional_table` layout, rel = (T-1) - index);
    pos_bias_u/v: (H, D); lengths_bias: additive key mask broadcastable to
    (B, 1, 1, T) (0 / -inf) or None. Returns (B, H, T, D).
    Matches `RelPositionMultiHeadedAttention` (`attention.py:209`) up to
    flash-style accumulation order.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    if block is None:
        import os

        env_blk = os.environ.get("ESPNET_TPU_RELPOS_BLOCK", "")
        if env_blk:
            block = int(env_blk)
    if block is None:
        # Bigger tiles amortise the per-tile rotate/loop overhead (measured
        # blk 128/256/512 = 17.7/8.8/5.1 ms fwd per 12 layers at T=512), but
        # force more padding when they don't divide ceil(t/128)*128. Cost
        # model: padded_T^2 work x (1 + 256/blk) tile overhead.
        best = None
        for cand in (512, 256, 128):
            tp_c = -(-t // cand) * cand
            score = tp_c * tp_c * (1.0 + 256.0 / cand)
            if best is None or score < best[0]:
                best = (score, cand)
        block = best[1]
    tp = -(-t // block) * block
    m = tp // block

    pad_t = tp - t
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_t), (0, 0)))

    # key-padding bias (B, Tp): -inf on padded/masked keys
    if lengths_bias is None:
        kbias = jnp.zeros((b, t), jnp.float32)
    else:
        kbias = jnp.broadcast_to(
            lengths_bias.astype(jnp.float32).reshape(b, -1, t)[:, -1, :], (b, t)
        )
    kbias = jnp.pad(kbias, ((0, 0), (0, pad_t)), constant_values=NEG)

    # centre-embed p (2t-1 rows, offsets t-1..-(t-1)) into 2*Tp rows so that
    # index (Tp-1) - rel holds offset rel; out-of-range offsets (only ever
    # used by padded/masked pairs) are zeros.
    p2 = jnp.zeros((h, 2 * tp, d), p.dtype)
    p2 = jax.lax.dynamic_update_slice(p2, p.astype(p2.dtype), (0, tp - t, 0))

    q2 = qp.reshape(b * h, tp, d)
    k2 = kp.reshape(b * h, tp, d)
    v2 = vp.reshape(b * h, tp, d)
    o = _flash_core(
        q2, pos_bias_u.astype(jnp.float32)[:, None, :],
        pos_bias_v.astype(jnp.float32)[:, None, :],
        k2, v2, p2, kbias, block, interpret,
    )
    return o.reshape(b, h, tp, d)[:, :, :t, :]


def relpos_attention_reference(q, k, v, p, pos_bias_u, pos_bias_v,
                               lengths_bias=None):
    """Pure-XLA oracle (the round-1 formulation) for parity tests."""
    b, h, t, d = q.shape
    qu = q + pos_bias_u.astype(q.dtype)[None, :, None, :]
    qv = q + pos_bias_v.astype(q.dtype)[None, :, None, :]
    ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
    bd = jnp.einsum("bhqd,hkd->bhqk", qv, p)  # (B,H,T,2T-1)
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    bd = bd.reshape(b, h, 2 * t, t)[:, :, 1:].reshape(b, h, t, 2 * t - 1)
    bd = bd[:, :, :, :t]
    scores = (ac + bd).astype(jnp.float32) / (d ** 0.5)
    if lengths_bias is not None:
        scores = scores + lengths_bias.astype(jnp.float32)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
