"""Pallas TPU kernels for the CTC lattice recursions.

The CTC forward/backward DP in `ops/ctc.py` is a `lax.scan` over ~T
sequential steps whose per-step work is a handful of (B, S) VPU ops —
XLA's loop overhead dwarfs the math (measured 7.6 ms fwd+bwd for
B=32, T=469, S=81 after unrolling; the math itself is ~0.1 ms). These
kernels run the whole lattice inside VMEM: the time loop is a Mosaic
scalar loop over vregs, emissions stream in as (TB, B, S) blocks, and the
(B, S) state never touches HBM.

Layout contract (enforced by the `ops/ctc.py` caller):
* S is padded to the 128-lane boundary with NEG_INF emissions and
  skip_mask=False — lane rolls then never wrap garbage into live lanes;
* T is padded to a multiple of the time block; padded steps are no-ops via
  the `t < input_lengths` freeze that masked math needs anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def _shift_right(x, n, fill=NEG_INF):
    """(B, S) -> x shifted right by n lanes, NEG_INF fill (== _shiftN)."""
    s = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < n, fill, pltpu.roll(x, n, 1))


def _shift_left(x, n, fill=NEG_INF):
    s = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s - n, fill, pltpu.roll(x, s - n, 1))


def _alpha_kernel(emit_ref, skip_ref, len_ref, alphas_ref, last_ref,
                  state, *, tb: int):
    bi = pl.program_id(0)

    @pl.when(bi == 0)
    def _():
        state[...] = jnp.full_like(state[...], NEG_INF)

    skip = skip_ref[...] != 0
    lens = len_ref[...]  # (B, 1) int32

    def step(j, alpha):
        t = bi * tb + j
        emit_t = emit_ref[j]
        a1 = _shift_right(alpha, 1)
        a2 = jnp.where(skip, _shift_right(alpha, 2), NEG_INF)
        upd = _logaddexp3(alpha, a1, a2) + emit_t
        lane = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)
        init = jnp.where(lane < 2, emit_t, NEG_INF)
        new = jnp.where(t == 0, init, upd)
        new = jnp.where(t < lens, new, alpha)
        alphas_ref[j] = new
        return new

    state[...] = jax.lax.fori_loop(0, tb, step, state[...])
    last_ref[...] = state[...]


def _beta_gamma_kernel(emit_ref, skip_fwd_ref, len_ref, term_ref,
                       alphas_ref, gamma_ref, state, *, tb: int,
                       nblocks: int):
    bi = pl.program_id(0)  # 0 = LAST time block (reverse grid)
    blk = nblocks - 1 - bi

    @pl.when(bi == 0)
    def _():
        state[...] = jnp.full_like(state[...], NEG_INF)

    skip_fwd = skip_fwd_ref[...] != 0
    lens = len_ref[...]
    term = term_ref[...]

    def step(jj, beta):
        j = tb - 1 - jj
        t = blk * tb + j
        emit_t = emit_ref[j]
        b1 = _shift_left(beta, 1)
        b2 = jnp.where(skip_fwd, _shift_left(beta, 2), NEG_INF)
        upd = _logaddexp3(beta, b1, b2) + emit_t
        new = jnp.where(t == (lens - 1), term + emit_t, upd)
        new = jnp.where(t >= lens, NEG_INF, new)
        gamma_ref[j] = alphas_ref[j] + new - emit_t
        return new

    state[...] = jax.lax.fori_loop(0, tb, step, state[...])


def _pad_inputs(emit, skip_mask, tb):
    t, b, s = emit.shape
    s_pad = -(-s // 128) * 128
    t_pad = -(-t // tb) * tb
    emit = jnp.pad(emit, ((0, t_pad - t), (0, 0), (0, s_pad - s)),
                   constant_values=NEG_INF)
    skip_mask = jnp.pad(skip_mask, ((0, 0), (0, s_pad - s)))
    return emit, skip_mask, t_pad, s_pad


def ctc_alphas_pallas(emit, skip_mask, input_lengths, tb: int = 128,
                      interpret: bool = False):
    """emit (T, B, S) log emission scores -> (alphas (T, B, S),
    alpha_last (B, S)); alpha_last is the state at each utterance's final
    frame (frames past input_lengths freeze)."""
    t, b, s = emit.shape
    emit_p, skip_p, t_pad, s_pad = _pad_inputs(emit, skip_mask, tb)
    nb = t_pad // tb
    lens = input_lengths.astype(jnp.int32).reshape(b, 1)
    alphas, last = pl.pallas_call(
        functools.partial(_alpha_kernel, tb=tb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, b, s_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((b, s_pad), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, b, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, s_pad), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((tb, b, s_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((b, s_pad), lambda i: (0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((b, s_pad), jnp.float32)],
        interpret=interpret,
    )(emit_p.astype(jnp.float32), skip_p.astype(jnp.int32), lens)
    return alphas[:t, :, :s], last[:, :s]


def ctc_gamma_pallas(emit, skip_mask, input_lengths, label_lengths,
                     alphas, tb: int = 128, interpret: bool = False):
    """Backward recursion fused with the occupancy combine: returns
    gamma (T, B, S) = alpha + beta - emit (log state posteriors, before
    subtracting logZ)."""
    t, b, s = emit.shape
    emit_p, skip_p, t_pad, s_pad = _pad_inputs(emit, skip_mask, tb)
    skip_fwd = jnp.pad(skip_p, ((0, 0), (0, 2)))[:, 2:]
    alphas_p = jnp.pad(
        alphas, ((0, t_pad - t), (0, 0), (0, s_pad - s)),
        constant_values=NEG_INF,
    )
    nb = t_pad // tb
    lens = input_lengths.astype(jnp.int32).reshape(b, 1)
    # terminal distribution: final blank (2U) or final label (2U-1)
    send = 2 * label_lengths.astype(jnp.int32)
    idx = jnp.arange(s_pad)[None, :]
    term = jnp.where(
        (idx == send[:, None])
        | ((idx == jnp.maximum(send - 1, 0)[:, None])
           & (label_lengths > 0)[:, None]),
        0.0, NEG_INF,
    ).astype(jnp.float32)
    gamma = pl.pallas_call(
        functools.partial(_beta_gamma_kernel, tb=tb, nblocks=nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, b, s_pad), lambda i, nb=nb: (nb - 1 - i, 0, 0)),
            pl.BlockSpec((b, s_pad), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
            pl.BlockSpec((b, s_pad), lambda i: (0, 0)),
            pl.BlockSpec((tb, b, s_pad), lambda i, nb=nb: (nb - 1 - i, 0, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((t_pad, b, s_pad), jnp.float32),
        out_specs=pl.BlockSpec(
            (tb, b, s_pad), lambda i, nb=nb: (nb - 1 - i, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((b, s_pad), jnp.float32)],
        interpret=interpret,
    )(emit_p.astype(jnp.float32), skip_fwd.astype(jnp.int32), lens,
      term, alphas_p.astype(jnp.float32))
    return gamma[:t, :, :s]
