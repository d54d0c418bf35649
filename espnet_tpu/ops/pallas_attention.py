"""Pallas TPU flash-attention kernel for the self-attention hot path.

Replaces the materialised (B, H, T, T) score tensor of
`espnet/nets/pytorch_backend/transformer/attention.py:15` with a blocked
online-softmax kernel: Q tiles stay resident in VMEM while K/V tiles
stream through, so HBM traffic is O(T*D) instead of O(T^2) and the two
matmuls run back-to-back on the MXU. The key-padding mask rides along as
a (B, T) vector sliced per K-block — never expanded to T^2.

Forward = Pallas kernel (grid = (batch*head, q-block), K/V blocks iterated
innermost with running max/denominator); backward = exact recompute
through the pure-XLA reference path via `jax.custom_vjp` — the standard
flash-attention trade (recompute instead of storing T^2 activations), and
gradients are bit-identical to the reference math.

Biases that vary along the query axis (e.g. causal or relative-position)
fall back to the XLA path — on this hardware XLA's fusion is already
near-optimal for the moderate T of subsampled speech; the Pallas win is
for long sequences where the T^2 intermediates stop fitting.

On CPU (tests) the kernel runs in interpreter mode automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = float(jnp.finfo(jnp.float32).min)


def _reference_attention(q, k, v, bias):
    # q,k,v: (B, H, T, D); bias: (B, 1|H, 1|T, T) additive or None
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    scores = scores / (q.shape[-1] ** 0.5)
    if bias is not None:
        scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int,
                  sm_scale: float, num_heads: int):
    # q_ref: (Bq, D); k_ref/v_ref: (Tk, D); bias_ref: (B, Tk) key-padding
    q = q_ref[:].astype(jnp.float32) * sm_scale
    t = k_ref.shape[0]
    nblk = t // block_k
    bq, d = q.shape
    batch_row = pl.program_id(0) // num_heads

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bq, block_k)
        s = s + bias_ref[batch_row, pl.ds(i * block_k, block_k)][None, :]
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq,), _NEG, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, _, l_fin = jax.lax.fori_loop(0, nblk, body, (acc, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l_fin, 1e-30)[:, None]).astype(
        o_ref.dtype
    )


def _key_padding_bias(bias, b, t):
    """Accepts None or an additive bias broadcastable to (B, ?, 1, T)
    that does NOT vary along the query axis; returns (B, T) or None if
    the bias is query-dependent."""
    if bias is None:
        return jnp.zeros((b, t), jnp.float32)
    if bias.ndim != 4 or bias.shape[2] != 1:
        return None
    # collapse the head axis (must be constant across heads to qualify)
    if bias.shape[1] != 1:
        return None
    return bias[:, 0, 0, :].astype(jnp.float32)


def _flash_forward(q, k, v, bias_vec, block_q: int, block_k: int,
                   interpret: bool):
    b, h, t, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    tq = -(-t // block_q) * block_q
    tk = -(-t // block_k) * block_k
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, tq - t), (0, 0))).reshape(
        b * h, tq, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, tk - t), (0, 0))).reshape(
        b * h, tk, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, tk - t), (0, 0))).reshape(
        b * h, tk, d)
    bias_pad = jnp.pad(bias_vec, ((0, 0), (0, tk - t)),
                       constant_values=_NEG)  # (B, Tk)

    grid = (b * h, tq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k,
                          sm_scale=sm_scale, num_heads=h),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, tk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, tk, d), lambda i, j: (i, 0, 0)),
            # the (B, Tk) padding-bias rides whole in VMEM (tiny)
            pl.BlockSpec((b, tk), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf, bias_pad)
    return out.reshape(b, h, tq, d)[:, :, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, bias=None, block_q: int = 256,
                    block_k: int = 512, interpret: Optional[bool] = None):
    """Blocked online-softmax attention. q,k,v (B, H, T, D); additive
    bias broadcastable to (B, 1, 1, T) (key-padding). Query-dependent
    biases fall back to the XLA reference. Returns (B, H, T, D)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bias_vec = _key_padding_bias(bias, q.shape[0], k.shape[2])
    if bias_vec is None:
        return _reference_attention(q, k, v, bias)
    return _flash_forward(q, k, v, bias_vec, block_q, block_k, interpret)


def _fwd(q, k, v, bias, block_q, block_k, interpret):
    out = flash_attention(q, k, v, bias, block_q, block_k, interpret)
    return out, (q, k, v, bias)


def _bwd(block_q, block_k, interpret, res, g):
    q, k, v, bias = res
    # exact-math recompute through the reference path (standard
    # flash-attention backward trade: no T^2 residuals stored)
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    dbias = None
    if bias is not None:
        _, vjp_b = jax.vjp(
            lambda b_: _reference_attention(q, k, v, b_), bias
        )
        (dbias,) = vjp_b(g)
    return dq, dk, dv, dbias


flash_attention.defvjp(_fwd, _bwd)
