"""Batched CTC prefix scoring for label-synchronous beam search.

Behavioral spec: reference `espnet/nets/ctc_prefix_score.py` (`CTCPrefixScore`
/ batched `CTCPrefixScoreTH:11`, Watanabe et al. Algorithm 2): for a prefix
g with forward variables r^n/r^b over time, score every candidate extension
c via

    phi_t        = r_t^b(g) + (c != last(g) ? r_t^n(g) : 0)        [log add]
    r_t^n(g.c)   = p_t(c) * (r_{t-1}^n(g.c) + phi_{t-1})
    r_t^b(g.c)   = p_t(blank) * (r_{t-1}^b(g.c) + r_{t-1}^n(g.c))
    psi(g.c)     = sum_t phi_{t-1} * p_t(c)        (prefix probability)
    psi(g.eos)   = r_T^n(g) + r_T^b(g)             (complete-seq probability)

TPU formulation: one `lax.scan` over time computing all (B, W, K) candidate
scores at once (K = pre-beam width), carrying (r_n, r_b, psi) — pure VPU
work with static shapes, the decode-side hot kernel (SURVEY §3.3).

Frames beyond each utterance length are padded with p(blank)=1, p(c)=0 so
they contribute nothing to psi; the eos score gathers r at t = len-1.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


class CTCPrefixState(NamedTuple):
    r: jnp.ndarray     # (B, W, T, 2) log r^n (idx 0), r^b (idx 1) of prefix g
    psi: jnp.ndarray   # (B, W) prefix score of g (0 for empty prefix)
    last: jnp.ndarray  # (B, W) last token of g; -1 for empty


def pad_log_probs(log_probs: jnp.ndarray, lengths: jnp.ndarray,
                  blank_id: int = 0) -> jnp.ndarray:
    """Set frames >= length to one-hot blank in log space."""
    b, t, v = log_probs.shape
    valid = (jnp.arange(t)[None, :] < lengths[:, None])[:, :, None]
    blank_row = jnp.full((v,), NEG_INF).at[blank_id].set(0.0)
    return jnp.where(valid, log_probs, blank_row[None, None, :])


def ctc_prefix_init(
    log_probs: jnp.ndarray, lengths: jnp.ndarray, beam: int, blank_id: int = 0
) -> Tuple[jnp.ndarray, CTCPrefixState]:
    """Returns (padded log_probs, state for W copies of the empty prefix)."""
    lp = pad_log_probs(log_probs, lengths, blank_id)
    b, t, v = lp.shape
    r_b = jnp.cumsum(lp[:, :, blank_id], axis=1)  # (B, T)
    r_n = jnp.full((b, t), NEG_INF)
    r = jnp.stack([r_n, r_b], axis=-1)[:, None].repeat(beam, axis=1)
    return lp, CTCPrefixState(
        r=r,
        psi=jnp.zeros((b, beam)),
        last=jnp.full((b, beam), -1, jnp.int32),
    )


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def ctc_prefix_score(
    state: CTCPrefixState,
    log_probs: jnp.ndarray,   # (B, T, V) *padded* (pad_log_probs)
    lengths: jnp.ndarray,     # (B,)
    cand_ids: jnp.ndarray,    # (B, W, K) candidate extensions
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Score candidate extensions.

    Returns (psi (B, W, K) prefix scores of g.c,
             r_new (B, W, K, T, 2) forward variables of g.c,
             psi_eos (B, W) complete-sequence score of g).
    """
    b, t, v = log_probs.shape
    _, w, k = cand_ids.shape

    # emission log-probs of each candidate at each time: (T, B, W, K)
    emit = jnp.take_along_axis(
        log_probs[:, :, None, :].repeat(w, 2),
        cand_ids[:, None, :, :].repeat(t, 1),
        axis=-1,
    )  # (B, T, W, K)
    emit = emit.transpose(1, 0, 2, 3)  # (T, B, W, K)
    blank = log_probs[:, :, blank_id].transpose(1, 0)  # (T, B)

    # phi over time from g's stored r: (T, B, W)
    r_g = state.r.transpose(2, 0, 1, 3)  # (T, B, W, 2)
    same = cand_ids == state.last[:, :, None]  # (B, W, K)
    # phi_t per candidate: r_b + (same ? 0 : r_n)   (T, B, W, K)
    phi = jnp.where(
        same[None],
        r_g[..., 1:2],
        _logaddexp(r_g[..., 1:2], r_g[..., 0:1]),
    )

    def step(carry, inputs):
        r_n_prev, r_b_prev, psi_acc, phi_prev = carry
        emit_t, blank_t, phi_t = inputs
        r_n = emit_t + _logaddexp(r_n_prev, phi_prev)
        r_b = blank_t[:, None, None] + _logaddexp(r_b_prev, r_n_prev)
        psi_acc = _logaddexp(psi_acc, phi_prev + emit_t)
        return (r_n, r_b, psi_acc, phi_t), (r_n, r_b)

    init_rn = jnp.full((b, w, k), NEG_INF)
    init_rb = jnp.full((b, w, k), NEG_INF)
    init_psi = jnp.full((b, w, k), NEG_INF)
    # phi_{-1}: 1 for the empty prefix (first extension starts anywhere),
    # -inf otherwise (an extension of a non-empty prefix can't start before
    # the prefix itself was emitted).
    phi_init = jnp.where(
        (state.last == -1)[:, :, None], 0.0, NEG_INF
    ) * jnp.ones((b, w, k))
    (_, _, psi, _), (rn_all, rb_all) = jax.lax.scan(
        step, (init_rn, init_rb, init_psi, phi_init), (emit, blank, phi)
    )
    r_new = jnp.stack([rn_all, rb_all], axis=-1).transpose(1, 2, 3, 0, 4)
    # (B, W, K, T, 2)

    # eos: complete-sequence score of g at t = len-1
    r_at_end = jnp.take_along_axis(
        state.r, (lengths - 1)[:, None, None, None].repeat(w, 1), axis=2
    )[:, :, 0]  # (B, W, 2)
    psi_eos = _logaddexp(r_at_end[..., 0], r_at_end[..., 1])
    return psi, r_new, psi_eos


def ctc_prefix_select(
    state: CTCPrefixState,
    r_new: jnp.ndarray,      # (B, W, K, T, 2)
    psi: jnp.ndarray,        # (B, W, K)
    cand_ids: jnp.ndarray,   # (B, W, K)
    src_hyp: jnp.ndarray,    # (B, W') selected source hyp index in [0, W)
    src_cand: jnp.ndarray,   # (B, W') selected candidate slot in [0, K)
) -> CTCPrefixState:
    """Gather the new state for the selected (hyp, candidate) pairs."""
    b = r_new.shape[0]
    bi = jnp.arange(b)[:, None]
    return CTCPrefixState(
        r=r_new[bi, src_hyp, src_cand],
        psi=psi[bi, src_hyp, src_cand],
        last=cand_ids[bi, src_hyp, src_cand],
    )


def ctc_prefix_extend(
    state: CTCPrefixState,
    log_probs: jnp.ndarray,    # (B, T, V) padded buffer incl. the new frames
    old_lengths: jnp.ndarray,  # (B,) frames the stored r was computed with
    new_lengths: jnp.ndarray,  # (B,) frames now available
    blank_id: int = 0,
) -> CTCPrefixState:
    """Extend stored forward variables over newly arrived frames.

    Behavioral spec: `espnet/nets/ctc_prefix_score.py:244` (extend_state):
    for t in [old, new) the blank path continues with the *real* blank
    posteriors (r^b_t = p_t(blank) + logaddexp(r^b_{t-1}, r^n_{t-1})) while
    r^n stays -inf — the same approximation the reference makes (the last
    label of the prefix is not re-emitted inside the extension region).
    """
    b, w, t, _ = state.r.shape
    blank = log_probs[:, :, blank_id]  # (B, T)

    def step(carry, inputs):
        prev_rn, prev_rb = carry       # (B, W)
        r_t, blank_t, t_idx = inputs   # (B, W, 2), (B,), scalar
        ext = ((t_idx >= old_lengths) & (t_idx < new_lengths))[:, None]
        rb = jnp.where(
            ext, blank_t[:, None] + _logaddexp(prev_rb, prev_rn), r_t[..., 1]
        )
        rn = jnp.where(ext, NEG_INF, r_t[..., 0])
        return (rn, rb), jnp.stack([rn, rb], axis=-1)

    r_time = state.r.transpose(2, 0, 1, 3)  # (T, B, W, 2)
    init = (jnp.full((b, w), NEG_INF), jnp.full((b, w), NEG_INF))
    _, r_new = jax.lax.scan(
        step, init, (r_time, blank.transpose(1, 0), jnp.arange(t))
    )
    return CTCPrefixState(
        r=r_new.transpose(1, 2, 0, 3), psi=state.psi, last=state.last
    )
