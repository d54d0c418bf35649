"""Block-synchronous online (label-sync) beam search.

Behavioral spec: reference `espnet/nets/batch_beam_search_online.py`
(`process_one_block:179`, `extend:294`) driven by
`espnet2/bin/asr_inference_streaming.py:37`: as encoder output grows block
by block, label-synchronous search steps run against the partial memory and
stop conservatively —

* a step whose best-beam candidates contain a *repeated* token (the last
  token already occurs in that hypothesis, Eq. (11) of arXiv:2006.14941) is
  NOT committed and the block ends (`process_one_block:210-216`);
* a step where an alive hypothesis reaches eos is NOT committed either on a
  non-final block (`:229-231` — eos on partial input is unreliable);
* on the final block the search runs to completion exactly like the offline
  search (forced eos at maxlen, finished-pool collection).

CTC prefix-scorer forward variables are extended over newly arrived frames
with the reference's blank-path recursion (`ctc_prefix_extend`,
`ctc_prefix_score.py:244`).

TPU formulation: between blocks the beam lives as the same fixed-shape
`BeamState` the offline search uses; each non-final block runs one jitted
`lax.while_loop` whose body computes the step *speculatively* and keeps the
previous state when a stop condition fires (the reference's
rewind-one-step, `process_one_block:256-259`). The final block reuses the
offline `batched_beam_search` loop body via `run_from_state`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from espnet_tpu.decode.beam_search import (
    NEG_INF, BeamSearchConfig, BeamState, _topk, batched_beam_search,
    score_candidates,
)
from espnet_tpu.decode.ctc_prefix import (
    ctc_prefix_extend, ctc_prefix_init, ctc_prefix_select, pad_log_probs,
)


def init_online_state(
    cfg: BeamSearchConfig,
    sos: int,
    eos: int,
    b: int,
    t_max: int,
    max_steps: int,
    att_cache_init: Any,
    lm_cache_init: Any = None,
    vocab_size: int = 0,
) -> BeamState:
    """Fixed-shape beam state over a T_max-frame CTC buffer, before any
    audio has been seen."""
    w = cfg.beam_size
    l_max = max_steps
    yseq0 = jnp.full((b, w, l_max + 1), eos, jnp.int32).at[:, :, 0].set(sos)
    score0 = jnp.full((b, w), NEG_INF).at[:, 0].set(0.0)
    ctc_state = None
    if cfg.ctc_weight > 0.0:
        zeros = jnp.zeros((b, t_max, vocab_size))
        _, ctc_state = ctc_prefix_init(
            zeros, jnp.zeros((b,), jnp.int32), w, cfg.blank_id
        )
    return BeamState(
        step=jnp.zeros((), jnp.int32),
        yseq=yseq0,
        ylen=jnp.zeros((b, w), jnp.int32),
        score=score0,
        att_cache=att_cache_init,
        lm_cache=lm_cache_init,
        ctc=ctc_state,
        fin_yseq=yseq0,
        fin_ylen=jnp.zeros((b, w), jnp.int32),
        fin_score=jnp.full((b, w), NEG_INF),
    )


def process_block(
    cfg: BeamSearchConfig,
    sos: int,
    eos: int,
    vocab_size: int,
    state: BeamState,
    ctc_log_probs: jnp.ndarray,   # (B, T_max, V) buffer, frames < new_len real
    old_lengths: jnp.ndarray,     # (B,) frames already extended into state
    new_lengths: jnp.ndarray,     # (B,) frames now valid
    att_score_fn: Callable,
    lm_score_fn: Optional[Callable] = None,
    is_final: bool = False,
    max_steps: Optional[int] = None,
) -> Tuple[BeamState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Consume one encoder block. Returns (state, yseq, ylen, score) where
    the hypothesis arrays are the current n-best (finished pool on the final
    block, alive beam otherwise — the reference's intermediate output,
    `assemble_hyps`)."""
    b, w = state.score.shape
    l_max = max_steps
    use_ctc = cfg.ctc_weight > 0.0 and state.ctc is not None

    lp_pad = (
        pad_log_probs(ctc_log_probs, new_lengths, cfg.blank_id)
        if use_ctc else None
    )
    if use_ctc:
        state = state._replace(
            ctc=ctc_prefix_extend(
                state.ctc, lp_pad, old_lengths, new_lengths, cfg.blank_id
            )
        )

    if is_final:
        yseq, ylen, score = batched_beam_search(
            cfg, sos, eos, vocab_size, new_lengths, att_score_fn,
            state.att_cache, ctc_log_probs=ctc_log_probs if use_ctc else None,
            lm_score_fn=lm_score_fn, lm_cache_init=state.lm_cache,
            max_steps=l_max, initial_state=state,
        )
        return state, yseq, ylen, score

    # non-final: run while no stop condition fires. maxlen tracks the
    # partial encoder length (maxlenratio==0 => maxlen = frames so far).
    if cfg.maxlenratio == 0.0:
        maxlen = jnp.minimum(new_lengths, l_max)
    else:
        maxlen = jnp.minimum(
            jnp.maximum((cfg.maxlenratio * new_lengths).astype(jnp.int32), 1),
            l_max,
        )
    minlen = (cfg.minlenratio * new_lengths).astype(jnp.int32)

    def cond(carry):
        s, stopped = carry
        return (~stopped) & (s.step < jnp.max(maxlen))

    def body(carry):
        s, stopped = carry
        cand_ids, cand_scores, att_cache, lm_cache, psi, r_new = (
            score_candidates(cfg, s, eos, vocab_size, att_score_fn,
                             lm_score_fn, lp_pad, new_lengths)
        )
        is_eos = cand_ids == eos
        cand_scores = jnp.where(
            is_eos & (s.step < minlen)[:, None, None], NEG_INF, cand_scores
        )
        dead = (s.step >= maxlen)[:, None, None]
        cand_scores = jnp.where(dead, NEG_INF, cand_scores)

        k = cand_ids.shape[-1]
        flat = cand_scores.reshape(b, w * k)
        top_scores, top_idx = _topk(flat, w)   # the best beam incl. eos
        src_hyp = top_idx // k
        src_cand = top_idx % k
        bi = jnp.arange(b)[:, None]
        top_tok = cand_ids[bi, src_hyp, src_cand]  # (B, W)

        # stop conditions (evaluated on the would-be beam, then the step is
        # discarded — the reference's rewind): any eos, or any repetition
        # of a token already present in the source hypothesis.
        any_eos = jnp.any((top_tok == eos) & (top_scores > NEG_INF / 2))
        src_yseq = s.yseq[bi, src_hyp]  # (B, W, L+1)
        valid_pos = (
            jnp.arange(src_yseq.shape[-1])[None, None, :]
            <= s.ylen[bi, src_hyp][..., None]
        )
        repeated = jnp.any(
            (src_yseq == top_tok[..., None]) & valid_pos, axis=-1
        )  # (B, W)
        any_repeat = jnp.any(repeated & (top_scores > NEG_INF / 2))
        stop = any_eos | any_repeat

        # commit the step (build the new state) ...
        new_ylen = s.ylen[bi, src_hyp] + 1
        new_yseq = jnp.where(
            (jnp.arange(l_max + 1)[None, None, :] == new_ylen[..., None]),
            top_tok[..., None],
            s.yseq[bi, src_hyp],
        )
        flat_src = (jnp.arange(b)[:, None] * w + src_hyp).reshape(b * w)
        new_att = jax.tree_util.tree_map(lambda c: c[flat_src], att_cache)
        new_lm = (
            jax.tree_util.tree_map(lambda c: c[flat_src], lm_cache)
            if (lm_score_fn is not None and cfg.lm_weight > 0) else lm_cache
        )
        new_ctc = (
            ctc_prefix_select(s.ctc, r_new, psi, cand_ids, src_hyp, src_cand)
            if use_ctc else s.ctc
        )
        committed = BeamState(
            step=s.step + 1,
            yseq=new_yseq,
            ylen=new_ylen,
            score=top_scores,
            att_cache=new_att,
            lm_cache=new_lm,
            ctc=new_ctc,
            fin_yseq=s.fin_yseq,
            fin_ylen=s.fin_ylen,
            fin_score=s.fin_score,
        )
        # ... but keep the previous state when a stop fired
        out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(stop, old, new), committed, s
        )
        return out, stop

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.zeros((), bool)))
    # intermediate output: current alive beam, best first (already sorted)
    return state, state.yseq[:, :, 1:], state.ylen, state.score
