"""Batched label-synchronous beam search as a `lax.while_loop` program.

Behavioral spec: reference `espnet/nets/beam_search.py:30` /
`batch_beam_search.py:26` semantics —

* per step, full scorers (attention decoder, LM, length bonus) score every
  vocab entry; a pre-beam top-K (`pre_beam_ratio`*beam, key "full",
  beam_search.py:96,309-315) restricts the CTC partial scorer;
* candidates outside the pre-beam are masked to -inf (`beam():209`),
  CTC contributes telescoping prefix-score deltas (`scorers/ctc.py:80`);
* hypotheses selecting eos retire to the finished set (`post_process:434`);
  at maxlen-1 eos is forced (`:462`); maxlen = maxlenratio==0 ? T :
  ratio*T, minlen = minlenratio*T (`forward:346`).

TPU formulation: the dynamic hypothesis list becomes fixed-shape state
(alive beam W + finished pool W) carried through `lax.while_loop`; retired
slots hold -inf scores. Decoder/LM incremental states are explicit KV-cache
pytrees; the whole search jit-compiles once per (T, maxlen) bucket and runs
for a *batch* of utterances at once (the reference decodes one utterance
per process; here B utterances x W hyps ride the MXU together).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.ctc_prefix import (
    CTCPrefixState, ctc_prefix_init, ctc_prefix_score, ctc_prefix_select,
)

NEG_INF = -1.0e30


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 10
    pre_beam_ratio: float = 1.5
    att_weight: float = 0.7
    ctc_weight: float = 0.3
    lm_weight: float = 0.0
    penalty: float = 0.0          # length bonus per emitted token
    maxlenratio: float = 0.0      # 0 => maxlen = encoder length
    minlenratio: float = 0.0
    blank_id: int = 0

    @property
    def pre_beam_size(self) -> int:
        return int(self.pre_beam_ratio * self.beam_size)


class BeamState(NamedTuple):
    step: jnp.ndarray            # scalar int32
    yseq: jnp.ndarray            # (B, W, L) alive token seqs (incl. sos)
    ylen: jnp.ndarray            # (B, W)
    score: jnp.ndarray           # (B, W) alive total scores
    att_cache: Any               # decoder KV caches, leading dim B*W
    lm_cache: Any
    ctc: Optional[CTCPrefixState]
    fin_yseq: jnp.ndarray        # (B, W, L) finished
    fin_ylen: jnp.ndarray
    fin_score: jnp.ndarray       # (B, W)


class Hypothesis(NamedTuple):
    yseq: List[int]   # without sos/eos
    score: float


def _topk(x, k):
    """top_k padded with NEG_INF when fewer than k candidates exist (the
    beam_size=1 greedy case: the per-hyp candidate pool is W*W = 1 but the
    eos-retirement logic wants 2W slots)."""
    avail = x.shape[-1]
    if avail >= k:
        return jax.lax.top_k(x, k)
    sc, ix = jax.lax.top_k(x, avail)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, k - avail)]
    return (jnp.pad(sc, pad, constant_values=NEG_INF),
            jnp.pad(ix, pad))



def score_candidates(
    cfg: BeamSearchConfig,
    s: BeamState,
    eos: int,
    vocab_size: int,
    att_score_fn: Callable,
    lm_score_fn: Optional[Callable],
    lp_pad: Optional[jnp.ndarray],
    enc_lengths: jnp.ndarray,
):
    """One step of candidate generation shared by the offline and the
    block-synchronous online searches: full-scorer pass, pre-beam top-K
    (eos kept selectable), CTC prefix delta scoring. Returns
    (cand_ids (B,W,K), cand_scores (B,W,K) cumulative, att_cache, lm_cache,
    psi, r_new)."""
    b, w = s.score.shape
    # floor of 2: the eos-selectability rule below claims one slot, so a
    # beam_size=1 greedy search still needs room for the actual argmax
    k = min(max(cfg.pre_beam_size, 2), vocab_size)
    use_ctc = cfg.ctc_weight > 0.0 and lp_pad is not None
    i = s.step
    last_tok = jnp.take_along_axis(
        s.yseq, s.ylen[..., None], axis=2
    )[..., 0]  # (B, W) token at position ylen (sos at start)
    flat_tok = last_tok.reshape(b * w)

    logp_att, att_cache = att_score_fn(flat_tok, i, s.att_cache)
    logp_att = logp_att.reshape(b, w, vocab_size)
    weighted = cfg.att_weight * logp_att + cfg.penalty
    if lm_score_fn is not None and cfg.lm_weight > 0:
        logp_lm, lm_cache = lm_score_fn(flat_tok, i, s.lm_cache)
        weighted = weighted + cfg.lm_weight * logp_lm.reshape(b, w, vocab_size)
    else:
        lm_cache = s.lm_cache

    # pre-beam on the full-scorer sum (pre_beam_score_key="full")
    _, cand_ids = _topk(weighted, k)  # (B, W, K)
    # eos must always be a candidate: the reference's full scorers cover the
    # whole vocab every step and the forced finish at maxlen needs it
    # selectable. Put it in the last pre-beam slot unless already present.
    has_eos = jnp.any(cand_ids == eos, axis=-1)
    cand_ids = cand_ids.at[..., -1].set(
        jnp.where(has_eos, cand_ids[..., -1], eos)
    )
    if use_ctc:
        psi, r_new, psi_eos = ctc_prefix_score(
            s.ctc, lp_pad, enc_lengths, cand_ids, cfg.blank_id
        )
        ctc_delta = psi - s.ctc.psi[..., None]
        # eos candidate scores use the complete-sequence probability
        eos_delta = psi_eos - s.ctc.psi
        ctc_delta = jnp.where(
            cand_ids == eos, eos_delta[..., None], ctc_delta
        )
        cand_scores = (
            jnp.take_along_axis(weighted, cand_ids, axis=2)
            + cfg.ctc_weight * ctc_delta
        )
    else:
        cand_scores = jnp.take_along_axis(weighted, cand_ids, axis=2)
        psi = r_new = None
    cand_scores = cand_scores + s.score[..., None]  # (B, W, K)
    return cand_ids, cand_scores, att_cache, lm_cache, psi, r_new


def batched_beam_search(
    cfg: BeamSearchConfig,
    sos: int,
    eos: int,
    vocab_size: int,
    enc_lengths: jnp.ndarray,                    # (B,) encoder frame counts
    att_score_fn: Callable,                      # (tokens (N,), pos, cache) -> (logp (N,V), cache)
    att_cache_init: Any,                         # caches with leading dim N=B*W
    ctc_log_probs: Optional[jnp.ndarray] = None, # (B, T, V)
    lm_score_fn: Optional[Callable] = None,
    lm_cache_init: Any = None,
    max_steps: Optional[int] = None,             # static bound L (padded maxlen)
    initial_state: Optional[BeamState] = None,   # resume (online search)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the search. Returns (yseq (B, W, L+1), ylen (B, W), score (B, W))
    of the finished pool sorted by score (yseq[:, 0] is the 1-best), tokens
    exclude sos, include the final eos position in ylen accounting? No:
    ylen counts emitted tokens *excluding* sos and eos.
    """
    b = enc_lengths.shape[0]
    w = cfg.beam_size
    k = min(max(cfg.pre_beam_size, 2), vocab_size)  # 2: see score_candidates
    if max_steps is None:
        raise ValueError("max_steps (static bound) is required under jit")
    l_max = max_steps
    use_ctc = cfg.ctc_weight > 0.0 and ctc_log_probs is not None

    # per-utterance dynamic maxlen/minlen (reference forward():346)
    if cfg.maxlenratio == 0.0:
        maxlen = jnp.minimum(enc_lengths, l_max)
    else:
        maxlen = jnp.minimum(
            jnp.maximum((cfg.maxlenratio * enc_lengths).astype(jnp.int32), 1),
            l_max,
        )
    minlen = (cfg.minlenratio * enc_lengths).astype(jnp.int32)

    yseq0 = jnp.full((b, w, l_max + 1), eos, jnp.int32).at[:, :, 0].set(sos)
    score0 = jnp.full((b, w), NEG_INF).at[:, 0].set(0.0)
    if use_ctc:
        lp_pad, ctc_state = ctc_prefix_init(
            ctc_log_probs, enc_lengths, w, cfg.blank_id
        )
    else:
        lp_pad, ctc_state = None, None

    if initial_state is not None:
        # resume from a block-synchronous online search: keep its beam and
        # scorer states, only refresh the padded log-prob table
        state = initial_state
    else:
        state = BeamState(
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

    def cond(s: BeamState):
        running = s.step < jnp.max(maxlen)
        # prune: an alive hyp can only decrease (log-prob increments +
        # penalty); once the best alive is below the worst finished AND the
        # finished pool is full, nothing can improve. With penalty > 0 this
        # bound is void, so also keep a hard step limit.
        best_alive = jnp.max(s.score, axis=1)
        worst_fin = jnp.min(s.fin_score, axis=1)
        improvable = (best_alive + 1e-6 > worst_fin) | (worst_fin <= NEG_INF / 2)
        if cfg.penalty > 0:
            improvable = jnp.ones_like(improvable)
        return running & jnp.any(improvable)

    def body(s: BeamState):
        i = s.step
        cand_ids, cand_scores, att_cache, lm_cache, psi, r_new = (
            score_candidates(cfg, s, eos, vocab_size, att_score_fn,
                             lm_score_fn, lp_pad, enc_lengths)
        )
        new_ctc = s.ctc

        # forbid eos before minlen; force eos at the per-utt last step
        is_eos = cand_ids == eos
        cand_scores = jnp.where(
            is_eos & (i < minlen)[:, None, None], NEG_INF, cand_scores
        )
        force = (i == maxlen - 1)[:, None, None]
        cand_scores = jnp.where(force & ~is_eos, NEG_INF, cand_scores)
        # past this utterance's maxlen: freeze (nothing selectable)
        dead = (i >= maxlen)[:, None, None]
        cand_scores = jnp.where(dead, NEG_INF, cand_scores)

        flat = cand_scores.reshape(b, w * k)
        # take 2W so that eos-retirements don't starve the alive beam
        top_scores, top_idx = _topk(flat, 2 * w)  # (B, 2W)
        src_hyp = top_idx // k
        src_cand = top_idx % k
        bi = jnp.arange(b)[:, None]
        top_tok = cand_ids[bi, src_hyp, src_cand]  # (B, 2W)
        top_is_eos = top_tok == eos

        # ---- finished pool update: eos candidates merge into fin_* ----
        # reference semantics (`beam_search.py:434` post_process): only
        # hypotheses SELECTED into the top-W retire on eos — the extra W
        # window below exists purely so the alive beam refills after
        # retirements, so eos candidates ranked past W must not finish
        # (at beam_size=1 a rank-2 eos would otherwise pollute the pool)
        in_top_w = jnp.arange(2 * w)[None, :] < w
        eos_scores = jnp.where(top_is_eos & in_top_w, top_scores, NEG_INF)
        cand_yseq = s.yseq[bi, src_hyp]  # (B, 2W, L+1) (eos stays pad)
        cand_ylen = s.ylen[bi, src_hyp]
        all_fin_scores = jnp.concatenate([s.fin_score, eos_scores], axis=1)
        all_fin_yseq = jnp.concatenate([s.fin_yseq, cand_yseq], axis=1)
        all_fin_ylen = jnp.concatenate([s.fin_ylen, cand_ylen], axis=1)
        fin_top, fin_idx = _topk(all_fin_scores, w)
        fin_yseq = all_fin_yseq[bi, fin_idx]
        fin_ylen = all_fin_ylen[bi, fin_idx]

        # ---- alive beam update: best W non-eos candidates ----
        alive_scores = jnp.where(top_is_eos, NEG_INF, top_scores)
        alive_top, alive_idx = _topk(alive_scores, w)  # (B, W)
        a_hyp = src_hyp[bi, alive_idx]
        a_cand = src_cand[bi, alive_idx]
        a_tok = top_tok[bi, alive_idx]
        new_yseq = s.yseq[bi, a_hyp]
        new_ylen = s.ylen[bi, a_hyp] + 1
        new_yseq = jnp.where(
            (jnp.arange(l_max + 1)[None, None, :] == new_ylen[..., None]),
            a_tok[..., None],
            new_yseq,
        )

        # gather scorer caches by source hyp (flattened B*W indexing)
        flat_src = (jnp.arange(b)[:, None] * w + a_hyp).reshape(b * w)
        att_cache = jax.tree_util.tree_map(
            lambda c: c[flat_src], att_cache
        )
        if lm_score_fn is not None and cfg.lm_weight > 0:
            lm_cache = jax.tree_util.tree_map(lambda c: c[flat_src], lm_cache)
        if use_ctc:
            new_ctc = ctc_prefix_select(s.ctc, r_new, psi, cand_ids, a_hyp, a_cand)

        return BeamState(
            step=i + 1,
            yseq=new_yseq,
            ylen=new_ylen,
            score=alive_top,
            att_cache=att_cache,
            lm_cache=lm_cache,
            ctc=new_ctc,
            fin_yseq=fin_yseq,
            fin_ylen=fin_ylen,
            fin_score=fin_top,
        )

    final = jax.lax.while_loop(cond, body, state)
    # yseq rows contain [sos, tokens...]; strip sos for output
    return final.fin_yseq[:, :, 1:], final.fin_ylen, final.fin_score


def beam_search_numpy_reference(
    cfg: BeamSearchConfig,
    sos: int,
    eos: int,
    logp_att_fn,      # fn(prefix list[int]) -> np (V,) log-probs
    enc_length: int,
    ctc_log_probs: Optional[np.ndarray] = None,  # (T, V)
    max_steps: int = 20,
) -> List[Hypothesis]:
    """Slow, dynamic python beam search with the same semantics — the
    equivalence oracle for tests (reference tests do the same:
    `test/test_batch_beam_search.py`). No LM, full-vocab CTC scoring.
    """
    from espnet_tpu.decode.ctc_prefix import (
        ctc_prefix_init as cinit, ctc_prefix_score as cscore,
        ctc_prefix_select as csel,
    )
    import jax.numpy as jnp

    use_ctc = cfg.ctc_weight > 0 and ctc_log_probs is not None
    maxlen = min(enc_length if cfg.maxlenratio == 0.0 else
                 max(1, int(cfg.maxlenratio * enc_length)), max_steps)
    minlen = int(cfg.minlenratio * enc_length)
    v = None
    if use_ctc:
        lp_pad, cstate0 = cinit(
            jnp.asarray(ctc_log_probs[None]), jnp.asarray([enc_length]), 1,
            cfg.blank_id,
        )
        v = ctc_log_probs.shape[1]

    # hypothesis: (prefix tuple, score, ctc_state or None)
    hyps = [((), 0.0, cstate0 if use_ctc else None)]
    ended: List[Hypothesis] = []
    for i in range(maxlen):
        cands = []
        for prefix, score, cst in hyps:
            logp = np.asarray(logp_att_fn([sos, *prefix]))
            if v is None:
                v = logp.shape[0]
            weighted = cfg.att_weight * logp + cfg.penalty
            k = min(max(cfg.pre_beam_size, 2), v)
            ids = np.argpartition(-weighted, k - 1)[:k]
            if use_ctc:
                cand = jnp.asarray(ids[None, None, :])
                psi, r_new, psi_eos = cscore(
                    cst, lp_pad, jnp.asarray([enc_length]), cand, cfg.blank_id
                )
                delta = np.asarray(psi[0, 0]) - float(cst.psi[0, 0])
                eos_delta = float(psi_eos[0, 0]) - float(cst.psi[0, 0])
                for kk, c in enumerate(ids):
                    d = eos_delta if c == eos else delta[kk]
                    total = score + weighted[c] + cfg.ctc_weight * d
                    nst = (
                        csel(cst, r_new, psi, cand,
                             jnp.asarray([[0]]), jnp.asarray([[kk]]))
                        if c != eos else None
                    )
                    cands.append((prefix + (int(c),), float(total), nst))
            else:
                for c in ids:
                    cands.append(
                        (prefix + (int(c),), float(score + weighted[c]), None)
                    )
        cands.sort(key=lambda x: -x[1])
        new_hyps = []
        for prefix, score, nst in cands:
            if len(new_hyps) >= cfg.beam_size:
                break
            if prefix[-1] == eos:
                if len(prefix) - 1 >= 0 and i >= minlen:
                    ended.append(Hypothesis(list(prefix[:-1]), score))
            else:
                new_hyps.append((prefix, score, nst))
        hyps = new_hyps
        if not hyps:
            break
    if i == maxlen - 1:
        # force-eos semantics for still-running hyps: drop (the fixed-shape
        # version scores them with ctc eos delta; tests use converged cases)
        pass
    ended.sort(key=lambda h: -h.score)
    return ended
