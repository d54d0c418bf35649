"""Pluggable scorer interface for the batched label-sync beam search.

Behavioral spec: reference `espnet/nets/scorer_interface.py` (ScorerInterface
`:12`: score(y, state, x) -> (logp, state); BatchScorerInterface `:131`) and
the scorers dict consumed by `espnet/nets/beam_search.py:33` with per-scorer
weights. The TPU search is one compiled program, so a "scorer" here is a
pair of pure functions over fixed-shape caches instead of a stateful object:

  ``init_cache(n, steps) -> cache``   (pytree, every leaf leading dim n)
  ``score_step(tokens (N,), pos, cache) -> (logp (N, V), cache)``

`combine_scorers` folds any number of weighted scorers into the single
"lm slot" of `decode/beam_search.py` — the weighted sum of full scores with
a tuple-of-caches carry, which the search re-gathers per hypothesis like
any other cache. New scorers plug into `Speech2Text(extra_scorers=[...])`
without touching the inference code (the reference's registry role).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class Scorer:
    """One weighted full scorer (ScorerInterface equivalent)."""

    weight: float
    # (n, steps) -> cache pytree with leading dim n
    init_cache: Callable[[int, int], Any]
    # (tokens (N,), pos, cache) -> (logp (N, V), new cache)
    score_step: Callable[[jnp.ndarray, Any, Any], Tuple[jnp.ndarray, Any]]
    name: str = "scorer"


def combine_scorers(
    scorers: Sequence[Scorer], n: int, steps: int
) -> Tuple[Optional[Callable], Any]:
    """Fold scorers into one (score_fn, cache) for the search's lm slot.

    The returned fn computes sum_i w_i * logp_i; its cache is a tuple of
    the member caches. Returns (None, None) when the list is empty.
    """
    live = [s for s in scorers if s.weight != 0.0]
    if not live:
        return None, None
    caches = tuple(s.init_cache(n, steps) for s in live)

    def score_fn(tokens, pos, cache):
        total = 0.0
        new = []
        for s, c in zip(live, cache):
            lp, nc = s.score_step(tokens, pos, c)
            total = total + s.weight * lp
            new.append(nc)
        return total, tuple(new)

    return score_fn, caches


def lm_scorer(lm_model, lm_variables, weight: float) -> Scorer:
    """Neural LM as a scorer (models/lm.py score_step interface)."""

    def init_cache(n, steps):
        return lm_model.apply(lm_variables, n, steps,
                              method=type(lm_model).init_cache)

    def score_step(tokens, pos, cache):
        return lm_model.apply(lm_variables, tokens, pos, cache,
                              method=type(lm_model).score_step)

    return Scorer(weight, init_cache, score_step, name="lm")


def ngram_scorer_adapter(ngram, weight: float) -> Scorer:
    """Dense-FST n-gram (lm/ngram.py) as a scorer."""
    fn = ngram.make_score_fn()

    def init_cache(n, steps):
        return ngram.init_cache(n)

    def score_step(tokens, pos, cache):
        return fn(tokens, pos, cache)

    return Scorer(weight, init_cache, score_step, name="ngram")


def length_bonus_scorer(vocab_size: int, weight: float) -> Scorer:
    """Per-token constant bonus (reference
    `espnet/nets/scorers/length_bonus.py`) — the minimal custom scorer."""

    def init_cache(n, steps):
        return jnp.zeros((n, 1), jnp.float32)  # stateless placeholder

    def score_step(tokens, pos, cache):
        return jnp.ones((tokens.shape[0], vocab_size), jnp.float32), cache

    return Scorer(weight, init_cache, score_step, name="length_bonus")
