"""Time-synchronous CTC prefix beam search vs exhaustive enumeration.

Reference analogue: `test/test_beam_search_timesync.py`.
"""

import itertools
import math

import numpy as np


def _brute_force_best(log_probs, blank=0):
    """Enumerate ALL label sequences and sum path probabilities exactly."""
    t, v = log_probs.shape

    def collapse(path):
        out = []
        prev = None
        for s in path:
            if s != blank and s != prev:
                out.append(s)
            prev = s
        return tuple(out)

    totals = {}
    for path in itertools.product(range(v), repeat=t):
        lp = sum(log_probs[i, s] for i, s in enumerate(path))
        key = collapse(path)
        totals[key] = np.logaddexp(totals.get(key, -np.inf), lp)
    return max(totals.items(), key=lambda kv: kv[1])


def test_prefix_beam_search_matches_bruteforce():
    from espnet_tpu.decode.timesync import ctc_prefix_beam_search

    rng = np.random.RandomState(0)
    for seed in range(3):
        rng = np.random.RandomState(seed)
        t, v = 5, 4
        logits = rng.randn(t, v) * 2.0
        log_probs = logits - np.log(
            np.sum(np.exp(logits), axis=1, keepdims=True)
        )
        want_prefix, want_score = _brute_force_best(log_probs)
        got = ctc_prefix_beam_search(log_probs, beam_size=16)
        got_prefix, got_score = got[0]
        assert got_prefix == want_prefix, (seed, got_prefix, want_prefix)
        np.testing.assert_allclose(got_score, want_score, rtol=1e-6)


def test_prefix_beam_search_greedy_consistency():
    """On a sharply peaked distribution the search must return the
    collapsed argmax path."""
    from espnet_tpu.decode.timesync import ctc_prefix_beam_search

    t, v = 8, 5
    path = [1, 1, 0, 2, 2, 0, 3, 3]
    log_probs = np.full((t, v), -10.0)
    for i, s in enumerate(path):
        log_probs[i, s] = 0.0
    best, _ = ctc_prefix_beam_search(log_probs, beam_size=4)[0]
    assert best == (1, 2, 3)
