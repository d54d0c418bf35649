"""CTC prefix scorer correctness.

Cross-checks against brute-force enumeration: psi(g.c) must equal the sum of
probabilities of all alignments whose collapsed prefix is exactly g.c (with
the alignment's last frame emitting c), and psi_eos(g) must equal the full
CTC sequence probability of g — the same quantity our ctc_loss computes.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.decode.ctc_prefix import (
    CTCPrefixState, ctc_prefix_init, ctc_prefix_score, ctc_prefix_select,
)
from espnet_tpu.ops.ctc import ctc_loss_from_log_probs


def _collapse(path, blank=0):
    out = []
    prev = -1
    for p in path:
        if p != prev and p != blank:
            out.append(p)
        prev = p
    return tuple(out)


def _brute_prefix_prob(logp, prefix):
    """sum over t of P(paths of length t+1 whose collapse == prefix and
    path[t] == prefix[-1]) — the prefix probability psi."""
    t_max, v = logp.shape
    p = np.exp(logp)
    total = 0.0
    for t in range(1, t_max + 1):
        for path in itertools.product(range(v), repeat=t):
            if path[-1] != prefix[-1]:
                continue
            # last frame must be the first emission of the final token
            if t >= 2 and path[-2] == path[-1]:
                continue
            if _collapse(path) == tuple(prefix):
                total += np.prod([p[i, c] for i, c in enumerate(path)])
    return total


def _brute_full_prob(logp, seq):
    t_max, v = logp.shape
    p = np.exp(logp)
    total = 0.0
    for path in itertools.product(range(v), repeat=t_max):
        if _collapse(path) == tuple(seq):
            total += np.prod([p[i, c] for i, c in enumerate(path)])
    return total


@pytest.fixture
def small_logp():
    rng = np.random.RandomState(0)
    t, v = 4, 3  # tiny so brute force is feasible
    logits = rng.randn(1, t, v).astype(np.float32)
    return np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))


def test_first_extension_matches_brute_force(small_logp):
    logp = small_logp
    t = logp.shape[1]
    lens = jnp.asarray([t])
    lp_pad, state = ctc_prefix_init(jnp.asarray(logp), lens, beam=1)
    cand = jnp.asarray([[[1, 2]]])  # (B=1, W=1, K=2)
    psi, r_new, psi_eos = ctc_prefix_score(state, lp_pad, lens, cand)
    for ki, c in enumerate([1, 2]):
        ref = np.log(_brute_prefix_prob(logp[0], (c,)))
        np.testing.assert_allclose(float(psi[0, 0, ki]), ref, atol=1e-4)
    # empty-prefix eos score == P(empty) = all-blank path
    ref_empty = np.log(np.prod(np.exp(logp[0, :, 0])))
    np.testing.assert_allclose(float(psi_eos[0, 0]), ref_empty, atol=1e-4)


def test_second_extension_matches_brute_force(small_logp):
    logp = small_logp
    t = logp.shape[1]
    lens = jnp.asarray([t])
    lp_pad, state = ctc_prefix_init(jnp.asarray(logp), lens, beam=1)
    cand = jnp.asarray([[[1]]])
    psi, r_new, _ = ctc_prefix_score(state, lp_pad, lens, cand)
    state = ctc_prefix_select(state, r_new, psi, cand,
                              jnp.asarray([[0]]), jnp.asarray([[0]]))
    # extend prefix (1,) by each c in {1, 2}
    cand2 = jnp.asarray([[[1, 2]]])
    psi2, r2, psi_eos = ctc_prefix_score(state, lp_pad, lens, cand2)
    for ki, c in enumerate([1, 2]):
        ref = _brute_prefix_prob(logp[0], (1, c))
        np.testing.assert_allclose(float(psi2[0, 0, ki]), np.log(ref), atol=1e-4)
    # eos score of prefix (1,) == full CTC probability of sequence (1,)
    ref_full = np.log(_brute_full_prob(logp[0], (1,)))
    np.testing.assert_allclose(float(psi_eos[0, 0]), ref_full, atol=1e-4)


def test_eos_matches_ctc_loss():
    """psi_eos after consuming a prefix == -ctc_loss of that label sequence."""
    rng = np.random.RandomState(1)
    t, v = 12, 6
    logits = rng.randn(1, t, v).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    lens = jnp.asarray([t])
    seq = [2, 3, 3, 1]
    lp_pad, state = ctc_prefix_init(logp, lens, beam=1)
    for tok in seq:
        cand = jnp.asarray([[[tok]]])
        psi, r_new, _ = ctc_prefix_score(state, lp_pad, lens, cand)
        state = ctc_prefix_select(state, r_new, psi, cand,
                                  jnp.asarray([[0]]), jnp.asarray([[0]]))
    _, _, psi_eos = ctc_prefix_score(state, lp_pad, lens,
                                     jnp.asarray([[[0]]]))
    nll = ctc_loss_from_log_probs(
        logp, jnp.asarray([seq], np.int32), lens, jnp.asarray([len(seq)])
    )
    np.testing.assert_allclose(float(psi_eos[0, 0]), -float(nll[0]), atol=1e-4)


def test_length_masking():
    """Frames beyond the utterance length must not change scores."""
    rng = np.random.RandomState(2)
    t, v = 10, 5
    logits = rng.randn(1, t, v).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    short = 6
    lens = jnp.asarray([short])
    lp_pad, state = ctc_prefix_init(logp, lens, beam=1)
    cand = jnp.asarray([[[1, 2, 3]]])
    psi_a, _, eos_a = ctc_prefix_score(state, lp_pad, lens, cand)

    logits2 = logits.copy()
    logits2[:, short:] = rng.randn(1, t - short, v)  # different garbage
    logp2 = jax.nn.log_softmax(jnp.asarray(logits2), -1)
    lp_pad2, state2 = ctc_prefix_init(logp2, lens, beam=1)
    psi_b, _, eos_b = ctc_prefix_score(state2, lp_pad2, lens, cand)
    np.testing.assert_allclose(np.asarray(psi_a), np.asarray(psi_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eos_a), np.asarray(eos_b), atol=1e-5)
