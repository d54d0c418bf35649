"""Beam search equivalence tests (reference style:
`test/test_batch_beam_search.py` asserts batch == per-hyp search results).

The fixed-shape lax.while_loop search is checked against a slow dynamic
python implementation of the same semantics, using a synthetic stateless
scorer (log-probs from a random table keyed by (last_token, position)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.decode.beam_search import (
    BeamSearchConfig, batched_beam_search, beam_search_numpy_reference,
)

V, SOS_EOS = 8, 7


def _table_scorer(seed=0, maxlen=32):
    """Deterministic fake acoustic scorer: logp(next | last_tok, pos)."""
    rng = np.random.RandomState(seed)
    table = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.randn(V, maxlen, V) * 2.0), -1)
    )

    def batched_fn(tokens, pos, cache):
        return jnp.asarray(table)[tokens, pos], cache

    def prefix_fn(prefix):
        return table[prefix[-1], len(prefix) - 1]

    return batched_fn, prefix_fn


def _run_fixed(cfg, batched_fn, enc_len, ctc_logp=None, max_steps=16, b=1):
    enc_lengths = jnp.asarray([enc_len] * b)
    yseq, ylen, score = batched_beam_search(
        cfg, SOS_EOS, SOS_EOS, V, enc_lengths,
        batched_fn, att_cache_init=jnp.zeros((b * cfg.beam_size, 1)),
        ctc_log_probs=ctc_logp,
        max_steps=max_steps,
    )
    out = []
    for bi in range(b):
        hyps = []
        for wi in range(cfg.beam_size):
            n = int(ylen[bi, wi])
            hyps.append((list(np.asarray(yseq[bi, wi, :n])), float(score[bi, wi])))
        out.append(hyps)
    return out


def test_att_only_matches_reference():
    cfg = BeamSearchConfig(beam_size=4, att_weight=1.0, ctc_weight=0.0,
                           maxlenratio=0.5)
    batched_fn, prefix_fn = _table_scorer(seed=3)
    enc_len = 20
    ref = beam_search_numpy_reference(cfg, SOS_EOS, SOS_EOS, prefix_fn,
                                      enc_len, max_steps=16)
    got = _run_fixed(cfg, batched_fn, enc_len)[0]
    assert ref, "oracle found no ended hypothesis"
    assert got[0][0] == ref[0].yseq
    np.testing.assert_allclose(got[0][1], ref[0].score, atol=1e-4)


def test_joint_ctc_att_matches_reference():
    rng = np.random.RandomState(5)
    enc_len = 12
    ctc_logp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.randn(enc_len, V) * 1.5), -1)
    )
    cfg = BeamSearchConfig(beam_size=4, att_weight=0.7, ctc_weight=0.3,
                           maxlenratio=0.9)
    batched_fn, prefix_fn = _table_scorer(seed=6)
    ref = beam_search_numpy_reference(
        cfg, SOS_EOS, SOS_EOS, prefix_fn, enc_len,
        ctc_log_probs=ctc_logp, max_steps=16,
    )
    got = _run_fixed(cfg, batched_fn, enc_len,
                     ctc_logp=jnp.asarray(ctc_logp[None]))[0]
    assert ref
    assert got[0][0] == ref[0].yseq
    np.testing.assert_allclose(got[0][1], ref[0].score, atol=1e-4)


def test_batch_matches_single():
    """Decoding 3 utterances at once == decoding each alone."""
    rng = np.random.RandomState(7)
    enc_len = 10
    cfg = BeamSearchConfig(beam_size=3, att_weight=0.6, ctc_weight=0.4,
                           maxlenratio=0.9)
    logps = [
        np.asarray(jax.nn.log_softmax(jnp.asarray(rng.randn(enc_len, V)), -1))
        for _ in range(3)
    ]
    batched_fn, _ = _table_scorer(seed=8)
    singles = [
        _run_fixed(cfg, batched_fn, enc_len, jnp.asarray(lp[None]))[0]
        for lp in logps
    ]
    batch = _run_fixed(cfg, batched_fn, enc_len,
                       jnp.asarray(np.stack(logps)), b=3)
    for bi in range(3):
        assert batch[bi][0][0] == singles[bi][0][0]
        np.testing.assert_allclose(batch[bi][0][1], singles[bi][0][1], atol=1e-4)


def test_minlen_and_force_eos():
    cfg = BeamSearchConfig(beam_size=2, att_weight=1.0, ctc_weight=0.0,
                           maxlenratio=0.3, minlenratio=0.1)
    batched_fn, _ = _table_scorer(seed=9)
    got = _run_fixed(cfg, batched_fn, 10, max_steps=8)[0]
    # maxlen = 3 => every finished hyp has between minlen=1 and 3 tokens
    for toks, score in got:
        if score > -1e29:
            assert 1 <= len(toks) <= 3


def test_beam_size_one_greedy():
    """beam_size=1 (greedy decode via the same program) must not crash —
    round-3 regression: top_k(2W) over a W*W=1 candidate pool."""
    cfg = BeamSearchConfig(beam_size=1, att_weight=1.0, ctc_weight=0.0,
                           maxlenratio=0.5)
    batched_fn, prefix_fn = _table_scorer(seed=7)
    enc_len = 20
    got = _run_fixed(cfg, batched_fn, enc_len)[0]
    assert got and len(got[0][0]) > 0
    ref = beam_search_numpy_reference(cfg, SOS_EOS, SOS_EOS, prefix_fn,
                                      enc_len, max_steps=16)
    assert got[0][0] == ref[0].yseq
