"""Block-synchronous online beam search vs the offline search.

Reference analogue: `espnet/nets/batch_beam_search_online.py` (commit only
reliable steps per block, rewind on eos/repetition, run the ordinary search
on the final block). Key property checked here: feeding the encoder output
in blocks and finishing with is_final=True yields the SAME n-best as the
offline search whenever the non-final blocks only committed steps that the
offline search also takes (guaranteed on these fixtures by the conservative
stop heuristics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.decode.beam_search import (
    BeamSearchConfig, batched_beam_search,
)
from espnet_tpu.decode.online_beam_search import (
    init_online_state, process_block,
)

V, SOS_EOS = 8, 7


def _table_scorer(seed=0, maxlen=32):
    rng = np.random.RandomState(seed)
    table = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.randn(V, maxlen, V) * 2.0), -1)
    )

    def batched_fn(tokens, pos, cache):
        return jnp.asarray(table)[tokens, pos], cache

    return batched_fn


def _hyps(yseq, ylen, score, w):
    out = []
    for wi in range(w):
        n = int(ylen[0, wi])
        out.append((list(np.asarray(yseq[0, wi, :n])), round(float(score[0, wi]), 4)))
    return out


@pytest.mark.parametrize("ctc_weight", [0.0, 0.3])
def test_streaming_final_matches_offline(ctc_weight):
    rng = np.random.RandomState(11)
    t_max, max_steps, w = 16, 12, 3
    enc_len = 14
    # blank-dominated posteriors (realistic CTC output): partial-input
    # prefix scores are then stable under frame extension, which is the
    # regime the online algorithm (and the reference's extend_state
    # approximation) is designed for
    logits = rng.randn(1, t_max, V) * 1.5
    logits[..., 0] += 4.0
    ctc_logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    cfg = BeamSearchConfig(beam_size=w, att_weight=1.0 - ctc_weight,
                           ctc_weight=ctc_weight, maxlenratio=0.7)
    fn = _table_scorer(seed=4)
    cache0 = jnp.zeros((w, 1))

    off_yseq, off_ylen, off_score = batched_beam_search(
        cfg, SOS_EOS, SOS_EOS, V, jnp.asarray([enc_len]), fn, cache0,
        ctc_log_probs=jnp.asarray(ctc_logp[:, :enc_len]) if ctc_weight else None,
        max_steps=max_steps,
    )

    # stream the same log-probs in 3 blocks over a T_max buffer
    state = init_online_state(cfg, SOS_EOS, SOS_EOS, 1, t_max, max_steps,
                              cache0, vocab_size=V)
    buf = np.zeros((1, t_max, V), np.float32)
    old = 0
    for new in (5, 10, enc_len):
        buf[:, old:new] = ctc_logp[:, old:new]
        is_final = new == enc_len
        state, yseq, ylen, score = process_block(
            cfg, SOS_EOS, SOS_EOS, V, state, jnp.asarray(buf),
            jnp.asarray([old]), jnp.asarray([new]), fn,
            is_final=is_final, max_steps=max_steps,
        )
        old = new

    # 1-best parity: the committed prefix is one the offline search also
    # takes, so the final best token sequence coincides. (The n-best TAIL
    # may differ — committing a step prunes shorter hypotheses — and with
    # CTC the *score* drifts by the reference's extend_state approximation
    # (`ctc_prefix_score.py:244`), so scores are compared only without CTC.)
    got, off = _hyps(yseq, ylen, score, 1)[0], _hyps(off_yseq, off_ylen,
                                                     off_score, 1)[0]
    assert got[0] == off[0]
    if ctc_weight == 0.0:
        assert got[1] == off[1]


def test_nonfinal_blocks_commit_only_safe_steps():
    """Intermediate outputs are prefixes the offline search agrees with."""
    rng = np.random.RandomState(2)
    t_max, max_steps, w = 16, 12, 3
    enc_len = 14
    ctc_logp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.randn(1, t_max, V) * 1.5), -1)
    )
    cfg = BeamSearchConfig(beam_size=w, att_weight=0.7, ctc_weight=0.3,
                           maxlenratio=0.7)
    fn = _table_scorer(seed=9)
    cache0 = jnp.zeros((w, 1))
    state = init_online_state(cfg, SOS_EOS, SOS_EOS, 1, t_max, max_steps,
                              cache0, vocab_size=V)
    buf = np.zeros((1, t_max, V), np.float32)
    buf[:, :8] = ctc_logp[:, :8]
    state, yseq, ylen, score = process_block(
        cfg, SOS_EOS, SOS_EOS, V, state, jnp.asarray(buf),
        jnp.asarray([0]), jnp.asarray([8]), fn, is_final=False,
        max_steps=max_steps,
    )
    n_committed = int(state.step)
    assert 0 <= n_committed <= 8
    # no committed hypothesis may contain a repeated token or eos
    for wi in range(w):
        n = int(ylen[0, wi])
        toks = list(np.asarray(yseq[0, wi, :n]))
        assert SOS_EOS not in toks
        assert len(set(toks)) == len(toks)
