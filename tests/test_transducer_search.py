"""Batched transducer beam search vs per-utterance numpy reference.

Mirrors the reference's equivalence-test strategy (SURVEY §4: batched beam
search must match the per-hyp implementation; cf.
`test/test_batch_beam_search.py` in the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.decode.transducer_search import (
    TransducerSearchConfig,
    batched_transducer_beam_search,
    transducer_beam_search_numpy,
)


def _toy_system(seed, de=6, h=5, v=7):
    """A tiny joint + degenerate 'decoder' shared by numpy and jax paths.

    decoder state = previous output vector; step(state, token) =
    tanh(E[token] + W @ state).
    """
    rng = np.random.RandomState(seed)
    wj = rng.randn(de + h, v).astype(np.float32) * 0.7
    emb = rng.randn(v, h).astype(np.float32) * 0.7
    wr = rng.randn(h, h).astype(np.float32) * 0.5

    def joint_np(e, d):
        return np.concatenate([e, d]) @ wj

    def dec_init_np():
        out = np.tanh(emb[0])
        return out, out

    def dec_step_np(state, token):
        out = np.tanh(emb[token] + wr @ state)
        return out, out

    wj_j, emb_j, wr_j = jnp.asarray(wj), jnp.asarray(emb), jnp.asarray(wr)

    def joint_j(e, d):  # (N, De), (N, H) -> (N, V)
        return jnp.concatenate([e, d], axis=-1) @ wj_j

    def dec_init_j(n):
        out = jnp.tanh(jnp.tile(emb_j[0][None], (n, 1)))
        return out, out

    def dec_step_j(state, tok):
        out = jnp.tanh(emb_j[tok] + state @ wr_j.T)
        return out, out

    return (joint_np, dec_init_np, dec_step_np), (joint_j, dec_init_j, dec_step_j)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("max_expansions", [1, 2])
def test_batched_matches_numpy(seed, max_expansions):
    (jn, din, dsn), (jj, dij, dsj) = _toy_system(seed)
    rng = np.random.RandomState(100 + seed)
    b, t, de = 3, 6, 6
    enc = rng.randn(b, t, de).astype(np.float32)
    lens = np.array([6, 4, 2], np.int32)

    toks, tlens, scores = jax.jit(
        lambda e, l: batched_transducer_beam_search(
            e, l, joint_fn=jj, dec_init=dij, dec_step=dsj,
            config=TransducerSearchConfig(
                beam_size=4, max_expansions=max_expansions, max_tokens=32,
            ),
        )
    )(jnp.asarray(enc), jnp.asarray(lens))

    for i in range(b):
        ref_seq, ref_score = transducer_beam_search_numpy(
            enc[i, : lens[i]], joint_fn=jn, dec_init=din, dec_step=dsn,
            beam_size=4, max_expansions=max_expansions,
        )
        got = list(np.asarray(toks[i][: int(tlens[i])]))
        assert got == ref_seq, (i, got, ref_seq)
        assert abs(float(scores[i]) - ref_score) < 1e-3


def test_model_beam_search_runs_and_beats_or_matches_greedy():
    from espnet_tpu.models.transducer import TransducerASRModel, TransducerConfig

    rng = jax.random.PRNGKey(0)
    cfg = TransducerConfig(
        vocab_size=11, input_type="feats", n_mels=8, use_specaug=False,
        d_model=16, num_heads=2, d_ff=32, num_encoder_layers=1,
        decoder_hidden=16, decoder_embed_dim=16, joint_dim=16,
        encoder_type="transformer", dropout_rate=0.0,
    )
    model = TransducerASRModel(cfg)
    b, t = 2, 40
    feats = jax.random.normal(rng, (b, t, 8))
    flens = jnp.array([40, 24])
    text = jnp.array([[1, 2, 3], [4, 5, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init(rng, feats, flens, text, tlens)

    enc, elen = model.apply(params, feats, flens, method=model.encode)
    toks, lens, scores = model.apply(
        params, enc, elen, 3, 2, 16, method=model.beam_search
    )
    assert toks.shape == (b, 16)
    assert bool(jnp.all(lens <= 16))
    assert bool(jnp.all(jnp.isfinite(scores)))
