"""Batched NSC (prefix-merge N-step constrained) vs per-utterance numpy
oracle — the real algorithm, replacing the round-2 mAES alias."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.decode.transducer_search import (
    TransducerSearchConfig,
    batched_transducer_nsc,
    transducer_nsc_numpy,
)
from tests.test_transducer_search import _toy_system


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("nstep", [1, 2])
def test_nsc_matches_numpy(seed, nstep):
    (jn, din, dsn), (jj, dij, dsj) = _toy_system(seed)
    rng = np.random.RandomState(200 + seed)
    b, t, de = 3, 6, 6
    enc = rng.randn(b, t, de).astype(np.float32)
    lens = np.array([6, 4, 2], np.int32)

    toks, tlens, scores = jax.jit(
        lambda e, l: batched_transducer_nsc(
            e, l, joint_fn=jj, dec_init=dij, dec_step=dsj,
            config=TransducerSearchConfig(
                beam_size=4, max_expansions=nstep, max_tokens=32,
            ),
        )
    )(jnp.asarray(enc), jnp.asarray(lens))

    for i in range(b):
        ref_seq, ref_score = transducer_nsc_numpy(
            enc[i, : lens[i]], joint_fn=jn, dec_init=din, dec_step=dsn,
            beam_size=4, nstep=nstep,
        )
        got = np.asarray(toks)[i, : int(tlens[i])].tolist()
        assert got == ref_seq, (i, got, ref_seq)
        np.testing.assert_allclose(float(scores[i]), ref_score, rtol=1e-4,
                                   atol=1e-4)


def test_nsc_rejects_deep_prefix_alpha():
    (_, _, _), (jj, dij, dsj) = _toy_system(0)
    with pytest.raises(ValueError, match="prefix_alpha"):
        batched_transducer_nsc(
            jnp.zeros((1, 2, 6)), jnp.array([2]),
            joint_fn=jj, dec_init=dij, dec_step=dsj, prefix_alpha=2,
        )
