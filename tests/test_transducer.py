"""RNN-T loss correctness vs brute-force alignment enumeration."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.ops.transducer import (
    transducer_loss, transducer_loss_from_log_probs,
)


def _brute_force_nll(logp, labels, t_len, u_len, blank=0):
    """Enumerate all monotone paths: t blank moves interleaved with u label
    moves; path prob = prod of emission probs at visited (t,u) states."""
    # a path is a sequence of moves: T blanks + U labels, ending with the
    # final blank at (T-1, U); enumerate orderings of moves
    moves = ["b"] * t_len + ["l"] * u_len
    total = 0.0
    p = np.exp(logp)
    seen = set()
    for perm in set(itertools.permutations(moves)):
        # final move must be the blank that consumes the last frame at u=U
        if perm[-1] != "b":
            continue
        t = u = 0
        prob = 1.0
        ok = True
        for mv in perm:
            if mv == "b":
                prob *= p[t, u, blank]
                t += 1
                if t > t_len:
                    ok = False
                    break
            else:
                prob *= p[t, u, labels[u]]
                u += 1
                if u > u_len:
                    ok = False
                    break
        if ok and t == t_len and u == u_len:
            total += prob
    return -np.log(total)


@pytest.mark.parametrize("t_len,u_len", [(3, 2), (4, 1), (2, 2)])
def test_transducer_loss_matches_brute_force(t_len, u_len):
    rng = np.random.RandomState(t_len * 10 + u_len)
    v = 4
    logits = rng.randn(1, t_len, u_len + 1, v).astype(np.float32)
    labels = rng.randint(1, v, (1, u_len)).astype(np.int32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    ref = _brute_force_nll(logp[0], labels[0], t_len, u_len)
    nll = transducer_loss_from_log_probs(
        jnp.asarray(logp), jnp.asarray(labels),
        jnp.asarray([t_len]), jnp.asarray([u_len]),
    )
    np.testing.assert_allclose(float(nll[0]), ref, rtol=1e-4)


def test_transducer_variable_lengths():
    """Padded T/U regions must not affect the loss."""
    rng = np.random.RandomState(0)
    v, t, u = 5, 6, 3
    logits = rng.randn(2, t, u + 1, v).astype(np.float32)
    labels = np.asarray([[1, 2, 3], [2, 1, 0]], np.int32)
    ilens = np.asarray([4, 6], np.int32)
    llens = np.asarray([2, 3], np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    nll = transducer_loss_from_log_probs(
        lp, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
    )
    ref0 = _brute_force_nll(np.asarray(lp)[0, :4], labels[0], 4, 2)
    np.testing.assert_allclose(float(nll[0]), ref0, rtol=1e-4)
    # garbage in padding
    logits2 = logits.copy()
    logits2[0, 4:] = 100.0
    lp2 = jax.nn.log_softmax(jnp.asarray(logits2), -1)
    nll2 = transducer_loss_from_log_probs(
        lp2, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
    )
    np.testing.assert_allclose(float(nll[0]), float(nll2[0]), rtol=1e-5)


def test_transducer_grad_matches_autodiff():
    """Analytic VJP == autodiff through the alpha scan (exact)."""
    from espnet_tpu.ops.transducer import _loss_impl

    rng = np.random.RandomState(3)
    v, t, u = 4, 5, 3
    logits = rng.randn(2, t, u + 1, v).astype(np.float32)
    labels = np.asarray([[1, 3, 2], [2, 2, 0]], np.int32)
    ilens = jnp.asarray([t, t - 2])
    llens = jnp.asarray([u, u - 1])
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)

    def plain(p):
        loss, _ = _loss_impl(p, jnp.asarray(labels), ilens, llens, 0)
        return jnp.sum(loss)

    g_auto = np.asarray(jax.grad(plain)(lp))
    g_custom = np.asarray(jax.grad(
        lambda p: jnp.sum(transducer_loss_from_log_probs(
            p, jnp.asarray(labels), ilens, llens))
    )(lp))
    np.testing.assert_allclose(g_custom, g_auto, atol=1e-5)


def test_transducer_jit_and_batch():
    rng = np.random.RandomState(4)
    logits = rng.randn(3, 8, 5, 6).astype(np.float32)
    labels = rng.randint(1, 6, (3, 4)).astype(np.int32)
    fn = jax.jit(lambda lg: transducer_loss(
        lg, jnp.asarray(labels), jnp.asarray([8, 6, 5]),
        jnp.asarray([4, 3, 2]),
    ))
    val = fn(jnp.asarray(logits))
    assert np.isfinite(float(val))
