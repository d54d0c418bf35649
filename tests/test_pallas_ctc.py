"""Pallas CTC lattice kernels vs the lax.scan reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.ops.ctc import (
    _backward_betas, _extended_labels, _forward_alphas, _label_log_probs,
    _transition_mask,
)
from espnet_tpu.ops.pallas_ctc import ctc_alphas_pallas, ctc_gamma_pallas


def _setup(seed=0, b=3, t=37, u=5, v=11, tb=16):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32))
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    labels = jnp.asarray(rng.randint(1, v, (b, u)).astype(np.int32))
    ilens = jnp.asarray(np.array([t, t - 5, t - 11], np.int32)[:b])
    llens = jnp.asarray(np.array([u, u - 1, u - 2], np.int32)[:b])
    ext = _extended_labels(labels, 0)
    emit = _label_log_probs(log_probs, ext)
    skip = _transition_mask(ext)
    return emit, skip, ilens, llens, tb


@pytest.mark.parametrize("seed", [0, 1])
def test_alphas_match_scan(seed):
    emit, skip, ilens, llens, tb = _setup(seed)
    ref = _forward_alphas(emit, skip, ilens, return_all=True)
    alphas, last = ctc_alphas_pallas(emit, skip, ilens, tb=tb,
                                     interpret=True)
    t = emit.shape[0]
    for bi in range(emit.shape[1]):
        li = int(ilens[bi])
        np.testing.assert_allclose(
            np.asarray(alphas)[:li, bi], np.asarray(ref)[:li, bi],
            rtol=1e-5, atol=1e-4)
        # frozen state past the utterance end == the final frame's alphas
        np.testing.assert_allclose(
            np.asarray(last)[bi], np.asarray(ref)[li - 1, bi],
            rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_gamma_matches_scan(seed):
    emit, skip, ilens, llens, tb = _setup(seed)
    alphas = _forward_alphas(emit, skip, ilens, return_all=True)
    betas = _backward_betas(emit, skip, ilens, llens)
    ref_gamma = np.asarray(alphas + betas - emit)
    gamma = np.asarray(ctc_gamma_pallas(
        emit, skip, ilens, llens, alphas, tb=tb, interpret=True))
    for bi in range(emit.shape[1]):
        li = int(ilens[bi])
        a, b_ = gamma[:li, bi], ref_gamma[:li, bi]
        # compare only finite lattice cells; -inf cells must agree in mask
        finite = np.isfinite(np.maximum(a, -1e29)) & (b_ > -1e29)
        assert ((a > -1e29) == (b_ > -1e29)).all()
        np.testing.assert_allclose(a[finite], b_[finite], rtol=1e-5,
                                   atol=1e-4)


def test_full_loss_grad_pallas_vs_scan(monkeypatch):
    """End-to-end: force the pallas path (interpret) through ctc_loss and
    compare loss+grad against the scan path."""
    import espnet_tpu.ops.ctc as C
    import espnet_tpu.ops.pallas_ctc as P

    rng = np.random.RandomState(7)
    b, t, v, u = 2, 29, 9, 4
    logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, (b, u)).astype(np.int32))
    ilens = jnp.asarray([t, t - 7], dtype=jnp.int32)
    llens = jnp.asarray([u, u - 2], dtype=jnp.int32)

    def f(lg):
        return C.ctc_loss(lg, labels, ilens, llens, 0)

    loss_ref, grad_ref = jax.value_and_grad(f)(logits)

    monkeypatch.setattr(C, "_use_pallas_lattice", lambda: True)
    monkeypatch.setattr(
        P, "ctc_alphas_pallas",
        lambda *a, **k: ctc_alphas_pallas(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(
        P, "ctc_gamma_pallas",
        lambda *a, **k: ctc_gamma_pallas(*a, **{**k, "interpret": True}))
    loss_p, grad_p = jax.value_and_grad(f)(logits)
    np.testing.assert_allclose(float(loss_p), float(loss_ref), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_ref),
                               rtol=1e-4, atol=1e-5)
