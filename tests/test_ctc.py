"""CTC loss parity vs torch.nn.CTCLoss (the reference's backend,
`espnet/nets/pytorch_backend/ctc.py:38`): values and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.ops.ctc import ctc_loss, ctc_loss_from_log_probs


def _make_case(b=3, t=20, v=8, u=6, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32)
    labels = rng.randint(1, v, size=(b, u)).astype(np.int32)
    input_lengths = np.array([t, t - 4, t - 9], np.int32)[:b]
    label_lengths = np.array([u, u - 2, u - 4], np.int32)[:b]
    return logits, labels, input_lengths, label_lengths


def _torch_ref(logits, labels, input_lengths, label_lengths):
    """Returns (per-utt loss, grad wrt *logits*).

    Gradients are compared in logits space: torch.nn.CTCLoss's grad wrt its
    log_probs input bakes in the softmax Jacobian (a documented torch quirk),
    so only the end-to-end logits gradient is a well-defined common quantity
    (both match finite differences there).
    """
    torch = pytest.importorskip("torch")
    lg = torch.from_numpy(logits).requires_grad_(True)
    lp = lg.log_softmax(-1).transpose(0, 1)  # (T, B, V)
    loss = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)(
        lp,
        torch.from_numpy(labels),
        torch.from_numpy(input_lengths),
        torch.from_numpy(label_lengths),
    )
    loss.sum().backward()
    return loss.detach().numpy(), lg.grad.numpy()


def test_ctc_loss_matches_torch():
    logits, labels, ilens, llens = _make_case()
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = ctc_loss_from_log_probs(
        log_probs, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
    )
    ref, _ = _torch_ref(logits, labels, ilens, llens)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_ctc_grad_matches_torch():
    logits, labels, ilens, llens = _make_case(seed=1)
    ref_loss, ref_grad = _torch_ref(logits, labels, ilens, llens)

    def f(lg):
        return ctc_loss(
            lg, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens),
            reduction="sum",
        )

    grad = jax.grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=1e-4, rtol=1e-3)


def test_ctc_custom_vjp_matches_autodiff():
    """The analytic beta-recursion VJP equals autodiff-through-scan."""
    from espnet_tpu.ops.ctc import _ctc_fwd_impl

    logits, labels, ilens, llens = _make_case(seed=5)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    args = (jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens))

    def plain(p):
        loss, _ = _ctc_fwd_impl(p, *args, 0)
        return jnp.sum(loss)

    g_auto = jax.grad(plain)(lp)
    g_custom = jax.grad(
        lambda p: jnp.sum(ctc_loss_from_log_probs(p, *args))
    )(lp)
    np.testing.assert_allclose(
        np.asarray(g_auto), np.asarray(g_custom), atol=1e-5
    )


def test_ctc_repeated_labels():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    b, t, v = 2, 15, 6
    logits = rng.randn(b, t, v).astype(np.float32)
    labels = np.array([[1, 1, 2, 2, 1], [3, 3, 3, 0, 0]], np.int32)
    ilens = np.array([15, 12], np.int32)
    llens = np.array([5, 3], np.int32)
    ref, ref_grad = _torch_ref(logits, labels, ilens, llens)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = ctc_loss_from_log_probs(
        lp, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)
    grad = jax.grad(lambda x: ctc_loss(
        x, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens),
        reduction="sum",
    ))(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=1e-4, rtol=1e-3)


def test_ctc_infeasible_is_zero():
    # T shorter than required alignment length -> zero_infinity behavior.
    logits = np.random.RandomState(3).randn(1, 4, 5).astype(np.float32)
    labels = np.array([[1, 1, 2]], np.int32)  # needs >= 3 + 1 repeat = 4... use 3 frames
    ilens = np.array([3], np.int32)
    llens = np.array([3], np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    loss = ctc_loss_from_log_probs(
        lp, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
    )
    grad = jax.grad(lambda p: jnp.sum(ctc_loss_from_log_probs(
        p, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
    )))(lp)
    assert float(loss[0]) == 0.0
    assert np.all(np.asarray(grad) == 0.0)


def test_ctc_loss_reduction_and_jit():
    logits, labels, ilens, llens = _make_case(seed=4)
    fn = jax.jit(lambda lg: ctc_loss(
        lg, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
    ))
    val = fn(jnp.asarray(logits))
    ref, _ = _torch_ref(logits, labels, ilens, llens)
    np.testing.assert_allclose(float(val), ref.sum() / len(ref), atol=1e-4, rtol=1e-4)


def test_ctc_logits_bf16_grad_matches_f32():
    """The bf16 branch of `_ctc_logits_bwd` (ADVICE r3): bf16-logits
    gradients must track the f32 path at bf16-appropriate tolerance."""
    from espnet_tpu.ops.ctc import ctc_loss_from_logits

    logits, labels, ilens, llens = _make_case(b=3, t=24, v=16, u=6, seed=7)
    args = (jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens))

    def f(lg):
        return jnp.sum(ctc_loss_from_logits(lg, *args))

    g32 = jax.grad(f)(jnp.asarray(logits))
    g16 = jax.grad(lambda lg: f(lg.astype(jnp.bfloat16)))(jnp.asarray(logits))
    assert g32.dtype == jnp.float32
    # loss values agree to bf16 emission precision
    l32 = float(f(jnp.asarray(logits)))
    l16 = float(f(jnp.asarray(logits).astype(jnp.bfloat16)))
    assert abs(l32 - l16) / abs(l32) < 2e-2
    np.testing.assert_allclose(
        np.asarray(g16, np.float32), np.asarray(g32), atol=2e-2, rtol=2e-1
    )


def test_ctc_logits_bf16_bwd_dtype_and_feasibility():
    from espnet_tpu.ops.ctc import ctc_loss_from_logits

    logits, labels, ilens, llens = _make_case(seed=9)
    lg16 = jnp.asarray(logits).astype(jnp.bfloat16)
    g = jax.grad(lambda lg: jnp.sum(ctc_loss_from_logits(
        lg, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
    )))(lg16)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
