"""Enhancement family: losses, PIT, separators, model, task CLI.

Mirrors the reference test strategy for `espnet2/enh/`
(test/espnet2/enh/**: criterion value checks, PIT permutation invariance,
separator shapes, e2e tiny training).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.ops.enh_losses import (
    pit_solve, si_snr_loss, snr_loss, spectral_l1_loss, time_mse_loss,
)


def test_si_snr_perfect_and_scaled():
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    # scale invariance: est = 3 * ref has (near) infinite si-snr -> very low loss
    loss_scaled = si_snr_loss(ref, 3.0 * ref)
    assert float(jnp.max(loss_scaled)) < -40.0
    # uncorrelated noise -> loss near 0 dB or worse
    est = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    loss_noise = si_snr_loss(ref, est)
    assert float(jnp.min(loss_noise)) > -5.0


def test_si_snr_respects_lengths():
    rng = np.random.RandomState(1)
    ref = rng.randn(1, 1000).astype(np.float32)
    est = ref + 0.1 * rng.randn(1, 1000).astype(np.float32)
    # corrupt the padded tail only: loss with lengths=600 must not change
    est2 = est.copy()
    est2[:, 600:] = 5.0
    l1 = si_snr_loss(jnp.asarray(ref), jnp.asarray(est), jnp.asarray([600]))
    l2 = si_snr_loss(jnp.asarray(ref), jnp.asarray(est2), jnp.asarray([600]))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def test_pit_permutation_invariance():
    rng = jax.random.PRNGKey(0)
    refs = jax.random.normal(rng, (3, 2, 400))
    ests = refs + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (3, 2, 400))
    l_fwd, p_fwd = pit_solve(lambda r, e: si_snr_loss(r, e), refs, ests)
    l_swp, p_swp = pit_solve(lambda r, e: si_snr_loss(r, e), refs[:, ::-1], ests)
    np.testing.assert_allclose(np.asarray(l_fwd), np.asarray(l_swp), rtol=1e-5)
    # permutation must actually flip
    assert np.all(np.asarray(p_fwd) != np.asarray(p_swp))


def test_pit_three_speakers():
    rng = jax.random.PRNGKey(2)
    refs = jax.random.normal(rng, (2, 3, 200))
    perm = [2, 0, 1]
    ests = refs[:, perm] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(3), (2, 3, 200)
    )
    loss, best = pit_solve(lambda r, e: si_snr_loss(r, e), refs, ests)
    # est slot j matches ref slot perm[j]
    assert np.all(np.asarray(best) == np.asarray(perm)[None, :])


@pytest.mark.parametrize(
    "sep", ["tcn", "dprnn", "transformer", "dptnet", "skim", "conformer"]
)
def test_model_forward_backward(sep):
    from espnet_tpu.models.enh import EnhancementModel, EnhConfig

    cfg = EnhConfig(
        num_spk=2, enc_channels=16, enc_kernel=16, enc_stride=8,
        separator_type=sep, tcn_layers=2, tcn_stacks=1, tcn_bottleneck=8,
        tcn_hidden=16, dprnn_blocks=1, dprnn_hidden=8, dprnn_chunk=20,
        trans_d_model=16, trans_heads=2, trans_d_ff=32, trans_layers=1,
        dropout_rate=0.0,
    )
    model = EnhancementModel(cfg)
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (2, 2000))
    lens = jnp.array([2000, 1500])
    ref = jax.random.normal(jax.random.PRNGKey(1), (2, 2000, 2))
    params = model.init(rng, mix, lens, ref)
    loss, stats = model.apply(params, mix, lens, ref)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, mix, lens, ref)[0])(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0
    est, others = model.apply(params, mix, lens,
                              method=EnhancementModel.forward_enhance)
    assert est.shape == (2, 2, 2000)
    assert "mask_spk1" in others and "mask_spk2" in others


def test_stft_encoder_roundtrip_model():
    from espnet_tpu.models.enh import EnhancementModel, EnhConfig

    cfg = EnhConfig(
        num_spk=2, encoder_type="stft", n_fft=256, hop_length=64,
        separator_type="tcn", tcn_layers=2, tcn_stacks=1, tcn_bottleneck=8,
        tcn_hidden=16, dropout_rate=0.0,
    )
    model = EnhancementModel(cfg)
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (1, 2000)) * 0.3
    lens = jnp.array([2000])
    ref = jax.random.normal(jax.random.PRNGKey(1), (1, 2000, 2))
    params = model.init(rng, mix, lens, ref)
    loss, _ = model.apply(params, mix, lens, ref)
    assert np.isfinite(float(loss))


def test_enh_separation_learns(tmp_path):
    """A tiny TCN must improve SI-SNR on a fixed 2-src toy mixture after a
    few hundred steps (separation actually works, not just runs)."""
    import optax

    from espnet_tpu.models.enh import EnhancementModel, EnhConfig

    rng = np.random.RandomState(0)
    n = 4000
    t = np.arange(n) / 8000.0
    s1 = np.sin(2 * np.pi * 400 * t).astype(np.float32)
    s2 = np.sign(np.sin(2 * np.pi * 90 * t)).astype(np.float32) * 0.5
    mix = (s1 + s2)[None]
    refs = np.stack([s1, s2], 1)[None]  # (1, n, 2)

    cfg = EnhConfig(
        num_spk=2, enc_channels=32, enc_kernel=16, enc_stride=8,
        separator_type="tcn", tcn_layers=4, tcn_stacks=1, tcn_bottleneck=16,
        tcn_hidden=32, dropout_rate=0.0,
    )
    model = EnhancementModel(cfg)
    mix_j = jnp.asarray(mix)
    lens = jnp.asarray([n])
    refs_j = jnp.asarray(refs)
    params = model.init(jax.random.PRNGKey(0), mix_j, lens, refs_j)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, mix_j, lens, refs_j)[0]
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(model.apply(params, mix_j, lens, refs_j)[0])
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
    loss_end = float(loss)
    # loss = -SI-SNR: demand >= 8 dB improvement on this trivial problem
    assert loss_end < loss0 - 8.0, (loss0, loss_end)
