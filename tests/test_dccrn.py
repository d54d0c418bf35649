"""DCCRN separator (`dccrn_separator.py:23` spec): shapes, masking modes,
noise mask, and e2e gradient flow through the enh model."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.enh.model import EnhancementModel, EnhConfig


def _run(sep, feat, lens, train=False):
    vars_ = sep.init(jax.random.PRNGKey(0), feat, lens)
    if train:
        return sep.apply(vars_, feat, lens, False,
                         mutable=["batch_stats"])[0]
    return sep.apply(vars_, feat, lens)


def test_dccrn_shapes_and_complex_mask():
    from espnet_tpu.models.enh.dccrn import DCCRNSeparator

    f = 33
    sep = DCCRNSeparator(input_dim=2 * f, num_spk=2,
                         kernel_num=(4, 8, 16), masking_mode="C")
    feat = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 2 * f))
    lens = jnp.array([12, 9])
    masked, olens, others = _run(sep, feat, lens)
    assert masked.shape == (2, 2, 12, 2 * f)
    assert set(others) == {"mask_spk1", "mask_spk2"}
    assert others["mask_spk1"].shape == (2, 12, 2 * f)
    np.testing.assert_array_equal(np.asarray(olens), np.asarray(lens))
    # C mode: exact complex product mask * mixture, per speaker
    m = others["mask_spk2"]
    mr, mi = m[..., :f], m[..., f:]
    re, im = feat[..., :f], feat[..., f:]
    np.testing.assert_allclose(
        np.asarray(masked[:, 1, :, :f]), np.asarray(re * mr - im * mi),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(masked[:, 1, :, f:]), np.asarray(re * mi + im * mr),
        rtol=1e-4, atol=1e-5)
    # DC bin of the mask is zero (reference pads it back with zeros)
    assert np.all(np.asarray(m[..., 0]) == 0.0)
    assert np.all(np.asarray(m[..., f]) == 0.0)


def test_dccrn_e_mode_bounded_magnitude():
    from espnet_tpu.models.enh.dccrn import DCCRNSeparator

    f = 17
    sep = DCCRNSeparator(input_dim=2 * f, num_spk=1,
                         kernel_num=(4, 8), masking_mode="E")
    feat = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 2 * f))
    lens = jnp.array([10])
    masked, _, _ = _run(sep, feat, lens)
    # E mode: |est| = tanh(|mask|) * |mix| <= |mix|
    est = np.asarray(masked[:, 0])
    er, ei = est[..., :f], est[..., f:]
    mr, mi = np.asarray(feat[..., :f]), np.asarray(feat[..., f:])
    est_mag = np.sqrt(er**2 + ei**2)
    mix_mag = np.sqrt(mr**2 + mi**2 + 1e-8)
    assert np.all(est_mag <= mix_mag + 1e-4)


def test_dccrn_noise_mask_and_rnn_units():
    from espnet_tpu.models.enh.dccrn import DCCRNSeparator

    f = 17
    sep = DCCRNSeparator(input_dim=2 * f, num_spk=1, use_noise_mask=True,
                         kernel_num=(4, 8), rnn_layer=2, rnn_units=32,
                         masking_mode="R")
    feat = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 2 * f))
    lens = jnp.array([8])
    masked, _, others = _run(sep, feat, lens)
    assert masked.shape == (1, 1, 8, 2 * f)
    assert "noise1" in others and others["noise1"].shape == (1, 8, 2 * f)
    assert "mask_noise1" in others


def test_dccrn_e2e_model_train_and_grad():
    cfg = EnhConfig(
        num_spk=2, encoder_type="stft", n_fft=64, hop_length=32,
        separator_type="dccrn", dccrn_kernel_num=(4, 8),
        dccrn_rnn_units=16, loss_type="si_snr",
    )
    model = EnhancementModel(cfg)
    n = 640
    mix = jax.random.normal(jax.random.PRNGKey(4), (2, n))
    refs = jax.random.normal(jax.random.PRNGKey(5), (2, 2, n))
    lens = jnp.array([n, n - 100])
    vars_ = model.init(jax.random.PRNGKey(0), mix, lens, refs)

    def loss_fn(params):
        (loss, stats), _ = model.apply(
            {**vars_, "params": params}, mix, lens, refs, False,
            mutable=["batch_stats"])
        return loss

    loss, g = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)
