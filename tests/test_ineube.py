"""iNeuBe separator (`ineube_separator.py:16` spec): U-Net geometry, the
three output stages, mfMCWF oracle behavior, e2e gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.enh.model import EnhancementModel, EnhConfig

KW = dict(n_fft=64, stride=32, hid_chans=4, hid_chans_dense=4,
          tcn_repeats=1, tcn_blocks=2, tcn_channels=16)


@pytest.mark.parametrize("output_from", ["dnn1", "mfmcwf", "dnn2"])
def test_ineube_stages(output_from):
    from espnet_tpu.models.enh.ineube import iNeuBeSeparator

    sep = iNeuBeSeparator(n_spk=2, mic_channels=2, output_from=output_from,
                          n_chunks=1, **KW)
    n = 512
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, n, 2))
    lens = jnp.array([n, n - 64])
    vars_ = sep.init(jax.random.PRNGKey(1), wav, lens)
    est, olens, others = sep.apply(vars_, wav, lens)
    assert est.shape == (2, 2, n)
    assert np.isfinite(np.asarray(est)).all()
    if output_from == "dnn1":
        assert not others
    else:
        assert "dnn1" in others and others["dnn1"].shape == (2, 2, n)
    if output_from == "dnn2":
        assert "beam" in others


def test_freq_unet_depth():
    from espnet_tpu.models.enh.ineube import _freq_depth

    # n_fft=512 -> 257 freqs -> 255 after first conv -> halve to <= 15
    assert _freq_depth(255) == [127, 63, 31, 15]
    assert _freq_depth(31) == [15]


def test_mfmcwf_recovers_scaled_source():
    """With mixture == scaled copies of the target across mics, the MCWF
    projection of the mixture onto the estimate reproduces the target."""
    from espnet_tpu.models.enh.ineube import mfmcwf

    rng = np.random.RandomState(0)
    t, f = 20, 9
    src = rng.randn(t, f) + 1j * rng.randn(t, f)
    # 2 mics: mic0 = src, mic1 = 0.5 * src (rank-1 mixture, no noise)
    mix = np.stack([src, 0.5 * src], axis=1)[None]  # (1, T, C, F)
    est = src[None]  # (1, T, F) perfect estimate
    # a noise-free rank-1 SCM is exactly the ill-conditioned corner, so use
    # a visible Tikhonov loading (complex64 solve) and a loose tolerance
    out = mfmcwf(jnp.asarray(mix, jnp.complex64), jnp.asarray(est, jnp.complex64),
                 n_chunks=0, tik_eps=1e-4)
    np.testing.assert_allclose(np.asarray(out[0]), src, rtol=2e-3, atol=2e-3)


def test_ineube_e2e_model_grad():
    cfg = EnhConfig(
        num_spk=1, separator_type="ineube", n_fft=64, hop_length=32,
        ineube_mics=1, ineube_hid_chans=4, ineube_hid_chans_dense=4,
        ineube_tcn_repeats=1, ineube_tcn_blocks=2, ineube_tcn_channels=16,
        ineube_output_from="dnn1", loss_type="si_snr",
    )
    model = EnhancementModel(cfg)
    n = 512
    mix = jax.random.normal(jax.random.PRNGKey(2), (2, n))
    refs = jax.random.normal(jax.random.PRNGKey(3), (2, 1, n))
    lens = jnp.array([n, n])
    vars_ = model.init(jax.random.PRNGKey(0), mix, lens, refs)

    def loss_fn(params):
        loss, stats = model.apply({"params": params}, mix, lens, refs, False)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
