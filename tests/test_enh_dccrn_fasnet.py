"""DC-CRN and FaSNet-TAC separators: forward/backward, PIT e2e, layer units.

Mirrors reference tests `test/espnet2/enh/separator/test_dc_crn_separator.py`
and `test_fasnet_separator.py` (shape checks, gradient flow, tiny e2e).
"""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.enh.model import EnhancementModel, EnhConfig


def test_dccrn_separator_shapes_and_complex_mask():
    from espnet_tpu.models.enh.dc_crn import DC_CRNSeparator

    f = 17
    sep = DC_CRNSeparator(input_dim=2 * f, num_spk=2,
                         input_channels=(2, 4, 8), enc_layers=3)
    rng = jax.random.PRNGKey(0)
    feat = jax.random.normal(rng, (2, 12, 2 * f))
    lens = jnp.array([12, 9])
    vars_ = sep.init(rng, feat, lens)
    masked, olens, others = sep.apply(vars_, feat, lens)
    assert masked.shape == (2, 2, 12, 2 * f)
    assert set(others) == {"mask_spk1", "mask_spk2"}
    assert others["mask_spk1"].shape == (2, 12, 2 * f)
    # masking mode must be the exact complex product mask*input
    m = others["mask_spk1"]
    mr, mi = m[..., :f], m[..., f:]
    re, im = feat[..., :f], feat[..., f:]
    np.testing.assert_allclose(
        np.asarray(masked[:, 0, :, :f]), np.asarray(mr * re - mi * im),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(masked[:, 0, :, f:]), np.asarray(mr * im + mi * re),
        rtol=1e-4, atol=1e-5,
    )


def test_dccrn_mapping_and_predict_noise():
    from espnet_tpu.models.enh.dc_crn import DC_CRNSeparator

    f = 9
    sep = DC_CRNSeparator(input_dim=2 * f, num_spk=2, predict_noise=True,
                         input_channels=(2, 4), enc_layers=2,
                         mode="mapping")
    rng = jax.random.PRNGKey(1)
    feat = jax.random.normal(rng, (1, 8, 2 * f))
    lens = jnp.array([8])
    vars_ = sep.init(rng, feat, lens)
    masked, _, others = sep.apply(vars_, feat, lens)
    assert masked.shape == (1, 2, 8, 2 * f)
    assert "noise1" in others and others["noise1"].shape == (1, 8, 2 * f)


def test_dccrn_e2e_model_train_and_grad():
    cfg = EnhConfig(
        num_spk=2, encoder_type="stft", n_fft=64, hop_length=32,
        separator_type="dc_crn", dc_crn_channels=(2, 4, 8),
        dc_crn_block_layers=3, glstm_groups=2, glstm_layers=1,
        dropout_rate=0.0,
    )
    model = EnhancementModel(cfg)
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (2, 800)) * 0.3
    lens = jnp.array([800, 600])
    ref = jax.random.normal(jax.random.PRNGKey(1), (2, 800, 2))
    vars_ = model.init(rng, mix, lens, ref)
    assert "batch_stats" in vars_  # BN running stats (dc_crn.py blocks)
    loss, _ = model.apply(vars_, mix, lens, ref)
    assert np.isfinite(float(loss))
    # train-mode BN: batch stats must update
    (_, _), new_vars = model.apply(
        vars_, mix, lens, ref, False, mutable=["batch_stats"]
    )
    changed = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        vars_["batch_stats"], new_vars["batch_stats"])
    assert max(jax.tree_util.tree_leaves(changed)) > 0
    g = jax.grad(
        lambda p: model.apply({**vars_, "params": p}, mix, lens, ref)[0]
    )(vars_["params"])
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0)
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_glstm_shape_preserving():
    from espnet_tpu.models.enh.dc_crn import GLSTM

    mod = GLSTM(groups=2, layers=2, rearrange=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6, 4, 8))  # (B, T, F, C): C*F=32
    vars_ = mod.init(rng, x)
    y = mod.apply(vars_, x)
    assert y.shape == x.shape


def test_fasnet_tac_forward_and_channel_mask():
    from espnet_tpu.models.enh.fasnet import FaSNetTAC

    net = FaSNetTAC(enc_dim=8, feature_dim=8, hidden_dim=8, layers=1,
                    segment_size=10, num_spk=2, win_ms=4, context_ms=8,
                    sr=1000)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 200, 3))  # 3 mics
    lens = jnp.array([200, 150])
    vars_ = net.init(rng, wav, lens)
    out = net.apply(vars_, wav, lens)
    assert out.shape == (2, 2, 200)
    # channel mask: masking the 3rd mic == passing only 2 mics
    mask = jnp.array([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0]])
    out_masked = net.apply(vars_, wav, lens, mask)
    out_2ch = net.apply(vars_, wav[:, :, :2], lens)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_2ch),
                               rtol=1e-4, atol=1e-5)


def test_fasnet_e2e_model_train_and_grad():
    cfg = EnhConfig(
        num_spk=2, separator_type="fasnet", fasnet_enc_dim=8,
        fasnet_feature_dim=8, fasnet_hidden_dim=8, fasnet_layers=1,
        fasnet_segment_size=10, fasnet_win_ms=4, fasnet_context_ms=8,
        fasnet_sr=1000, dropout_rate=0.0,
    )
    model = EnhancementModel(cfg)
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (2, 300, 2))  # (B, n, C)
    lens = jnp.array([300, 250])
    ref = jax.random.normal(jax.random.PRNGKey(1), (2, 300, 2))
    vars_ = model.init(rng, mix, lens, ref)
    loss, _ = model.apply(vars_, mix, lens, ref)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, mix, lens, ref)[0])(vars_)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0)
    assert np.isfinite(float(mx)) and float(mx) > 0
