"""SVoice separator (`svoice_separator.py:95` spec): shapes, deep-supervision
outputs, overlap-add decoder, e2e PIT gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.enh.model import EnhancementModel, EnhConfig


def test_svoice_shapes_and_layers():
    from espnet_tpu.models.enh.svoice import SVoiceSeparator

    sep = SVoiceSeparator(enc_dim=32, kernel_size=4, hidden_size=8,
                          num_spk=2, num_layers=3, segment_size=10)
    n = 800
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, n))
    lens = jnp.array([n, n - 50])
    vars_ = sep.init(jax.random.PRNGKey(1), wav, lens)
    est, olens, others = sep.apply(vars_, wav, lens)
    assert est.shape == (2, 2, n)
    np.testing.assert_array_equal(np.asarray(olens), np.asarray(lens))
    # deep supervision: one intermediate estimate per non-final block
    assert set(others) == {"layer1", "layer2"}
    assert others["layer1"].shape == (2, 2, n)
    # intermediate and final estimates differ (separate block outputs)
    assert not np.allclose(np.asarray(others["layer2"]), np.asarray(est))


def test_svoice_overlap_add():
    from espnet_tpu.models.enh.svoice import _overlap_add

    frames = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
    out = _overlap_add(frames, hop=2)
    assert out.shape == (1, 2 * 2 + 4)
    # position 2 overlaps frame0[2:] with frame1[:2]
    expect = np.zeros(8, np.float32)
    for f in range(3):
        expect[f * 2 : f * 2 + 4] += np.arange(12).reshape(3, 4)[f]
    np.testing.assert_allclose(np.asarray(out[0]), expect)


def test_svoice_e2e_model_grad():
    cfg = EnhConfig(
        num_spk=2, separator_type="svoice", svoice_enc_dim=32,
        svoice_kernel=4, svoice_hidden=8, svoice_layers=2,
        svoice_segment=10, loss_type="si_snr",
    )
    model = EnhancementModel(cfg)
    n = 800
    mix = jax.random.normal(jax.random.PRNGKey(2), (2, n))
    refs = jax.random.normal(jax.random.PRNGKey(3), (2, 2, n))
    lens = jnp.array([n, n])
    vars_ = model.init(jax.random.PRNGKey(0), mix, lens, refs)

    def loss_fn(params):
        loss, stats = model.apply({"params": params}, mix, lens, refs, False)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)
