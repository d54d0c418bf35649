"""DPCL-E2E separator (`dpcl_e2e_separator.py:11` spec): mask simplex,
soft-kmeans behavior, complex-pair application, e2e gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.enh.model import EnhancementModel, EnhConfig


def test_dpcl_e2e_masks_sum_to_one():
    from espnet_tpu.models.enh.dpcl_e2e import DPCLE2ESeparator

    f = 9
    sep = DPCLE2ESeparator(input_dim=f, num_spk=2, unit=16, emb_dim=8,
                           kmeans_iters=4)
    feat = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (2, 10, f)))
    lens = jnp.array([10, 7])
    vars_ = sep.init(jax.random.PRNGKey(1), feat, lens)
    masked, olens, others = sep.apply(vars_, feat, lens)
    assert masked.shape == (2, 2, 10, f)
    m1 = np.asarray(others["mask_spk1"])
    m2 = np.asarray(others["mask_spk2"])
    # enhancement masks are a softmax over sources: sum to 1, in [0, 1]
    np.testing.assert_allclose(m1 + m2, np.ones_like(m1), atol=1e-5)
    assert (m1 >= 0).all() and (m1 <= 1).all()
    # masked = mask * magnitude feature
    np.testing.assert_allclose(
        np.asarray(masked[:, 0]), m1 * np.asarray(feat), rtol=1e-5, atol=1e-6)


def test_dpcl_e2e_complex_pairs_and_noise():
    from espnet_tpu.models.enh.dpcl_e2e import DPCLE2ESeparator

    f = 7
    sep = DPCLE2ESeparator(input_dim=2 * f, num_spk=2, predict_noise=True,
                           unit=16, emb_dim=8, kmeans_iters=3,
                           complex_pairs=True)
    feat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 2 * f))
    lens = jnp.array([8])
    vars_ = sep.init(jax.random.PRNGKey(3), feat, lens)
    masked, _, others = sep.apply(vars_, feat, lens)
    assert masked.shape == (1, 2, 8, 2 * f)
    assert "noise1" in others
    # same real mask applied to both re and im parts
    m = np.asarray(others["mask_spk1"])
    re = np.asarray(feat[..., :f])
    np.testing.assert_allclose(
        np.asarray(masked[:, 0, :, :f]), m * re, rtol=1e-5, atol=1e-6)


def test_soft_kmeans_converges_on_separated_clusters():
    from espnet_tpu.models.enh.dpcl_e2e import DPCLE2ESeparator

    # two well-separated clusters in embedding space -> gamma ~ one-hot
    rng = np.random.RandomState(0)
    a = rng.randn(30, 4) * 0.05 + np.array([2.0, 0, 0, 0])
    b_ = rng.randn(30, 4) * 0.05 + np.array([-2.0, 0, 0, 0])
    v = jnp.asarray(np.concatenate([a, b_])[None], jnp.float32)

    def run(v):
        centers = v[:, :2, :]

        def step(c, _):
            d = jnp.sum((v[:, :, None, :] - c[:, None, :, :]) ** 2, axis=-1)
            gamma = jax.nn.softmax(-5.0 * d, axis=-1)
            w = jnp.sum(gamma, axis=1)[:, :, None]
            return jnp.einsum("bnk,bnd->bkd", gamma, v) / (w + 1e-8), gamma

        _, gammas = jax.lax.scan(step, centers, None, length=10)
        return gammas[-1]

    gamma = np.asarray(run(v))[0]
    labels = gamma.argmax(-1)
    assert (labels[:30] == labels[0]).all()
    assert (labels[30:] == labels[30]).all()
    assert labels[0] != labels[30]
    assert gamma.max(-1).min() > 0.95


def test_dpcl_e2e_model_grad():
    cfg = EnhConfig(
        num_spk=2, encoder_type="stft", n_fft=32, hop_length=16,
        separator_type="dpcl_e2e", rnn_layers=1, rnn_hidden=16,
        dan_emb_dim=4, dpcl_kmeans_iters=3, loss_type="si_snr",
    )
    model = EnhancementModel(cfg)
    n = 320
    mix = jax.random.normal(jax.random.PRNGKey(4), (2, n))
    refs = jax.random.normal(jax.random.PRNGKey(5), (2, 2, n))
    lens = jnp.array([n, n])
    vars_ = model.init(jax.random.PRNGKey(0), mix, lens, refs)

    def loss_fn(params):
        loss, stats = model.apply({"params": params}, mix, lens, refs, False)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
