"""UASR (wav2vec-U style): losses, GAN step, CLI.

Reference analogue: `test/espnet2/uasr/` tests (tiny generator/
discriminator forward + trainer smoke).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _cfg(vocab=6):
    from espnet_tpu.models.uasr import UASRConfig

    return UASRConfig(vocab_size=vocab, feat_dim=8, channels=16, kernel=4,
                      stride=2, disc_channels=16, disc_layers=2,
                      disc_kernel=3)


def test_generator_discriminator_shapes():
    from espnet_tpu.models.uasr import UASRDiscriminator, UASRGenerator

    cfg = _cfg()
    gen = UASRGenerator(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 8))
    lens = jnp.array([20, 14])
    p = gen.init(jax.random.PRNGKey(1), feats, lens)
    logits, out_lens, mask = gen.apply(p, feats, lens)
    assert logits.shape == (2, 10, 6)
    np.testing.assert_array_equal(np.asarray(out_lens), [10, 7])
    disc = UASRDiscriminator(cfg)
    probs = jax.nn.softmax(logits, -1)
    dp = disc.init(jax.random.PRNGKey(2), probs, mask)
    score = disc.apply(dp, probs, mask)
    assert score.shape == (2,)


def test_smoothness_and_diversity_semantics():
    from espnet_tpu.models.uasr import uasr_generator_losses

    cfg = _cfg(vocab=4)
    mask = jnp.ones((1, 8), bool)
    d0 = jnp.zeros((1,))
    # constant sequence: zero smoothness, zero entropy -> max diversity loss
    const = jax.nn.one_hot(jnp.zeros((1, 8), jnp.int32), 4)
    _, smooth_c, div_c = uasr_generator_losses(const, mask, d0, cfg)
    # alternating sequence: high smoothness, higher entropy
    alt = jax.nn.one_hot(jnp.asarray([[0, 1, 0, 1, 0, 1, 0, 1]]), 4)
    _, smooth_a, div_a = uasr_generator_losses(alt, mask, d0, cfg)
    assert float(smooth_c) < float(smooth_a)
    assert float(div_a) < float(div_c)  # more diverse = lower loss


def test_uasr_gan_step_updates_both():
    from espnet_tpu.models.uasr import (
        UASRDiscriminator, UASRGenerator, UASRModel,
    )
    from espnet_tpu.train.gan_steps import GANTrainState
    from espnet_tpu.train.uasr_steps import make_uasr_train_step

    cfg = _cfg()
    gen, disc = UASRGenerator(cfg), UASRDiscriminator(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 8))
    flens = jnp.array([20, 14])
    text = jnp.asarray([[1, 2, 3, 4, 0], [2, 3, 0, 0, 0]], jnp.int32)
    tlens = jnp.array([4, 2])
    gp = gen.init(jax.random.PRNGKey(1), feats, flens)["params"]
    probs0, _, mask0 = gen.apply({"params": gp}, feats, flens)
    dp = disc.init(jax.random.PRNGKey(2),
                   jax.nn.softmax(probs0, -1), mask0)["params"]
    tx = optax.adam(1e-3)
    state = GANTrainState.create(gp, tx, dp, tx)
    step = jax.jit(make_uasr_train_step(UASRModel(cfg), tx, tx))
    state2, stats = step(state, feats, flens, text, tlens,
                         jax.random.PRNGKey(3))
    for k, v in stats.items():
        assert np.isfinite(float(v)), k
    for name, a, b in (("gen", gp, state2.gen_params),
                       ("disc", dp, state2.disc_params)):
        diff = jax.tree_util.tree_map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)
        assert max(jax.tree_util.tree_leaves(diff)) > 0, name


def test_uasr_cli(tmp_path):
    from espnet_tpu.bin.uasr_inference import main as ui_main
    from espnet_tpu.bin.uasr_train import main as ut_main
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=6, min_words=2, max_words=3)
    ut_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.n_fft", "256", "--data.hop_length", "128",
        "--data.n_mels", "10", "--data.batch_size", "3",
        "--data.max_seconds", "2.0", "--data.steps_per_epoch", "2",
        "--model.channels", "16", "--model.disc_channels", "16",
        "--model.disc_layers", "1",
    ])
    assert (tmp_path / "exp" / "generator.msgpack").exists()
    ui_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "dec"),
    ])
    text = (tmp_path / "dec" / "text").read_text().strip().splitlines()
    assert len(text) == 6
