"""HiFiGAN generator/discriminator/losses + one GAN step."""

import jax
import jax.numpy as jnp
import numpy as np


def test_generator_upsamples():
    from espnet_tpu.models.tts.hifigan import HiFiGANGenerator

    gen = HiFiGANGenerator(in_channels=10, channels=32,
                           upsample_scales=(4, 2), resblock_kernel_sizes=(3,),
                           resblock_dilations=((1, 3),))
    mel = jnp.zeros((2, 16, 10))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 16 * 8, 1)
    assert gen.upsample_factor == 8
    assert float(jnp.max(jnp.abs(wav))) <= 1.0


def test_discriminator_outputs():
    from espnet_tpu.models.tts.hifigan import HiFiGANMultiDiscriminator

    disc = HiFiGANMultiDiscriminator(periods=(2, 3), scales=2)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 1))
    params = disc.init(jax.random.PRNGKey(1), wav)
    outs = disc.apply(params, wav)
    assert len(outs) == 4  # 2 scales + 2 periods
    for score, feats in outs:
        assert score.ndim == 2 and len(feats) >= 4


def test_gan_train_step_improves_disc():
    import optax

    from espnet_tpu.models.tts.hifigan import (
        HiFiGANGenerator, HiFiGANMultiDiscriminator,
    )
    from espnet_tpu.train.gan_steps import (
        GANLossWeights, GANTrainState, make_gan_train_step,
    )

    gen = HiFiGANGenerator(in_channels=8, channels=16,
                           upsample_scales=(4, 2), resblock_kernel_sizes=(3,),
                           resblock_dilations=((1, 3),))
    disc = HiFiGANMultiDiscriminator(periods=(2,), scales=1)
    seg, hop, n_mels = 256, 8, 8
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, seg // hop, n_mels))
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, seg)) * 0.3
    gp = gen.init(rng, mel)["params"]
    dp = disc.init(rng, wav[:, :, None])["params"]
    tx = optax.adam(1e-3)
    state = GANTrainState.create(gp, tx, dp, tx)
    step = jax.jit(make_gan_train_step(
        gen, disc, tx, tx,
        GANLossWeights(mel=5.0, n_fft=64, hop_length=hop, n_mels=n_mels),
    ))
    losses = []
    for _ in range(5):
        state, stats = step(state, mel, wav)
        losses.append(float(stats["discriminator_loss"]))
        assert np.isfinite(float(stats["loss"]))
    # discriminator should be learning to separate real/fake
    assert losses[-1] < losses[0]
