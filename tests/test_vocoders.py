"""Vocoder zoo: PQMF, MelGAN / multi-band MelGAN, Parallel WaveGAN,
StyleMelGAN + GAN-step smoke.

Reference analogue: `test/espnet2/gan_tts/{melgan,parallel_wavegan,
style_melgan}/` tests (tiny configs, forward shapes, train step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _snr_db(ref, est):
    err = ref - est
    return 10 * np.log10(np.sum(ref ** 2) / max(np.sum(err ** 2), 1e-12))


def test_pqmf_near_perfect_reconstruction():
    from espnet_tpu.ops.pqmf import pqmf_analysis, pqmf_synthesis

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4096).astype(np.float32)
    for bands in (2, 4, 8):
        y = pqmf_analysis(jnp.asarray(x), bands)
        z = np.asarray(pqmf_synthesis(y, bands))
        # compensate the filterbank group delay, then compare
        snr = _snr_db(x[0, 200:3800], z[0, 200:3800])
        assert snr > 30.0, f"bands={bands}: SNR {snr:.1f} dB"


@pytest.mark.parametrize("gen_type,disc_type", [
    ("melgan", "melgan_multi"),
    ("multiband_melgan", "melgan_multi"),
    ("parallel_wavegan", "pwg"),
    ("style_melgan", "style_melgan"),
])
def test_generator_shapes_and_gan_step(gen_type, disc_type):
    from espnet_tpu.tasks.vocoder import VocoderModelConfig, VocoderTask
    from espnet_tpu.train.gan_steps import (
        GANLossWeights, GANTrainState, make_gan_train_step,
    )

    n_mels = 10
    cfg = VocoderModelConfig(
        generator_type=gen_type, discriminator_type=disc_type,
        channels=16, upsample_scales=(4, 2) if gen_type != "multiband_melgan"
        else (2, 1),
        pwg_layers=4, pwg_stacks=2, style_channels=8,
        lambda_stft=0.5 if gen_type == "parallel_wavegan" else 0.0,
    )
    gen, disc = VocoderTask.build_models(cfg, n_mels)
    if gen_type == "style_melgan":
        gen = gen.clone(block_upsamples=(2, 2, 2))  # upsample 8
    up = gen.upsample_factor
    mel_frames = 16
    seg = mel_frames * up
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, mel_frames, n_mels))
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, seg))
    gp = gen.init({"params": rng, "noise": jax.random.PRNGKey(2)}, mel)[
        "params"]
    out = gen.apply({"params": gp}, mel,
                    rngs={"noise": jax.random.PRNGKey(3)})
    assert out.shape == (2, seg, 1)
    assert np.all(np.isfinite(np.asarray(out)))
    dp = disc.init(rng, jnp.zeros((2, seg, 1)))["params"]
    tx = optax.adam(1e-4)
    state = GANTrainState.create(gp, tx, dp, tx, rng=jax.random.PRNGKey(5))
    # tiny stft resolutions fitting the short segment are exercised via
    # the mel loss config below
    step = jax.jit(make_gan_train_step(
        gen, disc, tx, tx,
        GANLossWeights(adv=1.0, feat_match=1.0, mel=1.0, stft=0.0,
                       fs=16000, n_fft=64, hop_length=up, n_mels=n_mels),
    ))
    state2, stats = step(state, mel, wav)
    for k, v in stats.items():
        assert np.isfinite(float(v)), k
    # generator params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), gp, state2.gen_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_noise_rng_changes_pwg_output():
    """Parallel WaveGAN is noise-driven: different "noise" rng keys must
    give different waveforms for the same mel."""
    from espnet_tpu.models.tts.vocoders import ParallelWaveGANGenerator

    gen = ParallelWaveGANGenerator(
        in_channels=6, layers=2, stacks=1, residual_channels=8,
        gate_channels=16, skip_channels=8, upsample_scales=(2, 2),
    )
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 6))
    p = gen.init({"params": jax.random.PRNGKey(1),
                  "noise": jax.random.PRNGKey(2)}, mel)["params"]
    a = gen.apply({"params": p}, mel, rngs={"noise": jax.random.PRNGKey(3)})
    b = gen.apply({"params": p}, mel, rngs={"noise": jax.random.PRNGKey(4)})
    assert float(jnp.max(jnp.abs(a - b))) > 1e-6


def test_multi_resolution_stft_loss_discriminates():
    from espnet_tpu.models.tts.vocoders import multi_resolution_stft_loss

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(2, 2048).astype(np.float32))
    x_same = y
    x_noise = jnp.asarray(rng.randn(2, 2048).astype(np.float32))
    res = ((256, 64, 256), (512, 128, 512))
    l_same = float(multi_resolution_stft_loss(x_same, y, res))
    l_noise = float(multi_resolution_stft_loss(x_noise, y, res))
    assert l_same < 1e-4
    assert l_noise > l_same + 0.1
