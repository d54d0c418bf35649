"""TTS model tests: tiny Tacotron2 / FastSpeech2 forward/backward +
inference shapes + Griffin-Lim roundtrip sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.fastspeech2 import (
    FastSpeech2, FastSpeech2Config, length_regulate,
)
from espnet_tpu.models.tts.tacotron2 import Tacotron2, Tacotron2Config


def _tts_batch(b=2, u=6, t=24, n_mels=10, vocab=15, seed=0):
    rng = np.random.RandomState(seed)
    text = jnp.asarray(rng.randint(1, vocab - 1, (b, u)).astype(np.int32))
    tlens = jnp.asarray([u, u - 2])
    mel = jnp.asarray(rng.randn(b, t, n_mels).astype(np.float32))
    mlens = jnp.asarray([t, t - 8])
    return text, tlens, mel, mlens


def test_length_regulate():
    hs = jnp.arange(2 * 3 * 1, dtype=jnp.float32).reshape(2, 3, 1)
    dur = jnp.asarray([[2, 1, 3], [1, 0, 2]])
    out, lens = length_regulate(hs, dur, 8)
    np.testing.assert_array_equal(np.asarray(lens), [6, 3])
    got = np.asarray(out)[0, :, 0]
    np.testing.assert_array_equal(got[:6], [0, 0, 1, 2, 2, 2])
    assert np.all(got[6:] == 0)
    got1 = np.asarray(out)[1, :, 0]
    np.testing.assert_array_equal(got1[:3], [3, 5, 5])


def test_fastspeech2_forward_backward_inference():
    b, u, t, n_mels, vocab = 2, 6, 24, 10, 15
    text, tlens, mel, mlens = _tts_batch(b, u, t, n_mels, vocab)
    rng = np.random.RandomState(1)
    # durations summing to mel lengths
    dur = np.zeros((b, u), np.int32)
    for i, (ul, ml) in enumerate([(u, t), (u - 2, t - 8)]):
        d = np.random.RandomState(i).multinomial(ml - ul, np.ones(ul) / ul) + 1
        dur[i, :ul] = d
    pitch = jnp.asarray(rng.randn(b, u).astype(np.float32))
    energy = jnp.asarray(rng.randn(b, u).astype(np.float32))
    cfg = FastSpeech2Config(
        vocab_size=vocab, n_mels=n_mels, d_model=16, num_heads=2, d_ff=32,
        encoder_layers=1, decoder_layers=1, predictor_channels=8,
        postnet_layers=2, postnet_channels=8, max_frames=32,
        dropout_rate=0.0,
    )
    model = FastSpeech2(cfg)
    args = (text, tlens, mel, mlens, jnp.asarray(dur), pitch, energy, True)
    params = model.init(jax.random.PRNGKey(0), *args)

    def loss_fn(p):
        loss, stats, _ = model.apply(p, *args)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"l1_loss", "duration_loss", "pitch_loss", "energy_loss"} <= set(stats)
    gn = jax.tree_util.tree_reduce(lambda a, g: a + float(jnp.sum(g * g)), grads, 0.0)
    assert np.isfinite(gn) and gn > 0

    mel_out, lens = model.apply(params, text, tlens,
                                method=FastSpeech2.inference)
    assert mel_out.shape == (b, cfg.max_frames, n_mels)
    assert np.all(np.asarray(lens) <= cfg.max_frames)


def test_tacotron2_forward_backward_inference():
    b, u, t, n_mels, vocab = 2, 6, 12, 10, 15
    text, tlens, mel, mlens = _tts_batch(b, u, t, n_mels, vocab)
    cfg = Tacotron2Config(
        vocab_size=vocab, n_mels=n_mels, embed_dim=16,
        encoder_conv_layers=1, encoder_conv_channels=16,
        encoder_lstm_units=16, prenet_layers=1, prenet_units=8,
        decoder_lstm_units=16, decoder_lstm_layers=1, att_dim=8,
        att_conv_channels=4, att_conv_kernel=5, postnet_layers=2,
        postnet_channels=8, reduction_factor=2, max_frames=16,
        dropout_rate=0.1,
    )
    model = Tacotron2(cfg)
    args = (text, tlens, mel, mlens, True)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args,
    )

    def loss_fn(p):
        loss, stats, _ = model.apply(
            p, *args, rngs={"dropout": jax.random.PRNGKey(2)}
        )
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    assert np.isfinite(float(loss))
    assert {"l1_loss", "mse_loss", "bce_loss", "attn_loss"} <= set(stats)
    gn = jax.tree_util.tree_reduce(lambda a, g: a + float(jnp.sum(g * g)), grads, 0.0)
    assert np.isfinite(gn) and gn > 0

    mel_out, lens, att = model.apply(
        params, text, tlens, rngs={"dropout": jax.random.PRNGKey(3)},
        method=Tacotron2.inference,
    )
    assert mel_out.shape == (b, cfg.max_frames, n_mels)
    assert att.shape[0] == b and att.shape[2] == u
    # attention rows are normalized
    np.testing.assert_allclose(np.asarray(att).sum(-1), 1.0, atol=1e-4)


def test_griffin_lim_roundtrip():
    """STFT magnitude of a real signal -> griffin-lim -> similar magnitude."""
    from espnet_tpu.ops.griffin_lim import griffin_lim
    from espnet_tpu.ops.stft import power_spectrum, stft

    fs = 16000
    t_ax = np.arange(4096) / fs
    wav = (0.6 * np.sin(2 * np.pi * 440 * t_ax)).astype(np.float32)[None]
    real, imag = stft(jnp.asarray(wav), 512, 128)
    mag = jnp.sqrt(power_spectrum(real, imag))
    rec = griffin_lim(mag, 512, 128, n_iter=32, length=4096)
    r2, i2 = stft(rec, 512, 128)
    mag2 = jnp.sqrt(power_spectrum(r2, i2))
    # interior frames converge; boundary frames are edge-limited (inherent
    # to GL with center-padded frames)
    err = float(
        jnp.mean(jnp.abs(mag2 - mag)[:, 8:-8]) / jnp.mean(mag[:, 8:-8])
    )
    assert err < 0.15, err
