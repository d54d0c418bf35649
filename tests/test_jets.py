"""JETS: alignment module, forward-sum loss, Gaussian upsampling,
generator forward, tiny end-to-end CLI.

Reference analogue: `test/espnet2/gan_tts/jets/test_jets.py` (tiny config
train/inference) plus analytic checks of the alignment pieces.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.data.synth import generate_corpus


def test_forward_sum_prefers_monotonic_alignment():
    from espnet_tpu.models.tts.jets import forward_sum_loss

    b, t, u = 1, 12, 4
    tl = jnp.array([u])
    fl = jnp.array([t])
    # sharply monotonic alignment: token i owns frames [3i, 3i+3)
    good = np.full((b, t, u), -10.0, np.float32)
    for f in range(t):
        good[0, f, min(f // 3, u - 1)] = 0.0
    uniform = np.full((b, t, u), -np.log(u), np.float32)
    l_good = float(forward_sum_loss(jnp.asarray(good), tl, fl))
    l_unif = float(forward_sum_loss(jnp.asarray(uniform), tl, fl))
    assert l_good < l_unif


def test_gaussian_upsample_replicates_tokens():
    from espnet_tpu.models.tts.jets import gaussian_upsample

    hs = jnp.asarray(np.eye(3, dtype=np.float32)[None])  # (1, 3, 3) one-hot
    ds = jnp.asarray([[2.0, 3.0, 1.0]])
    tmask = jnp.ones((1, 3), bool)
    out = gaussian_upsample(hs, ds, jnp.array([6]), 6, tmask, sigma=0.01)
    # frame index t vs centre c_u = cumsum(d) - d/2 (reference uses the raw
    # frame index, `jets/length_regulator.py`): centres [1, 3.5, 5.5] ->
    # dominant tokens [0,0,0,1,1,2]
    dominant = np.argmax(np.asarray(out[0]), axis=-1)
    np.testing.assert_array_equal(dominant, [0, 0, 0, 1, 1, 2])


def test_jets_generator_forward_and_inference():
    from espnet_tpu.models.tts.jets import JETSConfig, JETSGenerator

    cfg = JETSConfig(
        vocab_size=10, n_mels=8, adim=16, num_heads=2, d_ff=32,
        encoder_layers=1, decoder_layers=1, decoder_channels=16,
        upsample_scales=(4, 2), resblock_kernel_sizes=(3,),
        segment_frames=4, max_frames=32, dropout_rate=0.0,
    )
    gen = JETSGenerator(cfg)
    b, u, t = 2, 5, 20
    tokens = jax.random.randint(jax.random.PRNGKey(0), (b, u), 1, 10)
    tlens = jnp.array([5, 3])
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8))
    flens = jnp.array([20, 12])
    pitch = jax.random.normal(jax.random.PRNGKey(2), (b, t))
    energy = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (b, t)))
    rngs = {"params": jax.random.PRNGKey(4),
            "segment": jax.random.PRNGKey(5),
            "dropout": jax.random.PRNGKey(6)}
    params = gen.init(rngs, tokens, tlens, feats, flens, pitch, energy, True)
    out = gen.apply(params, tokens, tlens, feats, flens, pitch, energy,
                    True, rngs={"segment": jax.random.PRNGKey(7)})
    assert out["wav_seg"].shape == (b, 4 * 8)
    assert out["durations"].shape == (b, u)
    # durations from MAS must sum to the feature length per utterance
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(out["durations"], axis=1)), np.asarray(flens)
    )
    wav, wav_lens = gen.apply(
        params, tokens, tlens, method=JETSGenerator.inference
    )
    assert wav.shape == (b, 32 * 8)
    assert np.all(np.isfinite(np.asarray(wav)))


def test_jets_train_and_inference_cli(tmp_path):
    from espnet_tpu.bin.jets_inference import main as ji_main
    from espnet_tpu.bin.jets_train import main as jt_main

    generate_corpus(tmp_path / "data", n_utts=4, min_words=2, max_words=2)
    jt_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.n_fft", "256", "--data.hop_length", "64",
        "--data.n_mels", "10",
        "--data.batch_size", "2", "--data.max_seconds", "1.0",
        "--data.steps_per_epoch", "2",
        "--model.adim", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.encoder_layers", "1",
        "--model.decoder_layers", "1", "--model.decoder_channels", "16",
        "--model.upsample_scales", "[8,4,2]",
        "--model.resblock_kernel_sizes", "[3]",
        "--model.segment_frames", "8",
        "--model.dropout_rate", "0.0",
    ])
    exp = tmp_path / "exp"
    assert (exp / "generator.msgpack").exists()
    ji_main([
        "--exp_dir", str(exp),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "synth"),
        "--batch_size", "4",
    ])
    wavs = list((tmp_path / "synth" / "wav").glob("*.wav"))
    assert len(wavs) == 4
