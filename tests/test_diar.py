"""Diarization family: PIT BCE, DER stats, model, task CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.diar import (
    DiarConfig, DiarizationModel, diarization_error_stats, pit_bce_loss,
)


def test_pit_bce_permutation_invariance():
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (3, 20, 2)) * 3
    labels = (jax.random.uniform(jax.random.PRNGKey(1), (3, 20, 2)) > 0.5
              ).astype(jnp.float32)
    lens = jnp.array([20, 15, 10])
    l1, p1 = pit_bce_loss(logits, labels, lens)
    l2, p2 = pit_bce_loss(logits, labels[..., ::-1], lens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def test_der_zero_when_perfect():
    labels = (jax.random.uniform(jax.random.PRNGKey(0), (2, 30, 2)) > 0.5
              ).astype(jnp.float32)
    logits = (labels - 0.5) * 20.0  # confident correct predictions
    lens = jnp.array([30, 20])
    stats = diarization_error_stats(logits, labels, lens)
    assert float(stats["der"]) == 0.0
    assert float(stats["frame_acc"]) == 1.0


def test_model_forward_backward():
    cfg = DiarConfig(
        num_spk=2, input_type="raw", fs=16000, n_fft=256, hop_length=128,
        n_mels=12, d_model=16, num_heads=2, d_ff=32, num_encoder_layers=1,
        dropout_rate=0.0,
    )
    model = DiarizationModel(cfg)
    rng = jax.random.PRNGKey(0)
    n = 8000
    speech = jax.random.normal(rng, (2, n)) * 0.3
    lens = jnp.array([n, n // 2])
    labels = (jax.random.uniform(jax.random.PRNGKey(1), (2, n, 2)) > 0.7
              ).astype(jnp.float32)
    params = model.init(rng, speech, lens, labels, True)
    loss, stats = model.apply(params, speech, lens, labels, True)
    assert np.isfinite(float(loss))
    assert "der" in stats
    g = jax.grad(lambda p: model.apply(p, speech, lens, labels, True)[0])(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_diar_cli(tmp_path):
    from espnet_tpu.bin.diar_inference import main as di_main
    from espnet_tpu.bin.diar_train import main as dt_main
    from espnet_tpu.data.synth import generate_diar_corpus

    generate_diar_corpus(tmp_path / "data", n_utts=6, dur=2.0)
    dt_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.valid_dir", str(tmp_path / "data"),
        "--data.batch_size", "3",
        "--model.n_fft", "256", "--model.n_mels", "12",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
    di_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "dec"),
        "--batch_size", "3",
    ])
    assert (tmp_path / "dec" / "rttm").exists()
    assert (tmp_path / "dec" / "der.txt").exists()


def test_model_with_eda_attractor():
    """EDA branch (`espnet2/diar/attractor/rnn_attractor.py`): attractor
    existence loss present, gradients reach the attractor RNNs."""
    cfg = DiarConfig(
        num_spk=2, input_type="raw", fs=16000, n_fft=256, hop_length=128,
        n_mels=12, d_model=16, num_heads=2, d_ff=32, num_encoder_layers=1,
        dropout_rate=0.0, use_attractor=True,
    )
    model = DiarizationModel(cfg)
    rng = jax.random.PRNGKey(0)
    n = 8000
    speech = jax.random.normal(rng, (2, n)) * 0.3
    lens = jnp.array([n, n // 2])
    labels = (jax.random.uniform(jax.random.PRNGKey(1), (2, n, 2)) > 0.7
              ).astype(jnp.float32)
    params = model.init(rng, speech, lens, labels, True)
    loss, stats = model.apply(params, speech, lens, labels, True)
    assert np.isfinite(float(loss))
    assert "attractor_loss" in stats and "der" in stats
    g = jax.grad(lambda p: model.apply(p, speech, lens, labels, True)[0])(params)
    g_att = g["params"]["attractor"]
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g_att, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0
    # inference path produces per-frame logits of the right shape
    logits, elens = model.apply(
        params, speech, lens, method=DiarizationModel.activity_logits
    )
    assert logits.shape[-1] == 2
