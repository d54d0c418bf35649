"""Transformer-TTS model + CLI smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.transformer_tts import (
    TransformerTTS, TransformerTTSConfig,
)


def _cfg(**kw):
    base = dict(
        vocab_size=12, n_mels=10, d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=1, num_decoder_layers=1, prenet_units=8,
        prenet_layers=1, postnet_layers=2, postnet_channels=8,
        reduction_factor=2, dropout_rate=0.0, max_frames=32,
    )
    base.update(kw)
    return TransformerTTSConfig(**base)


def test_forward_backward():
    model = TransformerTTS(_cfg())
    rng = jax.random.PRNGKey(0)
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    mel = jax.random.normal(rng, (2, 16, 10))
    mlens = jnp.array([16, 12])
    params = model.init({"params": rng, "prenet": rng, "dropout": rng},
                        text, tlens, mel, mlens, False)
    (loss, stats, mel_post), _ = model.apply(
        params, text, tlens, mel, mlens, False,
        rngs={"prenet": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(11)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(loss))
    assert mel_post.shape == mel.shape
    g = jax.grad(
        lambda p: model.apply(p, text, tlens, mel, mlens, False,
                              rngs={"prenet": jax.random.PRNGKey(2),
                                    "dropout": jax.random.PRNGKey(12)},
                              mutable=["batch_stats"])[0][0]
    )(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0)
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_ar_inference():
    model = TransformerTTS(_cfg())
    rng = jax.random.PRNGKey(0)
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    mel = jax.random.normal(rng, (2, 16, 10))
    mlens = jnp.array([16, 12])
    params = model.init({"params": rng, "prenet": rng, "dropout": rng},
                        text, tlens, mel, mlens, False)
    out, lens = jax.jit(
        lambda p, t, tl: model.apply(p, t, tl, 32,
                                     method=TransformerTTS.inference)
    )(params, text, tlens)
    assert out.shape == (2, 32, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.all(lens > 0))


def test_tts_model_with_transformer(tmp_path):
    from espnet_tpu.bin.tts_train import main
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=4, min_words=2, max_words=2)
    main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "train.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.batch_size", "4",
        "--model.tts_type", "transformer",
        "--model.n_fft", "512", "--model.hop_length", "128",
        "--model.n_mels", "20", "--model.fmin", "0", "--model.fmax", "none",
        "--model.transformer.d_model", "16",
        "--model.transformer.num_heads", "2",
        "--model.transformer.d_ff", "32",
        "--model.transformer.num_encoder_layers", "1",
        "--model.transformer.num_decoder_layers", "1",
        "--model.transformer.prenet_units", "8",
        "--model.transformer.prenet_layers", "1",
        "--model.transformer.postnet_layers", "2",
        "--model.transformer.postnet_channels", "8",
        "--model.transformer.reduction_factor", "2",
        "--model.transformer.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.001",
    ])
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
