"""Global style tokens: style encoder + Tacotron2-GST integration."""

import jax
import jax.numpy as jnp
import numpy as np


def test_style_encoder_shapes():
    from espnet_tpu.models.tts.gst import StyleEncoder

    enc = StyleEncoder(num_tokens=4, token_dim=16, num_heads=2, gru_units=8)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (3, 50, 20))
    params = enc.init(rng, mel)
    style = enc.apply(params, mel)
    assert style.shape == (3, 16)
    # different references -> different styles
    style2 = enc.apply(params, mel * 2.0 + 1.0)
    assert float(jnp.max(jnp.abs(style - style2))) > 1e-4


def test_tacotron2_gst():
    from espnet_tpu.models.tts.tacotron2 import Tacotron2, Tacotron2Config

    cfg = Tacotron2Config(
        vocab_size=10, n_mels=12, embed_dim=16, encoder_conv_layers=1,
        encoder_conv_channels=16, encoder_lstm_units=16, prenet_layers=1,
        prenet_units=8, decoder_lstm_units=16, decoder_lstm_layers=1,
        att_dim=8, att_conv_channels=4, att_conv_kernel=5, postnet_layers=2,
        postnet_channels=8, reduction_factor=2, max_frames=16,
        dropout_rate=0.0, zoneout_rate=0.0, use_gst=True, gst_tokens=3,
        gst_heads=2,
    )
    model = Tacotron2(cfg)
    rng = jax.random.PRNGKey(0)
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    mel = jax.random.normal(rng, (2, 16, 12))
    mlens = jnp.array([16, 12])
    params = model.init({"params": rng, "dropout": rng}, text, tlens, mel,
                        mlens, True)
    loss, stats, _ = model.apply(params, text, tlens, mel, mlens, True)
    assert np.isfinite(float(loss))
    out, lens, _ = model.apply(params, text, tlens, 16, mel,
                               method=Tacotron2.inference)
    assert out.shape[2] == 12
    assert bool(jnp.all(jnp.isfinite(out)))
