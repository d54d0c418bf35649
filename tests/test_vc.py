"""Voice conversion: model forward/inference + task CLI."""

import jax
import jax.numpy as jnp
import numpy as np


def test_vc_model_forward_and_inference():
    from espnet_tpu.models.tts.tacotron2 import Tacotron2Config
    from espnet_tpu.models.tts.vc import VCModel, VCTaskConfig

    t2 = Tacotron2Config(
        vocab_size=1, n_mels=16, input_type="feats", input_dim=16,
        embed_dim=16, encoder_conv_layers=1, encoder_conv_channels=16,
        encoder_lstm_units=16, prenet_layers=1, prenet_units=8,
        decoder_lstm_units=16, decoder_lstm_layers=1, att_dim=8,
        att_conv_channels=4, att_conv_kernel=5, postnet_layers=2,
        postnet_channels=8, reduction_factor=2, max_frames=32,
        dropout_rate=0.0, zoneout_rate=0.0,
    )
    model = VCModel(VCTaskConfig(n_fft=256, hop_length=128, n_mels=16,
                                 fmin=0, fmax=None, tacotron2=t2))
    rng = jax.random.PRNGKey(0)
    n = 6000
    src = jax.random.normal(rng, (2, n)) * 0.1
    tgt = jax.random.normal(jax.random.PRNGKey(1), (2, n)) * 0.1
    lens = jnp.array([n, n // 2])
    params = model.init({"params": rng, "dropout": rng}, src, lens, tgt,
                        lens, True)
    loss, stats = model.apply(params, src, lens, tgt, lens, True)
    assert np.isfinite(float(loss))
    mel, out_lens = model.apply(params, src, lens, 32,
                                method=VCModel.inference)
    assert mel.shape[2] == 16
    assert bool(jnp.all(jnp.isfinite(mel)))


def test_vc_cli(tmp_path):
    from espnet_tpu.bin.vc_train import main
    from espnet_tpu.data.synth import generate_vc_corpus

    generate_vc_corpus(tmp_path / "data", n_utts=4)
    main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "train.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.batch_size", "2",
        "--model.n_fft", "256", "--model.hop_length", "128",
        "--model.n_mels", "16", "--model.fmin", "0", "--model.fmax", "none",
        "--model.tacotron2.embed_dim", "16",
        "--model.tacotron2.encoder_conv_layers", "1",
        "--model.tacotron2.encoder_conv_channels", "16",
        "--model.tacotron2.encoder_lstm_units", "16",
        "--model.tacotron2.prenet_layers", "1",
        "--model.tacotron2.prenet_units", "8",
        "--model.tacotron2.decoder_lstm_units", "16",
        "--model.tacotron2.decoder_lstm_layers", "1",
        "--model.tacotron2.att_dim", "8",
        "--model.tacotron2.att_conv_channels", "4",
        "--model.tacotron2.att_conv_kernel", "5",
        "--model.tacotron2.postnet_layers", "2",
        "--model.tacotron2.postnet_channels", "8",
        "--model.tacotron2.reduction_factor", "2",
        "--model.tacotron2.max_frames", "64",
        "--model.tacotron2.dropout_rate", "0.0",
        "--model.tacotron2.zoneout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.001",
    ])
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()


def test_transformer_vc_forward_inference():
    """Voice Transformer Network: transformer VC variant
    (`espnet/nets/pytorch_backend/e2e_vc_transformer.py:1`)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from espnet_tpu.models.tts.transformer_tts import TransformerTTSConfig
    from espnet_tpu.models.tts.vc import VCModel, VCTaskConfig

    cfg = VCTaskConfig(
        n_fft=256, hop_length=128, n_mels=10, fmin=0.0, fmax=None,
        vc_type="transformer",
        transformer=TransformerTTSConfig(
            input_type="feats", input_dim=10, n_mels=10, d_model=16,
            num_heads=2, d_ff=32, num_encoder_layers=1,
            num_decoder_layers=1, prenet_units=8, prenet_layers=1,
            postnet_layers=2, postnet_channels=8, dropout_rate=0.0,
            max_frames=32),
    )
    model = VCModel(cfg)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(2, 2000).astype(np.float32))
    src_l = jnp.asarray([2000, 1500], jnp.int32)
    tgt = jnp.asarray(rng.randn(2, 2200).astype(np.float32))
    tgt_l = jnp.asarray([2200, 1800], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, src, src_l, tgt, tgt_l)
    (loss, stats), _ = model.apply(
        variables, src, src_l, tgt, tgt_l, False,
        rngs={"prenet": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    mel, lens = model.apply(variables, src, src_l, 32,
                            method=VCModel.inference)
    assert mel.shape[0] == 2 and mel.shape[-1] == 10
