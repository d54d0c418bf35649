"""Attention-heatmap dumps + gated wandb logger
(reference `espnet2/train/trainer.py:787` plot_attention and the
--use_wandb flag at `espnet2/tasks/abs_task.py:1305`)."""

import numpy as np

import jax
import jax.numpy as jnp

from espnet_tpu.train.plot import collect_attention_maps, dump_attention_plots


def _asr_model_and_batch():
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(vocab_size=12, d_model=16, num_heads=2, d_ff=32,
                    num_encoder_layers=1, num_decoder_layers=1,
                    decoder_d_ff=32, n_mels=8, use_specaug=False,
                    normalize="utterance_mvn", encoder_type="transformer")
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32)),
        "speech_lengths": jnp.asarray([1600, 1200], jnp.int32),
        "text": jnp.asarray(rng.randint(1, 11, (2, 3)).astype(np.int32)),
        "text_lengths": jnp.asarray([3, 2], jnp.int32),
        "keys": ["uttA", "uttB"],
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"],
    )
    return model, variables, batch


def test_attention_capture_asr():
    model, variables, batch = _asr_model_and_batch()
    maps = collect_attention_maps(
        model, variables, batch,
        ("speech", "speech_lengths", "text", "text_lengths"))
    # decoder self + cross attention (and encoder) sown via MHA
    assert maps, "no attention maps captured"
    for name, arr in maps.items():
        assert arr.ndim == 3 and arr.shape[0] == 2, name
        # rows are softmax distributions
        np.testing.assert_allclose(arr[0].sum(-1), 1.0, atol=1e-3)


def test_dump_attention_plots_asr(tmp_path):
    model, variables, batch = _asr_model_and_batch()
    n = dump_attention_plots(
        model, variables, batch, tmp_path, epoch=3,
        batch_arg_names=("speech", "speech_lengths", "text", "text_lengths"))
    assert n > 0
    pngs = list((tmp_path / "att_ws" / "ep3").glob("*.png"))
    assert len(pngs) == n
    assert any("uttA" in p.name for p in pngs)


def test_dump_attention_plots_tacotron2(tmp_path):
    from espnet_tpu.models.tts.tacotron2 import Tacotron2, Tacotron2Config

    cfg = Tacotron2Config(
        vocab_size=11, n_mels=5, embed_dim=8, encoder_conv_layers=1,
        encoder_conv_channels=8, encoder_lstm_units=8, prenet_layers=1,
        prenet_units=4, decoder_lstm_units=8, decoder_lstm_layers=1,
        att_dim=6, att_conv_channels=2, att_conv_kernel=3, postnet_layers=2,
        postnet_channels=4, dropout_rate=0.0, use_guided_attn=False)
    model = Tacotron2(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(1, 10, (2, 4)).astype(np.int32)),
        "text_lengths": jnp.asarray([4, 3], jnp.int32),
        "mel": jnp.asarray(rng.randn(2, 6, 5).astype(np.float32)),
        "mel_lengths": jnp.asarray([6, 4], jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["text"], batch["text_lengths"], batch["mel"],
        batch["mel_lengths"],
    )
    n = dump_attention_plots(
        model, variables, batch, tmp_path, epoch=1,
        batch_arg_names=("text", "text_lengths", "mel", "mel_lengths"))
    assert n > 0
    assert list((tmp_path / "att_ws" / "ep1").glob("decoder_att*.png"))


def test_wandb_logger_noop():
    from espnet_tpu.train.reporter import WandbLogger

    wl = WandbLogger(enabled=False)
    wl.log_epoch(1, "train", {"loss": 1.0})
    wl.close()
    # enabled without wandb installed -> warn + disable, never raise
    wl2 = WandbLogger(enabled=True, project="x")
    wl2.log_epoch(1, "train", {"loss": 1.0})
    wl2.close()
