"""TTS pipeline CLI integration: tacotron2 train -> synth -> teacher
durations -> fastspeech2 train -> synth (the reference's tts recipe flow)."""

from pathlib import Path

import numpy as np
import pytest

from espnet_tpu.data.synth import generate_corpus

TACO_ARGS = [
    "--model.tts_type", "tacotron2",
    "--model.n_fft", "512",
    "--model.hop_length", "128",
    "--model.n_mels", "20",
    "--model.fmin", "0",
    "--model.fmax", "none",
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
    "--optim.schedule", "constant",
    "--optim.lr", "0.001",
    "--run.max_epoch", "1",
    "--run.log_interval", "1000",
]


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("tts_ws")
    generate_corpus(root / "data" / "train", n_utts=8, min_words=1, max_words=2)
    return root


def test_tacotron2_train_cli(ws):
    from espnet_tpu.bin.tts_train import main

    main([
        "--run.output_dir", str(ws / "exp_taco"),
        "--data.train_dir", str(ws / "data" / "train"),
        "--data.batch_size", "8",
        *TACO_ARGS,
    ])
    assert (ws / "exp_taco" / "checkpoint.msgpack").exists()
    assert (ws / "exp_taco" / "stats" / "feats_stats.npz").exists()


def test_tts_inference_cli(ws):
    from espnet_tpu.bin.tts_inference import main

    main([
        "--exp_dir", str(ws / "exp_taco"),
        "--data_dir", str(ws / "data" / "train"),
        "--output_dir", str(ws / "synth"),
        "--max_frames", "64",
        "--griffin_lim_iters", "4",
        "--batch_size", "4",
    ])
    wavs = list((ws / "synth" / "wav").glob("*.wav"))
    assert len(wavs) == 8
    from espnet_tpu.data.fileio import read_wav

    w, sr = read_wav(wavs[0])
    assert sr == 16000 and w.ndim == 1


def test_teacher_durations_and_fastspeech2(ws):
    from espnet_tpu.bin.tts_teacher_durations import main as dur_main

    dur_main([
        "--exp_dir", str(ws / "exp_taco"),
        "--data_dir", str(ws / "data" / "train"),
        "--batch_size", "8",
    ])
    dur_file = ws / "data" / "train" / "durations"
    assert dur_file.exists()
    from espnet_tpu.data.fileio import read_2column_text

    durs = read_2column_text(dur_file)
    assert len(durs) == 8
    # durations are token-aligned with the char tokenization of the text
    texts = read_2column_text(ws / "data" / "train" / "text")
    for k, v in durs.items():
        assert len(v.split()) == len(texts[k])  # char tokens incl. spaces

    from espnet_tpu.bin.tts_train import main as tts_main

    tts_main([
        "--run.output_dir", str(ws / "exp_fs2"),
        "--run.max_epoch", "1",
        "--run.log_interval", "1000",
        "--data.train_dir", str(ws / "data" / "train"),
        "--data.batch_size", "8",
        "--model.tts_type", "fastspeech2",
        "--model.n_fft", "512",
        "--model.hop_length", "128",
        "--model.n_mels", "20",
        "--model.fmin", "0",
        "--model.fmax", "none",
        "--model.fastspeech2.d_model", "16",
        "--model.fastspeech2.num_heads", "2",
        "--model.fastspeech2.d_ff", "32",
        "--model.fastspeech2.encoder_layers", "1",
        "--model.fastspeech2.decoder_layers", "1",
        "--model.fastspeech2.predictor_channels", "8",
        "--model.fastspeech2.postnet_layers", "2",
        "--model.fastspeech2.postnet_channels", "8",
        "--model.fastspeech2.max_frames", "128",
        "--optim.schedule", "constant",
    ])
    assert (ws / "exp_fs2" / "checkpoint.msgpack").exists()

    from espnet_tpu.bin.tts_inference import main as synth_main

    synth_main([
        "--exp_dir", str(ws / "exp_fs2"),
        "--data_dir", str(ws / "data" / "train"),
        "--output_dir", str(ws / "synth_fs2"),
        "--griffin_lim_iters", "4",
        "--batch_size", "8",
    ])
    assert len(list((ws / "synth_fs2" / "wav").glob("*.wav"))) == 8
