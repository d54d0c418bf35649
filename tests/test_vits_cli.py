"""VITS task CLI: tiny end-to-end train + synth."""

from pathlib import Path

import pytest

from espnet_tpu.data.synth import generate_corpus


def test_vits_train_and_inference_cli(tmp_path):
    from espnet_tpu.bin.vits_inference import main as vi_main
    from espnet_tpu.bin.vits_train import main as vt_main

    generate_corpus(tmp_path / "data", n_utts=4, min_words=2, max_words=2)
    vt_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.n_fft", "256", "--data.hop_length", "64",
        "--data.batch_size", "2", "--data.max_seconds", "1.0",
        "--data.steps_per_epoch", "2",
        "--model.channels", "16", "--model.text_heads", "2",
        "--model.text_d_ff", "32", "--model.text_layers", "1",
        "--model.posterior_layers", "2", "--model.flows", "2",
        "--model.flow_layers", "1", "--model.decoder_channels", "16",
        "--model.upsample_scales", "[8,4,2]",
        "--model.resblock_kernel_sizes", "[3]",
        "--model.segment_frames", "8",
        "--model.dropout_rate", "0.0",
    ])
    exp = tmp_path / "exp"
    assert (exp / "generator.msgpack").exists()
    vi_main([
        "--exp_dir", str(exp),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "synth"),
        "--max_frames", "64", "--batch_size", "4",
    ])
    wavs = list((tmp_path / "synth" / "wav").glob("*.wav"))
    assert len(wavs) == 4
