"""Enhancement task CLI integration: synth mixtures -> train -> separate.

Reference analogue: `egs2/TEMPLATE/enh1` driven end-to-end
(`espnet2/bin/enh_train.py` + `espnet2/bin/enh_inference.py`)."""

from pathlib import Path

import pytest

from espnet_tpu.data.synth import generate_mixture_corpus


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("enh_ws")
    generate_mixture_corpus(root / "data" / "train", n_utts=8)
    generate_mixture_corpus(root / "data" / "test", n_utts=3, seed=5)
    return root


def test_enh_train_cli(workspace):
    from espnet_tpu.bin.enh_train import main

    main([
        "--run.output_dir", str(workspace / "exp"),
        "--run.max_epoch", "1",
        "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(workspace / "data" / "train"),
        "--data.valid_dir", str(workspace / "data" / "train"),
        "--data.batch_size", "4",
        "--model.enc_channels", "16",
        "--model.enc_kernel", "16",
        "--model.enc_stride", "8",
        "--model.separator_type", "tcn",
        "--model.tcn_layers", "2",
        "--model.tcn_stacks", "1",
        "--model.tcn_bottleneck", "8",
        "--model.tcn_hidden", "16",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant",
        "--optim.lr", "0.001",
    ])
    exp = workspace / "exp"
    assert (exp / "config.yaml").exists()
    assert (exp / "checkpoint.msgpack").exists()


def test_enh_inference_cli(workspace):
    from espnet_tpu.bin.enh_inference import main

    outdir = workspace / "separated"
    main([
        "--exp_dir", str(workspace / "exp"),
        "--data_dir", str(workspace / "data" / "test"),
        "--output_dir", str(outdir),
        "--batch_size", "3",
    ])
    assert (outdir / "spk1.scp").exists()
    assert (outdir / "spk2.scp").exists()
    assert (outdir / "si_snr.txt").exists()
    wavs = list((outdir / "wav").glob("*.wav"))
    assert len(wavs) == 6  # 3 utts x 2 speakers


def test_enh_train_cli_ci_sdr(workspace):
    """Non-default criterion selected purely via --model.loss_type: the
    ops/enh_losses.py zoo is reachable from bin/enh_train.py flags
    (reference: criterion lists in `espnet2/tasks/enh.py`)."""
    from espnet_tpu.bin.enh_train import main

    main([
        "--run.output_dir", str(workspace / "exp_cisdr"),
        "--run.max_epoch", "1",
        "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(workspace / "data" / "train"),
        "--data.valid_dir", str(workspace / "data" / "train"),
        "--data.batch_size", "4",
        "--model.enc_channels", "16",
        "--model.enc_kernel", "16",
        "--model.enc_stride", "8",
        "--model.separator_type", "tcn",
        "--model.tcn_layers", "2",
        "--model.tcn_stacks", "1",
        "--model.tcn_bottleneck", "8",
        "--model.tcn_hidden", "16",
        "--model.dropout_rate", "0.0",
        "--model.loss_type", "ci_sdr",
        "--model.ci_sdr_filter_length", "32",
        "--optim.schedule", "constant",
        "--optim.lr", "0.001",
    ])
    import yaml

    exp = workspace / "exp_cisdr"
    assert (exp / "checkpoint.msgpack").exists()
    cfg = yaml.safe_load((exp / "config.yaml").read_text())
    assert cfg["model"]["loss_type"] == "ci_sdr"


def test_enh_train_cli_chunk_iterator(workspace):
    """iterator_type=chunk trains on fixed-length windows (reference
    `espnet2/tasks/abs_task.py:1589` build_chunk_iter_factory +
    `chunk_iter_factory.py:13`), giving every train batch one static shape."""
    from espnet_tpu.bin.enh_train import main

    main([
        "--run.output_dir", str(workspace / "exp_chunk"),
        "--run.max_epoch", "1",
        "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(workspace / "data" / "train"),
        "--data.valid_dir", str(workspace / "data" / "train"),
        "--data.batch_size", "4",
        "--data.iterator_type", "chunk",
        "--data.chunk_length", "2048",
        "--model.enc_channels", "16",
        "--model.enc_kernel", "16",
        "--model.enc_stride", "8",
        "--model.separator_type", "tcn",
        "--model.tcn_layers", "2",
        "--model.tcn_stacks", "1",
        "--model.tcn_bottleneck", "8",
        "--model.tcn_hidden", "16",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant",
        "--optim.lr", "0.001",
    ])
    assert (workspace / "exp_chunk" / "checkpoint.msgpack").exists()
