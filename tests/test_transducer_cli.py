"""Transducer task CLI integration: train -> decode (greedy + beam).

Reference analogue: the asr_transducer task driven end-to-end
(`espnet2/bin/asr_transducer_inference.py` on a trained
`espnet2/tasks/asr_transducer.py` experiment)."""

from pathlib import Path

import pytest

from espnet_tpu.data.synth import generate_corpus


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("rnnt_ws")
    generate_corpus(root / "data" / "train", n_utts=12, min_words=2, max_words=3)
    generate_corpus(root / "data" / "test", n_utts=3, min_words=2, max_words=3,
                    seed=7)
    return root


def test_transducer_train_cli(workspace):
    from espnet_tpu.bin.asr_transducer_train import main

    main([
        "--run.output_dir", str(workspace / "exp"),
        "--run.max_epoch", "1",
        "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(workspace / "data" / "train"),
        "--data.valid_dir", str(workspace / "data" / "train"),
        "--data.batch_size", "6",
        "--model.n_mels", "24",
        "--model.use_specaug", "false",
        "--model.encoder_type", "transformer",
        "--model.d_model", "32",
        "--model.num_heads", "2",
        "--model.d_ff", "64",
        "--model.num_encoder_layers", "1",
        "--model.decoder_embed_dim", "32",
        "--model.decoder_hidden", "32",
        "--model.joint_dim", "32",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant",
        "--optim.lr", "0.002",
    ])
    exp = workspace / "exp"
    assert (exp / "config.yaml").exists()
    assert (exp / "checkpoint.msgpack").exists()


@pytest.mark.parametrize("beam_size", [1, 3])
def test_transducer_inference_cli(workspace, beam_size):
    from espnet_tpu.bin.asr_transducer_inference import main

    outdir = workspace / f"decode_b{beam_size}"
    main([
        "--exp_dir", str(workspace / "exp"),
        "--data_dir", str(workspace / "data" / "test"),
        "--output_dir", str(outdir),
        "--beam_size", str(beam_size),
        "--max_tokens", "24",
        "--batch_size", "3",
    ])
    assert (outdir / "text").exists()
    assert (outdir / "score_wer.txt").exists()
