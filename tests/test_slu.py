"""SLU task: ASR stack over intent-annotated transcripts."""

from pathlib import Path


def test_slu_cli(tmp_path):
    from espnet_tpu.bin.slu_inference import main as slu_inf
    from espnet_tpu.bin.slu_train import main as slu_train
    from espnet_tpu.data.fileio import read_2column_text, write_2column_text
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=6, min_words=2, max_words=2)
    # prepend an intent label to every transcript (SLU convention)
    texts = read_2column_text(tmp_path / "data" / "text")
    write_2column_text(
        tmp_path / "data" / "text",
        {k: f"play {v}" for k, v in texts.items()},
    )
    slu_train([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "train.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.batch_size", "3", "--data.token_type", "word",
        "--model.n_mels", "20", "--model.use_specaug", "false",
        "--model.normalize", "utterance_mvn",
        "--model.encoder_type", "transformer",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1", "--model.decoder_d_ff", "32",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    slu_inf([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "dec"),
        "--beam_size", "2", "--max_steps", "8", "--batch_size", "3",
    ])
    assert (tmp_path / "dec" / "intent_acc.txt").exists()
