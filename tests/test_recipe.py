"""The staged recipe pipeline end-to-end through the run.py CLI only
(reference analogue: `ci/test_integration_espnet2.sh` running
`egs2/mini_an4/asr1/run.sh` with --stage/--stop-stage)."""

from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    return tmp_path_factory.mktemp("recipe")


def _args(ws, extra=()):
    return [
        "--recipe.expdir", str(ws / "exp"),
        "--recipe.datadir", str(ws / "data"),
        "--recipe.train_set", "train",
        "--recipe.valid_set", "train",
        "--recipe.test_sets", "test",
        "--recipe.synth_utts", "12",
        "--recipe.use_ngram", "true",
        "--recipe.asr_args",
        "--run.max_epoch 2 --run.log_interval 1000 --data.batch_size 8 "
        "--model.n_mels 24 --model.use_specaug false "
        "--model.normalize global_mvn --model.encoder_type transformer "
        "--model.d_model 32 --model.num_heads 2 --model.d_ff 64 "
        "--model.num_encoder_layers 1 --model.num_decoder_layers 1 "
        "--model.decoder_d_ff 64 --model.dropout_rate 0.0 "
        "--optim.schedule constant --optim.lr 0.003",
        "--recipe.decode_args",
        "--beam_size 2 --max_steps 24 --batch_size 4",
    ] + list(extra)


def test_recipe_stages_1_to_8(ws):
    from espnet_tpu.bin.run import main

    main(_args(ws, ["--recipe.stop_stage", "8"]))
    exp = ws / "exp"
    assert (ws / "data" / "train" / "wav.scp").exists()
    assert (ws / "data" / "train_filtered" / "wav.scp").exists()
    assert (exp / "tokens" / "tokens.txt").exists()
    assert (exp / "ngram" / "3gram.arpa").exists()
    assert (exp / "asr" / "stats" / "feats_stats.npz").exists()
    # stage markers written, training not yet run
    assert (exp / ".stage8.done").exists()
    assert not (exp / ".stage9.done").exists()
    assert not (exp / "asr" / "checkpoint.msgpack").exists()


def test_recipe_stages_9_to_12_resume(ws):
    from espnet_tpu.bin.run import main

    # second invocation resumes: stages 1-8 skipped via markers
    main(_args(ws))
    exp = ws / "exp"
    assert (exp / "asr" / "checkpoint.msgpack").exists()
    assert (exp / "decode_test" / "text").exists()
    assert (exp / "decode_test" / "score_wer.txt").exists()
    results = (exp / "RESULTS.md").read_text()
    assert "test" in results and "# Snt" in results
    assert (exp / "packed_model.zip").exists()
    assert (exp / ".stage12.done").exists()
