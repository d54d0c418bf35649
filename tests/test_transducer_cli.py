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


def test_transducer_inference_alsd(tmp_path):
    """ALSD search through the Speech2TextTransducer front-end produces a
    plausible decode (same interface as maes; `--search alsd`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.decode.transducer_inference import Speech2TextTransducer
    from espnet_tpu.models.transducer import TransducerASRModel, TransducerConfig

    cfg = TransducerConfig(
        vocab_size=10, input_type="feats", n_mels=8, use_specaug=False,
        encoder_type="transformer", d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=1, decoder_embed_dim=16, decoder_hidden=16,
        joint_dim=16, dropout_rate=0.0,
    )
    model = TransducerASRModel(cfg)
    rng = np.random.RandomState(0)
    speech = rng.randn(2, 40, 8).astype(np.float32)
    lens = np.full((2,), 40, np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(speech), jnp.asarray(lens),
        jnp.asarray(rng.randint(1, 9, (2, 4)), jnp.int32),
        jnp.full((2,), 4, jnp.int32), True,
    )
    s2t = Speech2TextTransducer(
        model, variables["params"], beam_size=3, max_tokens=16,
        search="alsd",
    )
    out = s2t(speech, lens)
    assert len(out) == 2
    for r in out:
        assert isinstance(r.token_ids, list)
