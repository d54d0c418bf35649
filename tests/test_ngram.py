"""N-gram LM: training, ARPA round-trip, dense scorer parity, beam fusion.

Reference analogue: `test/test_ngram.py` (kenlm scorer over checked-in
test.arpa fixtures)."""

from pathlib import Path

import numpy as np
import pytest

from espnet_tpu.lm.ngram import SOS, DenseNgramScorer, NgramModel


SENTS = [list(s) for s in
         ["abab", "abba", "aabb", "baba", "abab", "abab", "bb", "aa"]]


def test_train_and_probability_sanity():
    model = NgramModel.train(SENTS, order=2)
    # 'b' after 'a' is frequent; 'a' after 'a' rarer
    assert model.logp(("a",), "b") > model.logp(("a",), "a")
    # probabilities over observed vocab are (sub-)normalized
    tot = sum(10 ** model.logp(("a",), w) for w in ["a", "b"])
    assert tot < 1.3


def test_arpa_roundtrip(tmp_path):
    model = NgramModel.train(SENTS, order=3)
    model.save_arpa(tmp_path / "lm.arpa")
    loaded = NgramModel.load_arpa(tmp_path / "lm.arpa")
    assert loaded.order == 3
    for ctx in [(), ("a",), ("a", "b")]:
        for w in ["a", "b"]:
            np.testing.assert_allclose(
                model.logp(ctx, w), loaded.logp(ctx, w), rtol=1e-4,
                err_msg=f"ctx={ctx} w={w}",
            )


def test_dense_scorer_matches_direct():
    import math

    model = NgramModel.train(SENTS, order=2)
    token_list = ["<blank>", "a", "b", "<sos/eos>"]
    scorer = DenseNgramScorer(model, token_list)
    fn = scorer.make_score_fn()
    import jax.numpy as jnp

    cache = scorer.init_cache(1)
    # consume sos -> context (<s>); then 'a', 'b'
    history = []
    for tok_id, tok in [(3, "<sos/eos>"), (1, "a"), (2, "b")]:
        lp, cache = fn(jnp.asarray([tok_id]), 0, cache)
        lp = np.asarray(lp)[0]
        history = [SOS] if tok == "<sos/eos>" else history + [tok]
        # the returned row scores the NEXT token given the full history
        for wid, w in [(1, "a"), (2, "b")]:
            expect = model.logp(history, w)
            np.testing.assert_allclose(
                lp[wid], expect * math.log(10.0), rtol=1e-4,
                err_msg=f"after {tok} predicting {w}",
            )


def test_fusion_in_beam_search(tmp_path):
    """End-to-end: train tiny ASR, train ngram, decode with fusion."""
    from espnet_tpu.bin.asr_inference import main as inf_main
    from espnet_tpu.bin.asr_train import main as train_main
    from espnet_tpu.bin.ngram_train import main as ng_main
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=8, min_words=2, max_words=3)
    train_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.valid_dir", str(tmp_path / "data"),
        "--data.batch_size", "4",
        "--model.n_mels", "20", "--model.use_specaug", "false",
        "--model.normalize", "utterance_mvn",
        "--model.encoder_type", "transformer",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1", "--model.decoder_d_ff", "32",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    ng_main([
        "--data_dir", str(tmp_path / "data"),
        "--exp_dir", str(tmp_path / "exp"),
        "--output", str(tmp_path / "exp" / "lm.arpa"),
        "--order", "2",
    ])
    assert (tmp_path / "exp" / "lm.arpa").exists()
    inf_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "dec"),
        "--beam_size", "2", "--ctc_weight", "0.3",
        "--ngram_file", str(tmp_path / "exp" / "lm.arpa"),
        "--ngram_weight", "0.3",
        "--max_steps", "16", "--batch_size", "4",
    ])
    assert (tmp_path / "dec" / "text").exists()
