"""End-to-end smoke: synth corpus -> train tiny ASR model -> decode -> WER.

Equivalent of the reference's mini_an4 CPU integration recipe
(`ci/test_integration_espnet2.sh`): data prep, tokenization, bucketed
batching, a few epochs of joint CTC/attention training, greedy CTC decode,
WER scoring, checkpoint/resume.
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.data.dataset import ASRDataset, EpochIterator
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.data.synth import generate_corpus
from espnet_tpu.data.tokenizer import CharTokenizer, TokenIDConverter, build_token_list
from espnet_tpu.decode.ctc_greedy import ctc_greedy_decode
from espnet_tpu.models.asr import ASRConfig, ASRModel
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions
from espnet_tpu.utils.metrics import corpus_error_rate


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d, texts = generate_corpus(tmp_path_factory.mktemp("corpus"), n_utts=24,
                               min_words=2, max_words=4)
    tok = CharTokenizer()
    tl = build_token_list(texts.values(), tok)
    conv = TokenIDConverter(tl)
    ds = ASRDataset(wav_scp=d / "wav.scp", text=d / "text",
                    tokenizer=tok, converter=conv)
    return ds, tok, conv, tl, texts


def test_train_decode_smoke(corpus, tmp_path):
    ds, tok, conv, tl, texts = corpus
    cfg = ASRConfig(
        vocab_size=len(tl),
        input_type="raw",
        n_fft=512,
        hop_length=128,
        n_mels=24,
        use_specaug=False,
        normalize="utterance_mvn",
        encoder_type="transformer",
        d_model=32,
        num_heads=2,
        d_ff=64,
        num_encoder_layers=2,
        num_decoder_layers=1,
        decoder_d_ff=64,
        subsampling_factor=4,
        ctc_weight=0.5,
        dropout_rate=0.0,
    )
    model = ASRModel(cfg)
    tx = build_optimizer("adam", lr=3e-3, schedule="constant", grad_clip=5.0)
    shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
    batches = build_batches(shapes, batch_size=8, length_quantum=2048,
                            text_quantum=8)
    train_iter = EpochIterator(ds, batches, seed=0)

    trainer = Trainer(
        model, tx, tmp_path / "exp",
        TrainerOptions(max_epoch=2, log_interval=10, keep_nbest=2),
    )
    batch0 = next(train_iter.epoch(0))
    state = trainer.init_state({k: v for k, v in batch0.items() if k != "keys"})
    state = trainer.run(state, train_iter, valid_iter=train_iter)

    # loss decreased across epochs
    l1 = trainer.reporter.get(1, "train", "loss")
    l2 = trainer.reporter.get(2, "train", "loss")
    assert l2 < l1

    # resume path: a new trainer continues from epoch 3
    trainer2 = Trainer(
        model, tx, tmp_path / "exp",
        TrainerOptions(max_epoch=3, log_interval=10, keep_nbest=2),
    )
    state2 = trainer2.init_state({k: v for k, v in batch0.items() if k != "keys"})
    state2 = trainer2.run(state2, train_iter, valid_iter=train_iter)
    assert trainer2.reporter.get(3, "train", "loss") is not None

    # checkpoint artifacts exist
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
    assert (tmp_path / "exp" / "valid.acc.best.params.msgpack").exists()

    # greedy CTC decode produces *some* sane output structure
    def encode_fn(params, extra, speech, lengths):
        return model.apply({"params": params, **extra}, speech, lengths,
                           method=ASRModel.encode)

    batch = next(train_iter.epoch(0))
    enc, enc_lens = encode_fn(
        state2.params, state2.extra_vars,
        jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"]),
    )
    lp = model.apply({"params": state2.params, **state2.extra_vars}, enc,
                     method=ASRModel.ctc_log_probs)
    hyps = ctc_greedy_decode(lp, enc_lens)
    assert len(hyps) == len(batch["keys"])
    refs = {k: conv.tokens2ids(tok.text2tokens(texts[k])) for k in batch["keys"]}
    hyp_map = {k: h for k, h in zip(batch["keys"], hyps)}
    rate, stats = corpus_error_rate(refs, hyp_map)
    # 2-3 epochs of a tiny model: not converged, but must be a valid rate
    assert 0.0 <= rate <= 1.5
