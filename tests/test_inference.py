"""Speech2Text integration: train briefly, then batched beam-search decode
(joint CTC/attention + optional LM fusion) on the synth corpus."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.data.dataset import ASRDataset, EpochIterator
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.data.synth import generate_corpus
from espnet_tpu.data.tokenizer import CharTokenizer, TokenIDConverter, build_token_list
from espnet_tpu.decode.asr_inference import Speech2Text
from espnet_tpu.models.asr import ASRConfig, ASRModel
from espnet_tpu.models.lm import TransformerLM
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("s2t")
    d, texts = generate_corpus(root / "c", n_utts=16, min_words=2, max_words=3)
    tok = CharTokenizer()
    tl = build_token_list(texts.values(), tok)
    conv = TokenIDConverter(tl)
    ds = ASRDataset(wav_scp=d / "wav.scp", text=d / "text",
                    tokenizer=tok, converter=conv)
    cfg = ASRConfig(
        vocab_size=len(tl), input_type="raw", n_mels=24, use_specaug=False,
        normalize="utterance_mvn", encoder_type="transformer", d_model=32,
        num_heads=2, d_ff=64, num_encoder_layers=2, num_decoder_layers=1,
        decoder_d_ff=64, ctc_weight=0.5, dropout_rate=0.0,
    )
    model = ASRModel(cfg)
    tx = build_optimizer("adam", lr=3e-3, schedule="constant")
    shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
    batches = build_batches(shapes, batch_size=8, length_quantum=2048)
    it = EpochIterator(ds, batches, seed=0)
    trainer = Trainer(model, tx, root / "exp",
                      TrainerOptions(max_epoch=2, log_interval=100))
    b0 = next(it.epoch(0))
    state = trainer.init_state({k: v for k, v in b0.items() if k != "keys"})
    state = trainer.run(state, it)
    return model, state, ds, tok, conv, texts, it


def test_beam_search_decode(trained):
    model, state, ds, tok, conv, texts, it = trained
    s2t = Speech2Text(
        model, state.params, state.extra_vars, tok, conv,
        beam_size=3, ctc_weight=0.5, max_steps=24,
    )
    batch = next(it.epoch(0))
    results = s2t(batch["speech"], batch["speech_lengths"],
                  keys=batch["keys"], nbest=3)
    assert len(results) == len(batch["keys"])
    for r in results:
        assert isinstance(r.text, str)
        assert len(r.nbest) == 3
        # n-best sorted by score
        scores = [s for _, s in r.nbest]
        assert scores == sorted(scores, reverse=True)
        assert np.isfinite(r.score)


def test_beam_search_att_only(trained):
    model, state, ds, tok, conv, texts, it = trained
    s2t = Speech2Text(model, state.params, state.extra_vars, tok, conv,
                      beam_size=2, ctc_weight=0.0, max_steps=16,
                      maxlenratio=0.5)
    batch = next(it.epoch(0))
    results = s2t(batch["speech"][:2], batch["speech_lengths"][:2])
    assert len(results) == 2


def test_beam_search_with_lm_fusion(trained):
    model, state, ds, tok, conv, texts, it = trained
    lm = TransformerLM(vocab_size=model.config.vocab_size, d_model=16,
                       num_heads=2, d_ff=32, num_layers=1)
    lm_params = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 5), jnp.int32),
        jnp.asarray([5, 5]), True,
    )["params"]
    s2t = Speech2Text(
        model, state.params, state.extra_vars, tok, conv,
        beam_size=2, ctc_weight=0.3, lm_weight=0.2,
        lm_model=lm, lm_params=lm_params, max_steps=16,
    )
    batch = next(it.epoch(0))
    results = s2t(batch["speech"][:2], batch["speech_lengths"][:2])
    assert len(results) == 2
    assert all(np.isfinite(r.score) for r in results)


def test_lm_score_step_matches_full():
    """Incremental LM scoring == full causal forward."""
    lm = TransformerLM(vocab_size=11, d_model=16, num_heads=2, d_ff=32,
                       num_layers=2, dropout_rate=0.0)
    toks = jnp.asarray([[1, 4, 7, 2]])
    lens = jnp.asarray([4])
    params = lm.init(jax.random.PRNGKey(0), toks, lens, True)
    full = lm.apply(params, toks, lens, True)
    full_lp = jax.nn.log_softmax(full.astype(jnp.float32), -1)
    cache = lm.apply(params, 1, 8, method=TransformerLM.init_cache)
    for pos in range(4):
        lp, cache = lm.apply(params, toks[:, pos], pos, cache,
                             method=TransformerLM.score_step)
        np.testing.assert_allclose(
            np.asarray(lp[0]), np.asarray(full_lp[0, pos]), atol=2e-5
        )
