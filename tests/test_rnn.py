"""RNN (v1) stack: VGG-BLSTM encoder + AttLoc LSTM decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.rnn import RNNDecoder, VGGRNNEncoder


def test_vgg_rnn_encoder():
    enc = VGGRNNEncoder(d_model=16, hidden=16, num_layers=2, dropout_rate=0.0)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 40, 20))
    lens = jnp.array([40, 24])
    params = enc.init(rng, feats, lens)
    y, olens = enc.apply(params, feats, lens)
    assert y.shape == (2, 10, 16)
    assert list(np.asarray(olens)) == [10, 6]
    # padded frames are zeroed
    assert float(jnp.abs(y[1, 7:]).max()) == 0.0


def test_rnn_decoder_teacher_forced_and_step_parity():
    dec = RNNDecoder(vocab_size=10, encoder_dim=12, embed_dim=8, hidden=12,
                     num_layers=2, att_dim=8, att_conv_channels=2,
                     att_conv_kernel=5, dropout_rate=0.0)
    rng = jax.random.PRNGKey(0)
    mem = jax.random.normal(rng, (2, 9, 12))
    mlens = jnp.array([9, 5])
    toks = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
    tlens = jnp.array([3, 3])
    params = dec.init(rng, toks, tlens, mem, mlens)
    logits = dec.apply(params, toks, tlens, mem, mlens)
    assert logits.shape == (2, 3, 10)

    # step-wise scoring must match the teacher-forced forward exactly
    cache = dec.apply(params, 2, mem, mlens, method=RNNDecoder.score_memory_cache)
    outs = []
    for t in range(3):
        lp, cache = dec.apply(params, toks[:, t], t, mem, mlens, cache,
                              method=RNNDecoder.score_step)
        outs.append(lp)
    step_lp = jnp.stack(outs, 1)
    full_lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    np.testing.assert_allclose(np.asarray(step_lp), np.asarray(full_lp),
                               rtol=2e-4, atol=2e-4)


def test_asr_model_rnn_stack_with_beam_search():
    from espnet_tpu.decode.asr_inference import Speech2Text
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=10, input_type="feats", n_mels=12, use_specaug=False,
        normalize="utterance_mvn", encoder_type="vgg_blstm",
        decoder_type="rnn", d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=1, num_decoder_layers=1, decoder_d_ff=32,
        dropout_rate=0.0, ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 40, 12))
    flens = jnp.array([40, 24])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init(rng, feats, flens, text, tlens, True)
    loss, stats = model.apply(params, feats, flens, text, tlens, True)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, feats, flens, text, tlens, True)[0])(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0)
    assert np.isfinite(float(mx)) and float(mx) > 0

    s2t = Speech2Text(model, params["params"], beam_size=3, ctc_weight=0.3,
                      max_steps=8)
    results = s2t(np.asarray(feats), np.asarray(flens))
    assert len(results) == 2
    for r in results:
        assert isinstance(r.token_ids, list)
