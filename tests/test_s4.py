"""S4D layer + S4 decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.s4_decoder import S4Decoder
from espnet_tpu.ops.s4 import S4DLayer


def test_s4d_conv_matches_recurrence():
    layer = S4DLayer(d_model=6, state_dim=8)
    rng = jax.random.PRNGKey(0)
    u = jax.random.normal(rng, (2, 15, 6))
    params = layer.init(rng, u)
    y_conv = layer.apply(params, u)
    state = layer.apply(params, 2, method=S4DLayer.init_state)
    ys = []
    for t in range(15):
        y_t, state = layer.apply(params, state, u[:, t], method=S4DLayer.step)
        ys.append(y_t)
    y_rec = jnp.stack(ys, 1)
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_rec),
                               atol=1e-4, rtol=1e-4)


def test_s4_decoder_teacher_vs_step():
    dec = S4Decoder(vocab_size=10, d_model=16, num_heads=2, d_ff=32,
                    num_layers=2, state_dim=8, dropout_rate=0.0)
    rng = jax.random.PRNGKey(0)
    mem = jax.random.normal(rng, (2, 7, 16))
    mlens = jnp.array([7, 4])
    toks = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
    tlens = jnp.array([3, 3])
    params = dec.init(rng, toks, tlens, mem, mlens)
    logits = dec.apply(params, toks, tlens, mem, mlens)
    full_lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

    cache = dec.apply(params, 2, method=S4Decoder.init_cache)
    outs = []
    for t in range(3):
        lp, cache = dec.apply(params, toks[:, t], t, mem, mlens, cache,
                              method=S4Decoder.score_step)
        outs.append(lp)
    step_lp = jnp.stack(outs, 1)
    np.testing.assert_allclose(np.asarray(step_lp), np.asarray(full_lp),
                               atol=2e-4, rtol=2e-4)


def test_asr_model_s4_decoder_with_beam_search():
    from espnet_tpu.decode.asr_inference import Speech2Text
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=10, input_type="feats", n_mels=12, use_specaug=False,
        normalize="utterance_mvn", encoder_type="transformer",
        decoder_type="s4", d_model=16, num_heads=2, d_ff=32,
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
    loss, _ = model.apply(params, feats, flens, text, tlens, True)
    assert np.isfinite(float(loss))
    s2t = Speech2Text(model, params["params"], beam_size=2, ctc_weight=0.3,
                      max_steps=6)
    results = s2t(np.asarray(feats), np.asarray(flens))
    assert len(results) == 2
