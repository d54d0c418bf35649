"""Mask-CTC model + non-autoregressive inference."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.maskctc import (
    MaskCTCConfig, MaskCTCInference, MaskCTCModel,
)


def _cfg(**kw):
    base = dict(
        vocab_size=12, input_type="feats", n_mels=8, use_specaug=False,
        normalize="utterance_mvn", encoder_type="transformer",
        d_model=16, num_heads=2, d_ff=32, num_encoder_layers=1,
        num_decoder_layers=1, decoder_d_ff=32, dropout_rate=0.0,
        ctc_weight=0.3,
    )
    base.update(kw)
    return MaskCTCConfig(**base)


def test_forward_backward():
    model = MaskCTCModel(_cfg())
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 40, 8))
    flens = jnp.array([40, 24])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init({"params": rng, "mask": rng}, feats, flens, text,
                        tlens, False)
    loss, stats = model.apply(params, feats, flens, text, tlens, False,
                              rngs={"mask": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    assert "loss_mlm" in stats and "acc_mlm" in stats
    g = jax.grad(
        lambda p: model.apply(p, feats, flens, text, tlens, False,
                              rngs={"mask": jax.random.PRNGKey(2)})[0]
    )(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_inference_runs():
    model = MaskCTCModel(_cfg())
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 40, 8))
    flens = jnp.array([40, 24])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init({"params": rng, "mask": rng}, feats, flens, text,
                        tlens, False)
    infer = MaskCTCInference(model, params, n_iterations=3,
                             threshold_probability=0.99)
    hyps = infer(np.asarray(feats), np.asarray(flens))
    assert len(hyps) == 2
    mask_token = model.config.mask_token
    for h in hyps:
        assert all(0 <= t < mask_token for t in h), h
