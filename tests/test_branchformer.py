"""Branchformer / E-Branchformer encoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.branchformer import BranchformerEncoder


@pytest.mark.parametrize("variant", ["branchformer", "e_branchformer"])
def test_encoder_forward_backward(variant):
    enc = BranchformerEncoder(
        d_model=16, num_heads=2, d_ff=32, num_layers=2, cgmlp_hidden=32,
        cgmlp_kernel=7, dropout_rate=0.0, subsampling_factor=4,
        variant=variant,
    )
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 50, 12))
    lens = jnp.array([50, 30])
    params = enc.init(rng, feats, lens)
    y, olens = enc.apply(params, feats, lens)
    assert y.shape[0] == 2 and y.shape[2] == 16
    assert bool(jnp.all(jnp.isfinite(y)))
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, feats, lens)[0] ** 2))(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0


@pytest.mark.parametrize("variant", ["branchformer", "e_branchformer"])
def test_asr_model_with_branchformer(variant):
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=12, input_type="feats", n_mels=12, use_specaug=False,
        normalize="utterance_mvn", encoder_type=variant,
        d_model=16, num_heads=2, d_ff=32, num_encoder_layers=1,
        num_decoder_layers=1, decoder_d_ff=32, conformer_kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 50, 12))
    flens = jnp.array([50, 30])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init(rng, feats, flens, text, tlens, True)
    loss, stats = model.apply(params, feats, flens, text, tlens, True)
    assert np.isfinite(float(loss))
