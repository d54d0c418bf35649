"""Joint enhancement + ASR (enh_s2t)."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRConfig
from espnet_tpu.models.enh import EnhConfig
from espnet_tpu.models.enh_s2t import EnhS2TConfig, EnhS2TModel


def _model():
    return EnhS2TModel(EnhS2TConfig(
        enh=EnhConfig(
            num_spk=1, enc_channels=16, enc_kernel=16, enc_stride=8,
            separator_type="tcn", tcn_layers=2, tcn_stacks=1,
            tcn_bottleneck=8, tcn_hidden=16, dropout_rate=0.0,
        ),
        asr=ASRConfig(
            vocab_size=10, input_type="raw", fs=16000, n_fft=256,
            hop_length=128, n_mels=12, use_specaug=False,
            normalize="utterance_mvn", encoder_type="transformer",
            d_model=16, num_heads=2, d_ff=32, num_encoder_layers=1,
            num_decoder_layers=1, decoder_d_ff=32, dropout_rate=0.0,
            ctc_weight=0.3,
        ),
        enh_weight=0.2,
    ))


def test_forward_backward_with_and_without_refs():
    model = _model()
    rng = jax.random.PRNGKey(0)
    n = 6000
    mix = jax.random.normal(rng, (2, n)) * 0.1
    lens = jnp.array([n, n // 2])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    ref = jax.random.normal(jax.random.PRNGKey(1), (2, n))
    params = model.init(rng, mix, lens, text, tlens, ref, True)
    loss, stats = model.apply(params, mix, lens, text, tlens, ref, True)
    assert np.isfinite(float(loss))
    assert "enh_loss" in stats and "asr_loss" in stats
    # no references: ASR-only loss
    loss2, stats2 = model.apply(params, mix, lens, text, tlens, None, True)
    assert np.isfinite(float(loss2))
    assert "enh_loss" not in stats2
    g = jax.grad(
        lambda p: model.apply(p, mix, lens, text, tlens, ref, True)[0]
    )(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0)
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_beam_search_through_enh_front():
    from espnet_tpu.decode.asr_inference import Speech2Text

    model = _model()
    rng = jax.random.PRNGKey(0)
    n = 6000
    mix = jax.random.normal(rng, (2, n)) * 0.1
    lens = jnp.array([n, n // 2])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init(rng, mix, lens, text, tlens, None, True)
    s2t = Speech2Text(model, params["params"], beam_size=2, ctc_weight=0.3,
                      max_steps=6)
    results = s2t(np.asarray(mix), np.asarray(lens))
    assert len(results) == 2
