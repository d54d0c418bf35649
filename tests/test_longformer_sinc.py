"""Longformer local attention + SincConv front-end.

Reference analogue: `test/espnet2/asr/encoder/test_longformer_encoder.py`
and `test/espnet2/asr/preencoder/test_sinc.py`, plus an exact
banded-vs-full attention parity check (same parameters, band >= T).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_local_attention_matches_full_when_window_covers_t():
    """LocalSelfAttention with window >= T must equal full MHA with the
    same projection parameters."""
    from espnet_tpu.models.attention import MultiHeadAttention
    from espnet_tpu.models.longformer import LocalSelfAttention

    b, t, d, h = 2, 12, 16, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    pad_mask = jnp.ones((b, t), bool)
    local = LocalSelfAttention(h, d, window=t)
    params = local.init(jax.random.PRNGKey(1), x, pad_mask)
    got = local.apply(params, x, pad_mask)
    full = MultiHeadAttention(h, d)
    want = full.apply(params, x, x, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_local_attention_band_semantics():
    """A perturbation farther than `window` from position 0 must not change
    the output at position 0; one inside the band must."""
    from espnet_tpu.models.longformer import LocalSelfAttention

    b, t, d, h, w = 1, 32, 8, 2, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    pad_mask = jnp.ones((b, t), bool)
    local = LocalSelfAttention(h, d, window=w)
    params = local.init(jax.random.PRNGKey(1), x, pad_mask)
    base = np.asarray(local.apply(params, x, pad_mask))
    far = x.at[:, w + 3].add(1.0)  # |0 - (w+3)| > w
    out_far = np.asarray(local.apply(params, far, pad_mask))
    np.testing.assert_allclose(out_far[:, 0], base[:, 0], rtol=1e-5,
                               atol=1e-6)
    near = x.at[:, w - 1].add(1.0)
    out_near = np.asarray(local.apply(params, near, pad_mask))
    assert np.abs(out_near[:, 0] - base[:, 0]).max() > 1e-5


def test_longformer_asr_forward_backward():
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=12, input_type="raw", n_mels=20, use_specaug=False,
        normalize="utterance_mvn", encoder_type="longformer",
        attention_window=8, d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=2, num_decoder_layers=1, decoder_d_ff=32,
        conformer_kernel_size=7, dropout_rate=0.0,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    speech = jax.random.normal(rng, (2, 4000))
    sl = jnp.array([4000, 3000])
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    tl = jnp.array([3, 2])
    params = model.init(rng, speech, sl, text, tl, True)
    loss, stats = model.apply(params, speech, sl, text, tl, True)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.apply(p, speech, sl, text, tl, True)[0]
    )(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, v: jnp.maximum(a, jnp.max(jnp.abs(v))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_sinc_conv_is_bandpass():
    """The generated sinc kernels must actually be band-passes: a tone
    inside a filter's band comes through much stronger than one far
    outside it."""
    from espnet_tpu.models.sinc import SincConv

    fs = 16000
    sc = SincConv(out_channels=16, kernel_size=101, fs=fs)
    x = jnp.zeros((1, 1600))
    params = sc.init(jax.random.PRNGKey(0), x)
    low = np.asarray(params["params"]["low_hz"])
    band = np.asarray(params["params"]["band_hz"])
    # pick filter 8; tones at its centre vs far away
    lo = 50.0 + abs(low[8])
    hi = min(lo + 50.0 + abs(band[8]), fs / 2)
    centre = (lo + hi) / 2
    tt = np.arange(1600) / fs
    inside = jnp.asarray(np.sin(2 * np.pi * centre * tt)[None].astype(np.float32))
    far_f = centre / 4 if centre > 2000 else centre * 4
    outside = jnp.asarray(np.sin(2 * np.pi * far_f * tt)[None].astype(np.float32))
    e_in = float(jnp.mean(sc.apply(params, inside)[..., 8] ** 2))
    e_out = float(jnp.mean(sc.apply(params, outside)[..., 8] ** 2))
    assert e_in > 10 * e_out


def test_sinc_frontend_asr_forward_backward():
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=12, input_type="sinc", sinc_out_dim=24,
        use_specaug=False, normalize="utterance_mvn",
        encoder_type="transformer", d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=1, num_decoder_layers=1, decoder_d_ff=32,
        dropout_rate=0.0,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    speech = jax.random.normal(rng, (2, 4000))
    sl = jnp.array([4000, 3000])
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    tl = jnp.array([3, 2])
    params = model.init(rng, speech, sl, text, tl, True)
    loss, stats = model.apply(params, speech, sl, text, tl, True)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.apply(p, speech, sl, text, tl, True)[0]
    )(params)
    # the sinc cutoffs themselves must receive gradient
    glow = g["params"]["sinc_frontend"]["sinc"]["low_hz"]
    assert float(jnp.max(jnp.abs(glow))) > 0


@pytest.mark.parametrize("inp", ["sliding_window", "fused"])
def test_alternative_frontends_forward_backward(inp):
    """SlidingWindow (`frontend/windowing.py`) and FusedFrontends
    (`frontend/fused.py`) equivalents run and train."""
    from espnet_tpu.models.asr import ASRConfig, ASRModel

    cfg = ASRConfig(
        vocab_size=12, input_type=inp, n_mels=20, use_specaug=False,
        normalize="global_mvn", encoder_type="transformer", d_model=16,
        num_heads=2, d_ff=32, num_encoder_layers=1, num_decoder_layers=1,
        decoder_d_ff=32, dropout_rate=0.0,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    speech = jax.random.normal(rng, (2, 4000))
    sl = jnp.array([4000, 3000])
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    tl = jnp.array([3, 2])
    params = model.init(rng, speech, sl, text, tl, True)
    loss, _ = model.apply(params, speech, sl, text, tl, True)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.apply(p, speech, sl, text, tl, True)[0]
    )(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, v: jnp.maximum(a, jnp.max(jnp.abs(v))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0
