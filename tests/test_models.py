"""Tiny-model forward/backward tests (reference test style: build tiny
models and run forward/backward on random tensors, e.g.
`test/test_e2e_asr_transformer.py:46`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRConfig, ASRModel, add_sos_eos
from espnet_tpu.models.conformer import ConformerEncoder


def _tiny_config(**kw):
    base = dict(
        vocab_size=12,
        input_type="feats",
        n_mels=20,
        use_specaug=False,
        normalize="utterance_mvn",
        d_model=16,
        num_heads=2,
        d_ff=32,
        num_encoder_layers=2,
        num_decoder_layers=2,
        decoder_d_ff=32,
        conformer_kernel_size=7,
    )
    base.update(kw)
    return ASRConfig(**base)


def _batch(b=2, t=40, d=20, u=5, vocab=12, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    flens = jnp.asarray([t, t - 13])
    text = jnp.asarray(rng.randint(1, vocab - 1, (b, u)).astype(np.int32))
    tlens = jnp.asarray([u, u - 2])
    return feats, flens, text, tlens


def test_add_sos_eos():
    text = jnp.asarray([[3, 4, 5], [6, 0, 0]])
    tlens = jnp.asarray([3, 1])
    ys_in, ys_out, ylens = add_sos_eos(text, tlens, 9, 9)
    np.testing.assert_array_equal(np.asarray(ys_in), [[9, 3, 4, 5], [9, 6, 0, 0]])
    np.testing.assert_array_equal(np.asarray(ys_out), [[3, 4, 5, 9], [6, 9, 0, 0]])
    np.testing.assert_array_equal(np.asarray(ylens), [4, 2])


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_asr_forward_backward(encoder_type):
    cfg = _tiny_config(encoder_type=encoder_type)
    model = ASRModel(cfg)
    feats, flens, text, tlens = _batch()
    variables = model.init(jax.random.PRNGKey(0), feats, flens, text, tlens, True)

    def loss_fn(params):
        loss, stats = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            feats, flens, text, tlens, True,
        )
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    assert {"loss", "loss_att", "loss_ctc", "acc"} <= set(stats)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(g * g)), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_asr_dropout_rng_path():
    cfg = _tiny_config(use_specaug=True, input_type="feats")
    model = ASRModel(cfg)
    feats, flens, text, tlens = _batch(seed=1)
    variables = model.init(jax.random.PRNGKey(0), feats, flens, text, tlens, True)
    loss1, _ = model.apply(
        variables, feats, flens, text, tlens, False,
        rngs={"dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2)},
    )
    loss2, _ = model.apply(
        variables, feats, flens, text, tlens, False,
        rngs={"dropout": jax.random.PRNGKey(3), "specaug": jax.random.PRNGKey(4)},
    )
    assert float(loss1) != float(loss2)  # stochastic path active


def test_ctc_only_and_att_only():
    feats, flens, text, tlens = _batch()
    for w in (0.0, 1.0):
        cfg = _tiny_config(ctc_weight=w)
        model = ASRModel(cfg)
        variables = model.init(jax.random.PRNGKey(0), feats, flens, text, tlens, True)
        loss, stats = model.apply(variables, feats, flens, text, tlens, True)
        assert np.isfinite(float(loss))


def test_conformer_masking_invariance():
    """Padding frames must not affect valid outputs."""
    enc = ConformerEncoder(d_model=16, num_heads=2, d_ff=32, num_layers=2,
                           kernel_size=7)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 40, 20).astype(np.float32)
    lens = jnp.asarray([28])
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), lens, True)
    out1, olens = enc.apply(params, jnp.asarray(x), lens, True)
    x2 = x.copy()
    x2[:, 28:] = 99.0  # garbage in padding
    out2, _ = enc.apply(params, jnp.asarray(x2), lens, True)
    n = int(olens[0])
    np.testing.assert_allclose(
        np.asarray(out1)[0, :n], np.asarray(out2)[0, :n], atol=2e-5
    )


def test_interctc_loss_mixes_into_ctc():
    """InterCTC (`espnet2/asr/espnet_model.py:244-286`): aux CTC losses on
    intermediate encoder layers appear in stats and change the total."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.models.asr import ASRConfig, ASRModel

    kw = dict(
        vocab_size=12, input_type="raw", n_mels=20, use_specaug=False,
        normalize="utterance_mvn", encoder_type="conformer", d_model=16,
        num_heads=2, d_ff=32, num_encoder_layers=3, num_decoder_layers=1,
        decoder_d_ff=32, conformer_kernel_size=7, dropout_rate=0.0,
    )
    sp = jax.random.normal(jax.random.PRNGKey(0), (2, 4000))
    sl = jnp.array([4000, 3000])
    tx = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    tl = jnp.array([3, 2])

    m_inter = ASRModel(ASRConfig(
        interctc_layer_idx=(1, 2), interctc_weight=0.5, **kw))
    p = m_inter.init(jax.random.PRNGKey(1), sp, sl, tx, tl, True)
    loss_i, stats = m_inter.apply(p, sp, sl, tx, tl, True)
    assert "loss_interctc_layer1" in stats and "loss_interctc" in stats
    assert np.isfinite(float(loss_i))

    # same params, InterCTC off -> different total loss (pure function of
    # the same pytree, so the comparison is exact)
    m_off = ASRModel(ASRConfig(**kw))
    loss_o, stats_o = m_off.apply(p, sp, sl, tx, tl, True)
    assert abs(float(loss_i) - float(loss_o)) > 1e-6
    got = (1 - 0.5) * float(stats_o["loss_ctc"]) + 0.5 * float(
        stats["loss_interctc"])
    want_mixed = float(stats["loss_ctc"] - 0.0)
    # stats["loss_ctc"] is the PRE-mix final-layer loss; verify the mix rule
    np.testing.assert_allclose(
        float(loss_i),
        0.3 * got + 0.7 * float(stats["loss_att"]), rtol=1e-5,
    )


def test_too_short_utterance_raises_named_error():
    """Sub-receptive-field input raises TooShortUttError (the reference's
    explicit error, `transformer/subsampling.py:14`), not an opaque
    ZeroDivisionError from the attention rel-shift."""
    import jax
    import jax.numpy as jnp
    import pytest

    from espnet_tpu.models.conformer import ConformerEncoder
    from espnet_tpu.models.subsampling import TooShortUttError

    enc = ConformerEncoder(d_model=64, num_heads=2, d_ff=128, num_layers=1)
    with pytest.raises(TooShortUttError):
        enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80)),
                 jnp.asarray([4]), True)
    # 7 frames is exactly enough for x4
    p = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 80)),
                 jnp.asarray([7]), True)
    h, hl = enc.apply(p, jnp.zeros((1, 7, 80)), jnp.asarray([7]), True)
    assert h.shape[1] == 1 and int(hl[0]) == 1
