"""Transducer model: tiny forward/backward + greedy decode + learnability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.models.transducer import (
    PredictionNetwork, TransducerASRModel, TransducerConfig,
)


def _cfg(**kw):
    base = dict(
        vocab_size=12,
        input_type="feats",
        n_mels=8,
        use_specaug=False,
        encoder_type="transformer",
        d_model=16,
        num_heads=2,
        d_ff=32,
        num_encoder_layers=1,
        decoder_embed_dim=8,
        decoder_hidden=16,
        joint_dim=16,
        dropout_rate=0.0,
    )
    base.update(kw)
    return TransducerConfig(**base)


def _batch(b=2, t=40, d=8, u=4, vocab=12, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(b, t, d).astype(np.float32)),
        jnp.asarray([t, t - 10]),
        jnp.asarray(rng.randint(1, vocab, (b, u)).astype(np.int32)),
        jnp.asarray([u, u - 2]),
    )


def test_prediction_network_step_matches_full():
    pn = PredictionNetwork(vocab_size=10, embed_dim=8, hidden=12,
                           dropout_rate=0.0)
    toks = jnp.asarray([[3, 5, 2]])
    params = pn.init(jax.random.PRNGKey(0), toks, True)
    full = pn.apply(params, toks, True)  # (1, 4, H)
    state = pn.apply(params, 1, method=PredictionNetwork.init_state)
    seq = [0, 3, 5, 2]  # blank BOS then tokens
    for i, tok in enumerate(seq):
        out, state = pn.apply(params, state, jnp.asarray([tok]),
                              method=PredictionNetwork.step)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(full[0, i]),
                                   atol=1e-5)


def test_transducer_forward_backward():
    cfg = _cfg()
    model = TransducerASRModel(cfg)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), *batch, True)

    def loss_fn(p):
        loss, stats = model.apply(p, *batch, True)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    gn = jax.tree_util.tree_reduce(lambda a, g: a + float(jnp.sum(g * g)),
                                   grads, 0.0)
    assert np.isfinite(gn) and gn > 0


def test_transducer_greedy_decode_shapes():
    cfg = _cfg()
    model = TransducerASRModel(cfg)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), *batch, True)
    enc, enc_lens = model.apply(params, batch[0], batch[1],
                                method=TransducerASRModel.encode)
    toks, lens = model.apply(params, enc, enc_lens, 16, 2,
                             method=TransducerASRModel.greedy_search)
    assert toks.shape == (2, 16)
    assert np.all(np.asarray(lens) <= 16)
    # no blanks among emitted tokens
    t0 = np.asarray(toks[0, : int(lens[0])])
    assert np.all(t0 != 0)


def test_transducer_learns_tiny_mapping():
    """Overfit 4 fixed utterances; greedy decode must recover the labels."""
    import optax

    cfg = _cfg(vocab_size=6, num_encoder_layers=1, d_model=16)
    model = TransducerASRModel(cfg)
    rng = np.random.RandomState(1)
    b, t, d, u = 4, 20, 8, 3
    # feats carry the labels as one-hot segments -> easily learnable
    labels = rng.randint(1, 6, (b, u)).astype(np.int32)
    feats = np.zeros((b, t, d), np.float32)
    for i in range(b):
        for j in range(u):
            feats[i, j * 6 : (j + 1) * 6, labels[i, j]] = 3.0
    batch = (jnp.asarray(feats), jnp.full((b,), t), jnp.asarray(labels),
             jnp.full((b,), u))
    params = model.init(jax.random.PRNGKey(0), *batch, True)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply(p, *batch, True), has_aux=True
        )(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(300):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 1.0, float(loss)
    enc, enc_lens = model.apply(params, batch[0], batch[1],
                                method=TransducerASRModel.encode)
    toks, lens = model.apply(params, enc, enc_lens, 8, 2,
                             method=TransducerASRModel.greedy_search)
    hyp = [np.asarray(toks[i, : int(lens[i])]).tolist() for i in range(b)]
    ref = [labels[i].tolist() for i in range(b)]
    correct = sum(h == r for h, r in zip(hyp, ref))
    assert correct >= 3, (hyp, ref)


def test_aux_losses_and_frozen_joint():
    """Aux transducer + symm-KL + LM losses (reference
    `transducer/transducer_tasks.py`): finite, change the total loss, and
    the aux transducer loss contributes NO gradient to the joint network
    (requires_grad=False parity)."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.transducer import TransducerASRModel, TransducerConfig

    def build(aux_w, kl_w, lm_w):
        cfg = TransducerConfig(
            vocab_size=12, input_type="feats", n_mels=8, use_specaug=False,
            normalize="utterance_mvn", encoder_type="transformer",
            d_model=16, num_heads=2, d_ff=32, num_encoder_layers=2,
            decoder_embed_dim=16, decoder_hidden=16, joint_dim=16,
            dropout_rate=0.0, aux_transducer_weight=aux_w,
            symm_kl_weight=kl_w, lm_loss_weight=lm_w, aux_layers=(1,),
        )
        return TransducerASRModel(cfg)

    rng = np.random.RandomState(0)
    b = 2
    batch = (
        jnp.asarray(rng.randn(b, 40, 8).astype(np.float32)),
        jnp.full((b,), 40, jnp.int32),
        jnp.asarray(rng.randint(1, 11, (b, 5)).astype(np.int32)),
        jnp.full((b,), 5, jnp.int32),
    )
    model = build(0.3, 0.1, 0.2)
    variables = model.init(jax.random.PRNGKey(0), *batch, True)
    loss, stats = model.apply(variables, *batch, True)
    assert np.isfinite(float(loss))
    for k in ("loss_aux_trans", "loss_symm_kl", "loss_lm", "loss_rnnt"):
        assert k in stats and np.isfinite(float(stats[k])), k

    # frozen joint: with symm-KL off, enabling the aux transducer loss must
    # not change the joint network's gradient
    model_aux = build(0.5, 0.0, 0.0)
    model_plain = build(0.0, 0.0, 0.0)
    v_aux = model_aux.init(jax.random.PRNGKey(0), *batch, True)

    def grads(model, params):
        def f(p):
            loss, _ = model.apply({"params": p}, *batch, True)
            return loss
        return jax.grad(f)(params)

    # plain model lacks aux params; evaluate both on the aux model's params
    g_aux = grads(model_aux, v_aux["params"])
    p_plain = {k: v for k, v in v_aux["params"].items() if k != "aux_mlp"}
    g_plain = grads(model_plain, p_plain)
    for name in ("lin_enc", "lin_dec", "lin_out"):
        np.testing.assert_allclose(
            np.asarray(g_aux["joint"][name]["kernel"]),
            np.asarray(g_plain["joint"][name]["kernel"]),
            rtol=1e-5, atol=1e-6,
        )
    # ...while the aux_mlp does receive gradient
    assert float(jnp.max(jnp.abs(g_aux["aux_mlp"]["kernel"]))) > 0
