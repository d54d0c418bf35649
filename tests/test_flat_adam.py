"""FlatAdam fused update == optax chain(clip_by_global_norm, adam) path.

The flat-parameter mode (`make_train_step(..., unravel=...)` +
`build_optimizer("fused_adam")`) must be a pure performance change: same
parameters after N steps as the generic tree path, same nan-skip
semantics (reference `espnet2/train/trainer.py:653-697`).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.steps import TrainState, make_train_step


class TinyModel(nn.Module):
    @nn.compact
    def __call__(self, x, xl, y, yl, deterministic=True):
        h = nn.Dense(16)(x)
        h = nn.relu(h)
        h = nn.Dense(4)(h)
        loss = jnp.mean((h - y) ** 2)
        return loss, {"loss": loss}


def _batch(seed=0, poison=False):
    rng = np.random.RandomState(seed)
    x = rng.randn(4, 8, 8).astype(np.float32)
    if poison:
        x[0, 0, 0] = np.inf
    return {
        "speech": jnp.asarray(x),
        "speech_lengths": jnp.full((4,), 8, jnp.int32),
        "text": jnp.asarray(rng.randn(4, 8, 4).astype(np.float32)),
        "text_lengths": jnp.full((4,), 8, jnp.int32),
    }


def _setup():
    model = TinyModel()
    b = _batch()
    params = model.init(jax.random.PRNGKey(0), b["speech"],
                        b["speech_lengths"], b["text"], b["text_lengths"],
                        True)["params"]
    return model, params


def test_flat_matches_tree_path():
    model, params = _setup()
    kw = dict(lr=3e-3, schedule="warmuplr", warmup_steps=5, d_model=16,
              betas=(0.9, 0.98), eps=1e-9, grad_clip=5.0)
    tx_tree = build_optimizer("adam", **kw)
    tx_flat = build_optimizer("fused_adam", **kw)
    flat, unravel = ravel_pytree(params)

    st_t = TrainState.create(params, tx_tree, {})
    st_f = TrainState.create(flat, tx_flat, {})
    step_t = make_train_step(model, tx_tree, rng_names=("dropout",),
                             donate=False)
    step_f = make_train_step(model, tx_flat, rng_names=("dropout",),
                             donate=False, unravel=unravel)
    rng = jax.random.PRNGKey(1)
    for i in range(4):
        b = _batch(seed=i)
        st_t, stats_t = step_t(st_t, b, rng)
        st_f, stats_f = step_f(st_f, b, rng)
        np.testing.assert_allclose(float(stats_t["grad_norm"]),
                                   float(stats_f["grad_norm"]), rtol=1e-5)
    pt = ravel_pytree(st_t.params)[0]
    np.testing.assert_allclose(np.asarray(st_f.params), np.asarray(pt),
                               rtol=1e-5, atol=1e-6)


def test_flat_nan_skip():
    model, params = _setup()
    tx = build_optimizer("fused_adam", lr=1e-3, schedule="constant",
                         grad_clip=5.0)
    flat, unravel = ravel_pytree(params)
    st = TrainState.create(flat, tx, {})
    step = make_train_step(model, tx, rng_names=("dropout",), donate=False,
                           unravel=unravel)
    rng = jax.random.PRNGKey(2)
    st1, stats = step(st, _batch(poison=True), rng)
    assert float(stats["skipped"]) == 1.0
    np.testing.assert_array_equal(np.asarray(st1.params),
                                  np.asarray(st.params))
    assert int(st1.opt_state["count"]) == 0
    assert int(st1.step) == 1  # step counter advances like the tree path
    st2, stats2 = step(st1, _batch(poison=False), rng)
    assert float(stats2["skipped"]) == 0.0
    assert int(st2.opt_state["count"]) == 1
    assert not np.array_equal(np.asarray(st2.params), np.asarray(st1.params))


def test_flat_clip_engages():
    model, params = _setup()
    kw = dict(lr=1e-2, schedule="constant", grad_clip=1e-4)
    tx_tree = build_optimizer("adam", **kw)
    tx_flat = build_optimizer("fused_adam", **kw)
    flat, unravel = ravel_pytree(params)
    st_t = TrainState.create(params, tx_tree, {})
    st_f = TrainState.create(flat, tx_flat, {})
    step_t = make_train_step(model, tx_tree, rng_names=("dropout",),
                             donate=False)
    step_f = make_train_step(model, tx_flat, rng_names=("dropout",),
                             donate=False, unravel=unravel)
    rng = jax.random.PRNGKey(3)
    st_t, _ = step_t(st_t, _batch(), rng)
    st_f, _ = step_f(st_f, _batch(), rng)
    np.testing.assert_allclose(np.asarray(st_f.params),
                               np.asarray(ravel_pytree(st_t.params)[0]),
                               rtol=1e-5, atol=1e-7)


def test_trainer_flat_optimizer_mode():
    from espnet_tpu.train.trainer import Trainer, TrainerOptions

    model = TinyModel()
    tx = build_optimizer("fused_adam", lr=1e-3, schedule="constant")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tr = Trainer(model, tx, d,
                     TrainerOptions(max_epoch=2, flat_optimizer=True,
                                    keep_nbest=1),
                     rng_names=("dropout",))
        b = {k: np.asarray(v) for k, v in _batch().items()}
        state = tr.init_state(b)
        assert state.params.ndim == 1  # flat vector

        class OneBatch:
            def epoch(self, epoch):
                yield b

            def __len__(self):
                return 1

            def num_steps(self):
                return 1

        state = tr.run(state, OneBatch())
        assert int(state.step) == 2
        # epoch params are saved as the TREE, not the vector
        import flax.serialization as ser

        raw = (tr.ckpt.params_path(2)).read_bytes()
        tree = ser.msgpack_restore(raw)
        assert "Dense_0" in tree
