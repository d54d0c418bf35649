"""Sharded training tests on the 8-device virtual CPU mesh (SURVEY §4
takeaway: multi-device paths exercised via
xla_force_host_platform_device_count)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRConfig, ASRModel
from espnet_tpu.parallel.api import make_batch_put, shard_state, state_shardings
from espnet_tpu.parallel.mesh import make_mesh
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.steps import TrainState, make_train_step


def _setup(model_parallel=1, b=8, optimizer="adam"):
    cfg = ASRConfig(
        vocab_size=16,
        input_type="feats",
        n_mels=8,
        use_specaug=False,
        normalize="utterance_mvn",
        encoder_type="transformer",
        d_model=16,
        num_heads=2,
        d_ff=32,
        num_encoder_layers=1,
        num_decoder_layers=1,
        decoder_d_ff=32,
        dropout_rate=0.0,
        ctc_weight=0.5,
    )
    model = ASRModel(cfg)
    tx = build_optimizer(optimizer, lr=1e-3, schedule="constant")
    rng = np.random.RandomState(0)
    batch = {
        "speech": rng.randn(b, 40, 8).astype(np.float32),
        "speech_lengths": np.full((b,), 40, np.int32),
        "text": rng.randint(1, 14, (b, 5)).astype(np.int32),
        "text_lengths": np.full((b,), 5, np.int32),
    }
    args = tuple(
        jnp.asarray(batch[k])
        for k in ("speech", "speech_lengths", "text", "text_lengths")
    )
    variables = model.init(jax.random.PRNGKey(0), *args, True)
    state = TrainState.create(
        variables["params"], tx,
        {k: v for k, v in variables.items() if k != "params"},
    )
    return model, tx, state, batch


def test_eight_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step(model_parallel):
    model, tx, boxed_state, batch = _setup(model_parallel)
    mesh = make_mesh(model_parallel)
    shardings = state_shardings(boxed_state, mesh)
    state = shard_state(boxed_state, shardings)
    put = make_batch_put(mesh)
    db = put(batch)
    step = make_train_step(model, tx)
    with mesh:
        state, stats = step(state, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["loss"]))
    assert int(state.step) == 1


def test_sharded_matches_single_device():
    """DP-sharded step == single-device step (same math, psum'd grads).

    SGD so the parameter delta is proportional to the gradient — adam's
    step-1 update is ~sign(g) and amplifies FP reduction-order noise.
    """
    model, tx, boxed_state, batch = _setup(b=8, optimizer="sgd")
    import flax.linen as nn

    raw_state = nn.meta.unbox(boxed_state)
    step = make_train_step(model, tx, donate=False)

    # single device
    db1 = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, stats1 = step(raw_state, db1, jax.random.PRNGKey(1))

    # 8-way data parallel
    mesh = make_mesh(1)
    shardings = state_shardings(boxed_state, mesh)
    state = shard_state(boxed_state, shardings)
    db8 = make_batch_put(mesh)(batch)
    with mesh:
        s8, stats8 = step(state, db8, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(stats1["loss"]), float(stats8["loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_batch_put_rejects_indivisible_by_default():
    model, tx, boxed_state, batch = _setup(b=6)  # 6 not divisible by 8
    mesh = make_mesh(1)
    with pytest.raises(ValueError, match="size_multiple"):
        make_batch_put(mesh)(batch)
    # throughput-only escape hatch keeps the old repeat-padding
    db = make_batch_put(mesh, allow_pad=True)(batch)
    assert db["speech"].shape[0] == 8


def test_sampler_size_multiple():
    import numpy as np
    from espnet_tpu.data.sampler import build_batches

    rng = np.random.RandomState(0)
    shapes = {
        "speech": {f"u{i}": int(rng.randint(100, 1000)) for i in range(37)},
        "text": {f"u{i}": int(rng.randint(2, 20)) for i in range(37)},
    }
    batches = build_batches(shapes, batch_size=8, size_multiple=4)
    covered = [k for b in batches for k in b.keys]
    assert all(len(b.keys) % 4 == 0 for b in batches)
    assert len(set(covered)) == len(covered)
    assert len(covered) == 36  # 37 -> one tail utterance dropped


def test_zero_optimizer_state_sharding():
    """ZeRO-1: optimizer moments shard over the data axis and the training
    math is unchanged (reference fairscale-OSS role, SURVEY §2.6)."""
    import flax.linen as nn
    from jax.sharding import PartitionSpec as P

    model, tx, boxed_state, batch = _setup(b=8, optimizer="sgd")
    raw_state = nn.meta.unbox(boxed_state)
    step = make_train_step(model, tx, donate=False)

    # baseline: plain DP
    mesh = make_mesh(2)  # data=4, model=2
    base_sh = state_shardings(boxed_state, mesh)
    s_base = shard_state(boxed_state, base_sh)
    db = make_batch_put(mesh)(batch)
    with mesh:
        s_base, stats_base = step(s_base, db, jax.random.PRNGKey(1))

    zero_sh = state_shardings(boxed_state, mesh, zero=True)
    # at least one optimizer-state tensor actually takes the data axis
    specs = [
        s.spec for s in jax.tree_util.tree_leaves(
            zero_sh.opt_state,
            is_leaf=lambda x: hasattr(x, "spec"),
        )
    ]
    assert any("data" in [p for p in sp if p] for sp in specs if sp), specs
    # params keep their non-ZeRO layout
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b_: a == b_, zero_sh.params, base_sh.params,
            is_leaf=lambda x: hasattr(x, "spec"),
        )
    )

    s_zero = shard_state(boxed_state, zero_sh)
    with mesh:
        s_zero, stats_zero = step(s_zero, db, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(stats_base["loss"]), float(stats_zero["loss"]), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_base.params),
                     jax.tree_util.tree_leaves(s_zero.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_distributed_decode_matches_single_device():
    """Beam-search decode sharded over the data axis (SURVEY §2.7
    'distributed decode'): same hypotheses and scores as unsharded."""
    from espnet_tpu.decode.asr_inference import Speech2Text

    cfg = ASRConfig(
        vocab_size=16, input_type="feats", n_mels=8, use_specaug=False,
        normalize="utterance_mvn", encoder_type="transformer", d_model=16,
        num_heads=2, d_ff=32, num_encoder_layers=1, num_decoder_layers=1,
        decoder_d_ff=32, dropout_rate=0.0, ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (8, 30, 8))
    flens = jnp.array([30, 25, 30, 18, 30, 22, 30, 12])
    text = jnp.ones((8, 3), jnp.int32)
    tlens = jnp.full((8,), 3)
    params = model.init(rng, feats, flens, text, tlens, True)["params"]

    base = Speech2Text(model, params, beam_size=3, ctc_weight=0.3,
                       max_steps=6)
    res0 = base(np.asarray(feats), np.asarray(flens))

    mesh = make_mesh(model_parallel=2)  # 4 x 2 on the 8-device CPU mesh
    sharded = Speech2Text(model, params, beam_size=3, ctc_weight=0.3,
                          max_steps=6, mesh=mesh)
    res1 = sharded(np.asarray(feats), np.asarray(flens))
    for a, b in zip(res0, res1):
        assert a.token_ids == b.token_ids
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-4)


def test_distributed_decode_pads_indivisible_batch():
    """A final partial batch (B=5 on a data-axis of 4) is repeat-padded
    internally and the results sliced back to B, matching single-device
    output (VERDICT r2 weak #5; recipe-side nj sharding semantics,
    `egs/mini_an4/asr1/run.sh:297-311`)."""
    from espnet_tpu.decode.asr_inference import Speech2Text

    cfg = ASRConfig(
        vocab_size=16, input_type="feats", n_mels=8, use_specaug=False,
        normalize="utterance_mvn", encoder_type="transformer", d_model=16,
        num_heads=2, d_ff=32, num_encoder_layers=1, num_decoder_layers=1,
        decoder_d_ff=32, dropout_rate=0.0, ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (5, 30, 8))
    flens = jnp.array([30, 25, 30, 18, 22])
    text = jnp.ones((5, 3), jnp.int32)
    tlens = jnp.full((5,), 3)
    params = model.init(rng, feats, flens, text, tlens, True)["params"]

    base = Speech2Text(model, params, beam_size=3, ctc_weight=0.3,
                       max_steps=6)
    res0 = base(np.asarray(feats), np.asarray(flens),
                keys=[f"u{i}" for i in range(5)])

    mesh = make_mesh(model_parallel=2)
    sharded = Speech2Text(model, params, beam_size=3, ctc_weight=0.3,
                          max_steps=6, mesh=mesh)
    res1 = sharded(np.asarray(feats), np.asarray(flens),
                   keys=[f"u{i}" for i in range(5)])
    assert len(res1) == 5
    for a, b in zip(res0, res1):
        assert a.key == b.key
        assert a.token_ids == b.token_ids
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-4)
