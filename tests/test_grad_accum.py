"""Gradient accumulation: accum=4 over batch B equals accum=1 over batch B.

Reference semantics: `espnet2/train/trainer.py:619-701` (accum_grad
micro-batches between optimizer steps). Here accumulation is folded into
the compiled step (micro-batch `lax.scan` in `train/steps.py`), so with a
deterministic model and uniform lengths the accumulated gradient is
numerically the full-batch gradient and the updated parameters match.
"""

import numpy as np

import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRConfig, ASRModel
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.steps import TrainState, make_train_step


def _setup(b=8):
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
    tx = build_optimizer("sgd", lr=1e-1, schedule="constant")
    rng = np.random.RandomState(0)
    # uniform lengths so per-microbatch token-mean losses average exactly
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
    extra = {k: v for k, v in variables.items() if k != "params"}

    def fresh_state():
        return TrainState.create(variables["params"], tx, extra)

    return model, tx, fresh_state, batch


def test_accum4_matches_accum1():
    model, tx, fresh_state, batch = _setup(b=8)
    key = jax.random.PRNGKey(3)
    step1 = make_train_step(model, tx, donate=False)
    step4 = make_train_step(model, tx, donate=False, accum_steps=4)
    s1, st1 = step1(fresh_state(), batch, key)
    s4, st4 = step4(fresh_state(), batch, key)
    np.testing.assert_allclose(
        float(st1["loss"]), float(st4["loss"]), rtol=2e-5
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s4.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)
    assert int(s4.step) == 1


def test_accum_indivisible_batch_falls_back_to_divisor():
    # B=8 with accum=3 silently uses the largest divisor (2): still exact.
    model, tx, fresh_state, batch = _setup(b=8)
    key = jax.random.PRNGKey(3)
    step1 = make_train_step(model, tx, donate=False)
    step3 = make_train_step(model, tx, donate=False, accum_steps=3)
    s1, st1 = step1(fresh_state(), batch, key)
    s3, st3 = step3(fresh_state(), batch, key)
    np.testing.assert_allclose(
        float(st1["loss"]), float(st3["loss"]), rtol=2e-5
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s3.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)
