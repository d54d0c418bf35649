"""Multi-encoder ASR (mulenc).

Reference analogue: `test/test_e2e_asr_mulenc.py` (forward/backward over
num_encs streams, ctc weight combinations, decoding).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.mulenc import (
    ASRMulEncModel,
    MulEncConfig,
    _parse_weights,
)


def _cfg(**kw):
    base = dict(
        vocab_size=12, num_encoders=2, encoder_type="transformer",
        n_mels=20, use_specaug=False, d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=1, num_decoder_layers=1, decoder_d_ff=32,
        dropout_rate=0.0,
    )
    base.update(kw)
    return MulEncConfig(**base)


def _batch(b=2, n=1600, e=2, u=3, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(b, n, e), jnp.float32),
        jnp.asarray(rng.randint(n // 2, n + 1, (b, e)), jnp.int32),
        jnp.asarray(rng.randint(1, 10, (b, u)), jnp.int32),
        jnp.asarray(rng.randint(1, u + 1, (b,)), jnp.int32),
    )


def test_parse_weights():
    assert _parse_weights("", 2) == (0.5, 0.5)
    np.testing.assert_allclose(_parse_weights("3,1", 2), (0.75, 0.25))
    with pytest.raises(ValueError):
        _parse_weights("1,2,3", 2)


@pytest.mark.parametrize("share_ctc", [False, True])
def test_forward_backward(share_ctc):
    cfg = _cfg(share_ctc=share_ctc, weights_ctc_train="2,1")
    model = ASRMulEncModel(cfg)
    args = _batch()
    variables = nn.meta.unbox(model.init(jax.random.PRNGKey(0), *args, True))

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, *args, True)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    # per-encoder CTC losses reported (reference Reporter loss_ctc{i})
    assert "loss_ctc1" in stats and "loss_ctc2" in stats
    w = _parse_weights("2,1", 2)
    np.testing.assert_allclose(
        float(stats["loss_ctc"]),
        w[0] * float(stats["loss_ctc1"]) + w[1] * float(stats["loss_ctc2"]),
        rtol=1e-5,
    )
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in flat)
    # share_ctc -> exactly one ctc head
    heads = [k for k in variables["params"] if k.startswith("ctc_head")]
    assert len(heads) == (1 if share_ctc else 2)


def test_encode_and_fused_ctc_shapes():
    cfg = _cfg()
    model = ASRMulEncModel(cfg)
    args = _batch()
    variables = nn.meta.unbox(model.init(jax.random.PRNGKey(0), *args, True))
    enc, elens = model.apply(variables, args[0], args[1],
                             method=ASRMulEncModel.encode)
    assert enc.ndim == 4 and enc.shape[1] == 2
    lp = model.apply(variables, enc, method=ASRMulEncModel.ctc_log_probs)
    assert lp.shape == (2, enc.shape[2], 12)
    # fused log-probs are normalised
    np.testing.assert_allclose(
        np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4
    )


def test_score_step_matches_full_forward():
    """Incremental decoding with KV cache == teacher-forced forward."""
    cfg = _cfg()
    model = ASRMulEncModel(cfg)
    args = _batch(b=1, u=4)
    variables = nn.meta.unbox(model.init(jax.random.PRNGKey(0), *args, True))
    enc, elens = model.apply(variables, args[0], args[1],
                             method=ASRMulEncModel.encode)
    toks = jnp.asarray([[11, 3, 5, 2]], jnp.int32)  # sos + 3 tokens
    tl = jnp.asarray([4], jnp.int32)

    def full(m):
        return m.decoder(toks, tl, enc, elens, True)

    logits = nn.apply(full, model)(variables)
    want = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

    cache = model.apply(variables, 1, 5,
                        method=ASRMulEncModel.decoder_init_cache)
    for pos in range(4):
        lp, cache = model.apply(
            variables, toks[:, pos], pos, enc, elens, cache,
            method=ASRMulEncModel.decoder_score_step,
        )
        np.testing.assert_allclose(
            np.asarray(lp[0]), np.asarray(want[0, pos]), rtol=2e-3,
            atol=2e-3,
        )


def test_mulenc_cli_pipeline(tmp_path):
    from espnet_tpu.bin.asr_mulenc_inference import main as infer_main
    from espnet_tpu.bin.asr_mulenc_train import main as train_main
    from espnet_tpu.data.synth import generate_mulenc_corpus

    generate_mulenc_corpus(tmp_path / "train", n_utts=12, min_words=2,
                           max_words=3)
    generate_mulenc_corpus(tmp_path / "test", n_utts=3, min_words=2,
                           max_words=3, seed=9)
    train_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "2",
        "--run.log_interval", "1000",
        "--data.train_dir", str(tmp_path / "train"),
        "--data.valid_dir", str(tmp_path / "train"),
        "--data.batch_size", "6",
        "--model.n_mels", "20",
        "--model.use_specaug", "false",
        "--model.d_model", "16",
        "--model.num_heads", "2",
        "--model.d_ff", "32",
        "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1",
        "--model.decoder_d_ff", "32",
        "--model.dropout_rate", "0.0",
        "--model.weights_ctc_train", "1,1",
        "--optim.schedule", "constant",
    ])
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
    hyps = infer_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "test"),
        "--output_dir", str(tmp_path / "decode"),
        "--beam_size", "2",
        "--max_steps", "16",
        "--batch_size", "3",
    ])
    assert len(hyps) == 3
    assert (tmp_path / "decode" / "score_wer.txt").exists()
