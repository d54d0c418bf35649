"""ST and MT model + task tests.

Mirrors the reference tests for `espnet2/st` / `espnet2/mt`
(test/espnet2/st/test_espnet_model.py etc.: tiny models, forward/backward,
task e2e on toy data).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_st_model_forward_backward():
    from espnet_tpu.models.st import STConfig, STModel

    cfg = STConfig(
        vocab_size=12, src_vocab_size=10, input_type="feats", n_mels=8,
        use_specaug=False, normalize="utterance_mvn",
        encoder_type="transformer", d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=1, num_decoder_layers=1, decoder_d_ff=32,
        num_asr_decoder_layers=1, dropout_rate=0.0,
        asr_weight=0.3, mtlalpha=0.5,
    )
    model = STModel(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 40, 8))
    flens = jnp.array([40, 24])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    src = jnp.array([[2, 4, 0], [6, 3, 1]], jnp.int32)
    slens = jnp.array([2, 3])
    params = model.init(rng, feats, flens, text, tlens, src, slens)
    loss, stats = model.apply(params, feats, flens, text, tlens, src, slens)
    assert np.isfinite(float(loss))
    assert "loss_st" in stats and "loss_asr_ctc" in stats and "loss_asr_att" in stats
    g = jax.grad(
        lambda p: model.apply(p, feats, flens, text, tlens, src, slens)[0]
    )(params)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_mt_model_forward_backward():
    from espnet_tpu.models.mt import MTConfig, MTModel

    cfg = MTConfig(
        vocab_size=12, src_vocab_size=10, d_model=16, num_heads=2, d_ff=32,
        num_encoder_layers=1, num_decoder_layers=1, decoder_d_ff=32,
        dropout_rate=0.0,
    )
    model = MTModel(cfg)
    rng = jax.random.PRNGKey(0)
    src = jnp.array([[2, 4, 5, 0], [6, 3, 0, 0]], jnp.int32)
    slens = jnp.array([3, 2])
    text = jnp.array([[3, 5, 2, 0], [7, 1, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2])
    params = model.init(rng, src, slens, text, tlens)
    loss, stats = model.apply(params, src, slens, text, tlens)
    assert np.isfinite(float(loss)) and "acc" in stats


def test_mt_learns_toy_translation():
    """A tiny MT model must learn word-reversal on a toy corpus (loss
    falls substantially)."""
    import optax

    from espnet_tpu.models.mt import MTConfig, MTModel

    rng_np = np.random.RandomState(0)
    v = 10
    b, u = 16, 5

    def make_batch():
        src = rng_np.randint(1, v - 1, (b, u)).astype(np.int32)
        tgt = src[:, ::-1].copy()
        lens = np.full((b,), u, np.int32)
        return (jnp.asarray(src), jnp.asarray(lens),
                jnp.asarray(tgt), jnp.asarray(lens))

    cfg = MTConfig(
        vocab_size=v, src_vocab_size=v, d_model=32, num_heads=2, d_ff=64,
        num_encoder_layers=1, num_decoder_layers=1, decoder_d_ff=64,
        dropout_rate=0.0, lsm_weight=0.0,
    )
    model = MTModel(cfg)
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), *batch)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, *batch)[0]
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(model.apply(params, *batch)[0])
    for i in range(200):
        params, opt_state, loss = step(params, opt_state, make_batch())
    assert float(loss) < loss0 * 0.5, (loss0, float(loss))


def test_st_mt_cli(tmp_path):
    from espnet_tpu.bin.mt_train import main as mt_main
    from espnet_tpu.bin.st_train import main as st_main
    from espnet_tpu.data.synth import generate_mt_corpus, generate_st_corpus

    generate_st_corpus(tmp_path / "st_data", n_utts=8, max_words=3)
    st_main([
        "--run.output_dir", str(tmp_path / "st_exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "st_data"),
        "--data.valid_dir", str(tmp_path / "st_data"),
        "--data.batch_size", "4",
        "--model.n_mels", "16", "--model.use_specaug", "false",
        "--model.normalize", "utterance_mvn",
        "--model.encoder_type", "transformer",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1", "--model.decoder_d_ff", "32",
        "--model.num_asr_decoder_layers", "1",
        "--model.asr_weight", "0.3", "--model.mtlalpha", "0.5",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    assert (tmp_path / "st_exp" / "checkpoint.msgpack").exists()
    assert (tmp_path / "st_exp" / "src_tokens.txt").exists()

    generate_mt_corpus(tmp_path / "mt_data", n_utts=40, max_words=4)
    mt_main([
        "--run.output_dir", str(tmp_path / "mt_exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "mt_data"),
        "--data.valid_dir", str(tmp_path / "mt_data"),
        "--data.batch_size", "8",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1", "--model.decoder_d_ff", "32",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    assert (tmp_path / "mt_exp" / "checkpoint.msgpack").exists()


def test_st_mt_inference_cli(tmp_path):
    from espnet_tpu.bin.mt_inference import main as mti_main
    from espnet_tpu.bin.mt_train import main as mt_main
    from espnet_tpu.bin.st_inference import main as sti_main
    from espnet_tpu.bin.st_train import main as st_main
    from espnet_tpu.data.synth import generate_mt_corpus, generate_st_corpus

    generate_st_corpus(tmp_path / "st_data", n_utts=6, max_words=3)
    st_main([
        "--run.output_dir", str(tmp_path / "st_exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "st_data"),
        "--data.batch_size", "3",
        "--model.n_mels", "16", "--model.use_specaug", "false",
        "--model.normalize", "utterance_mvn",
        "--model.encoder_type", "transformer",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1", "--model.decoder_d_ff", "32",
        "--model.asr_weight", "0.0", "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    sti_main([
        "--exp_dir", str(tmp_path / "st_exp"),
        "--data_dir", str(tmp_path / "st_data"),
        "--output_dir", str(tmp_path / "st_dec"),
        "--beam_size", "2", "--max_steps", "16", "--batch_size", "3",
    ])
    assert (tmp_path / "st_dec" / "text").exists()
    assert (tmp_path / "st_dec" / "score_wer.txt").exists()

    generate_mt_corpus(tmp_path / "mt_data", n_utts=20, max_words=3)
    mt_main([
        "--run.output_dir", str(tmp_path / "mt_exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "mt_data"),
        "--data.batch_size", "8",
        "--model.d_model", "16", "--model.num_heads", "2",
        "--model.d_ff", "32", "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1", "--model.decoder_d_ff", "32",
        "--model.dropout_rate", "0.0",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    mti_main([
        "--exp_dir", str(tmp_path / "mt_exp"),
        "--data_dir", str(tmp_path / "mt_data"),
        "--output_dir", str(tmp_path / "mt_dec"),
        "--beam_size", "2", "--max_steps", "12", "--batch_size", "8",
    ])
    assert (tmp_path / "mt_dec" / "text").exists()
