"""Multi-speaker (PIT) ASR: permutation invariance, forward/backward,
CLI end-to-end.

Reference analogue: `test/test_e2e_asr_mix.py` /
`test_e2e_asr_mix_transformer.py` (tiny model forward/backward +
recognize).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_cfg(vocab=10):
    from espnet_tpu.models.asr_mix import ASRMixConfig

    return ASRMixConfig(
        vocab_size=vocab, num_spk=2, n_mels=16, use_specaug=False,
        d_model=16, num_heads=2, d_ff=32, num_shared_layers=1,
        num_branch_layers=1, conformer_kernel_size=7,
        num_decoder_layers=1, decoder_d_ff=32, dropout_rate=0.0,
    )


def test_pit_loss_is_permutation_invariant():
    from espnet_tpu.models.asr_mix import ASRMixModel

    model = ASRMixModel(_tiny_cfg())
    sp = jax.random.normal(jax.random.PRNGKey(0), (2, 6000))
    sl = jnp.array([6000, 5000])
    text = jnp.asarray([[[1, 2, 3, 0], [4, 5, 0, 0]],
                        [[6, 7, 0, 0], [8, 1, 2, 0]]], jnp.int32)
    tlens = jnp.asarray([[3, 2], [2, 3]], jnp.int32)
    p = model.init(jax.random.PRNGKey(1), sp, sl, text, tlens, True)
    loss, stats = model.apply(p, sp, sl, text, tlens, True)
    # swapping the speaker order of the TARGETS must not change the loss
    loss_sw, _ = model.apply(p, sp, sl, text[:, ::-1], tlens[:, ::-1], True)
    np.testing.assert_allclose(float(loss), float(loss_sw), rtol=1e-5)
    g = jax.grad(lambda p: model.apply(p, sp, sl, text, tlens, True)[0])(p)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0)
    assert np.isfinite(float(mx)) and float(mx) > 0


def test_asr_mix_cli(tmp_path):
    from espnet_tpu.bin.asr_mix_inference import main as mi_main
    from espnet_tpu.bin.asr_mix_train import main as mt_main
    from espnet_tpu.data.synth import generate_asr_mix_corpus

    generate_asr_mix_corpus(tmp_path / "data", n_utts=8)
    mt_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.valid_dir", str(tmp_path / "data"),
        "--data.batch_size", "4",
        "--model.n_mels", "16", "--model.d_model", "16",
        "--model.num_heads", "2", "--model.d_ff", "32",
        "--model.num_shared_layers", "1",
        "--model.num_branch_layers", "1",
        "--model.conformer_kernel_size", "7",
        "--model.num_decoder_layers", "1", "--model.decoder_d_ff", "32",
        "--model.dropout_rate", "0.0", "--model.use_specaug", "false",
        "--optim.schedule", "constant", "--optim.lr", "0.002",
    ])
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
    mi_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "dec"),
        "--batch_size", "4",
    ])
    lines = (tmp_path / "dec" / "text").read_text().strip().splitlines()
    assert len(lines) == 16  # 8 utts x 2 speakers
    assert (tmp_path / "dec" / "score_wer.txt").exists()
