"""Target speaker extraction: model forward/backward, enrollment
sensitivity, CLI end-to-end.

Reference analogue: `test/espnet2/enh/test_espnet_model_tse.py` and
`test/espnet2/enh/extractor/test_td_speakerbeam_extractor.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_cfg():
    from espnet_tpu.models.enh.tse import TSEConfig

    return TSEConfig(
        enc_channels=16, enc_kernel=16, enc_stride=8, layers=2, stacks=2,
        bottleneck=8, hidden=16, kernel=3, i_adapt_layer=2,
        adapt_enroll_dim=8, aux_layers=1,
    )


def test_tse_forward_backward_and_enroll_sensitivity():
    from espnet_tpu.models.enh.tse import TSEModel

    model = TSEModel(_tiny_cfg())
    rng = jax.random.PRNGKey(0)
    mix = jax.random.normal(rng, (2, 2000))
    lens = jnp.array([2000, 1500])
    enroll = jax.random.normal(jax.random.PRNGKey(1), (2, 1200))
    elens = jnp.array([1200, 800])
    ref = jax.random.normal(jax.random.PRNGKey(2), (2, 2000))
    params = model.init(rng, mix, lens, enroll, elens, ref)
    loss, stats = model.apply(params, mix, lens, enroll, elens, ref)
    assert np.isfinite(float(loss)) and "si_snr" in stats
    g = jax.grad(
        lambda p: model.apply(p, mix, lens, enroll, elens, ref)[0]
    )(params)
    # gradient reaches the adaptation projection and the aux net
    g_ex = g["params"]["extractor"]
    for key in ("adapt_mul", "aux_out"):
        mx = jax.tree_util.tree_reduce(
            lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g_ex[key], 0.0
        )
        assert float(mx) > 0, key
    # a different enrollment must change the extraction
    est1, _ = model.apply(params, mix, lens, enroll, elens,
                          method=TSEModel.forward_enhance)
    enroll2 = jax.random.normal(jax.random.PRNGKey(9), (2, 1200))
    est2, _ = model.apply(params, mix, lens, enroll2, elens,
                          method=TSEModel.forward_enhance)
    assert float(jnp.max(jnp.abs(est1 - est2))) > 1e-6


def test_tse_cli(tmp_path):
    from espnet_tpu.bin.tse_inference import main as ti_main
    from espnet_tpu.bin.tse_train import main as tt_main
    from espnet_tpu.data.synth import generate_tse_corpus

    generate_tse_corpus(tmp_path / "data", n_utts=8)
    generate_tse_corpus(tmp_path / "test", n_utts=3, seed=7)
    tt_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.valid_dir", str(tmp_path / "data"),
        "--data.batch_size", "4",
        "--model.enc_channels", "16", "--model.enc_kernel", "16",
        "--model.enc_stride", "8", "--model.layers", "2",
        "--model.stacks", "1", "--model.bottleneck", "8",
        "--model.hidden", "16", "--model.i_adapt_layer", "1",
        "--model.adapt_enroll_dim", "8", "--model.aux_layers", "1",
        "--optim.schedule", "constant", "--optim.lr", "0.001",
    ])
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
    ti_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "test"),
        "--output_dir", str(tmp_path / "ext"),
        "--batch_size", "3",
    ])
    assert (tmp_path / "ext" / "spk1.scp").exists()
    assert (tmp_path / "ext" / "si_snr.txt").exists()
