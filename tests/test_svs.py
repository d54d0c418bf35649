"""SVS (XiaoiceSing): model forward/backward/inference + task CLI.

Reference analogue: `test/espnet2/svs/test_xiaoice.py` and the svs task
smoke tests (tiny config train + synth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_xiaoice_forward_backward_inference():
    from espnet_tpu.models.svs import XiaoiceSing, XiaoiceSingConfig

    cfg = XiaoiceSingConfig(
        vocab_size=10, n_mels=8, d_model=16, num_heads=2, d_ff=32,
        encoder_layers=1, decoder_layers=1, predictor_channels=8,
        postnet_layers=2, postnet_channels=8, dropout_rate=0.0,
        max_frames=64,
    )
    m = XiaoiceSing(cfg)
    b, u, t = 2, 4, 24
    text = jax.random.randint(jax.random.PRNGKey(0), (b, u), 1, 10)
    midi = jax.random.randint(jax.random.PRNGKey(1), (b, u), 60, 73)
    dur = jnp.array([[6, 6, 6, 6], [8, 8, 8, 0]], jnp.int32)
    tlens = jnp.array([4, 3])
    mel = jax.random.normal(jax.random.PRNGKey(2), (b, t, 8))
    mlens = jnp.array([24, 24])
    rngs = {"params": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)}
    p = m.init(rngs, text, midi, dur, tlens, mel, mlens, True)
    loss, stats, _ = m.apply(p, text, midi, dur, tlens, mel, mlens, True)
    assert np.isfinite(float(loss))
    assert "duration_loss" in stats
    g = jax.grad(lambda p: m.apply(
        p, text, midi, dur, tlens, mel, mlens, True)[0])(p)
    # midi embedding must receive gradient (score conditioning is real)
    mx = jnp.max(jnp.abs(g["params"]["midi_embed"]["embedding"]))
    assert float(mx) > 0
    out, lens = m.apply(p, text, midi, dur, tlens, True,
                        method=XiaoiceSing.inference,
                        rngs={"dropout": jax.random.PRNGKey(5)})
    assert out.shape == (b, 64, 8)
    np.testing.assert_array_equal(np.asarray(lens), [24, 24])


def test_svs_cli(tmp_path):
    from espnet_tpu.bin.svs_inference import main as si_main
    from espnet_tpu.bin.svs_train import main as st_main
    from espnet_tpu.data.synth import generate_svs_corpus

    generate_svs_corpus(tmp_path / "data", n_utts=6, hop_length=128)
    st_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--run.best_metric", "valid.loss.min",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.valid_dir", str(tmp_path / "data"),
        "--data.batch_size", "3",
        "--model.n_fft", "512", "--model.hop_length", "128",
        "--model.n_mels", "20", "--model.fmin", "0", "--model.fmax", "none",
        "--model.xiaoice.d_model", "16",
        "--model.xiaoice.num_heads", "2",
        "--model.xiaoice.d_ff", "32",
        "--model.xiaoice.encoder_layers", "1",
        "--model.xiaoice.decoder_layers", "1",
        "--model.xiaoice.predictor_channels", "8",
        "--model.xiaoice.postnet_layers", "2",
        "--model.xiaoice.postnet_channels", "8",
        "--model.xiaoice.max_frames", "256",
        "--optim.schedule", "constant",
    ])
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
    si_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "synth"),
        "--griffin_lim_iters", "4",
        "--batch_size", "3",
    ])
    assert len(list((tmp_path / "synth" / "wav").glob("*.wav"))) == 6
