"""ProDiff diffusion TTS: model forward/backward/inference + task CLI.

Reference analogue: `test/espnet2/tts/prodiff/` tests (tiny denoiser,
train/inference smoke).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_cfg():
    from espnet_tpu.models.tts.prodiff import ProDiffConfig

    return ProDiffConfig(
        vocab_size=10, n_mels=8, d_model=16, num_heads=2, d_ff=32,
        encoder_layers=1, denoiser_channels=16, denoiser_layers=2,
        timesteps=4, dropout_rate=0.0, max_frames=32,
    )


def test_prodiff_forward_backward_inference():
    from espnet_tpu.models.tts.prodiff import ProDiff

    m = ProDiff(_tiny_cfg())
    b, u, t = 2, 4, 12
    text = jax.random.randint(jax.random.PRNGKey(0), (b, u), 1, 10)
    tl = jnp.array([4, 3])
    mel = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8))
    ml = jnp.array([12, 9])
    dur = jnp.array([[3, 3, 3, 3], [3, 3, 3, 0]], jnp.int32)
    z = jnp.zeros((b, u))
    rngs = {"params": jax.random.PRNGKey(2),
            "diffusion": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)}
    p = m.init(rngs, text, tl, mel, ml, dur, z, z, True)
    loss, stats, _ = m.apply(p, text, tl, mel, ml, dur, z, z, True,
                             rngs={"diffusion": jax.random.PRNGKey(5)})
    assert np.isfinite(float(loss))
    for k in ("l1_loss", "duration_loss", "pitch_loss", "energy_loss"):
        assert k in stats
    g = jax.grad(lambda p: m.apply(
        p, text, tl, mel, ml, dur, z, z, False,
        rngs={"diffusion": jax.random.PRNGKey(6),
              "dropout": jax.random.PRNGKey(7)})[0])(p)
    mx = jax.tree_util.tree_reduce(
        lambda a, x: jnp.maximum(a, jnp.max(jnp.abs(x))), g, 0.0)
    assert np.isfinite(float(mx)) and float(mx) > 0
    out, lens = m.apply(p, text, tl, 32, method=ProDiff.inference,
                        rngs={"diffusion": jax.random.PRNGKey(8)})
    assert out.shape == (b, 32, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_denoiser_learns_identity_at_t0():
    """At t=0 (x_t ~= x0) a few optimisation steps should drive the
    denoiser output towards the clean input — checks the gradient path
    through the step embedding and gated blocks."""
    import optax

    from espnet_tpu.models.tts.prodiff import SpectrogramDenoiser

    den = SpectrogramDenoiser(4, 4, channels=8, layers=2)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 4))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4))
    t = jnp.zeros((2,), jnp.int32)
    p = den.init(jax.random.PRNGKey(2), x0, cond, t)
    tx = optax.adam(1e-2)
    opt = tx.init(p)

    @jax.jit
    def step(p, opt):
        def lf(p):
            return jnp.mean((den.apply(p, x0, cond, t) - x0) ** 2)
        l, g = jax.value_and_grad(lf)(p)
        up, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), opt, l

    l0 = None
    for i in range(50):
        p, opt, l = step(p, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.5 * l0


def test_prodiff_cli(tmp_path):
    """tts_train with tts_type=prodiff on uniform durations + synth."""
    from espnet_tpu.bin.tts_inference import main as synth_main
    from espnet_tpu.bin.tts_train import main as tts_main
    from espnet_tpu.data.fileio import read_2column_text
    from espnet_tpu.data.synth import generate_corpus

    generate_corpus(tmp_path / "data", n_utts=4, min_words=2, max_words=2)
    # uniform teacher durations aligned with char tokens
    texts = read_2column_text(tmp_path / "data" / "text")
    with open(tmp_path / "data" / "durations", "w") as f:
        for k, v in texts.items():
            n_tok = len(v)
            f.write(f"{k} {' '.join(['2'] * n_tok)}\n")
    tts_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1", "--run.log_interval", "1000",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.batch_size", "4",
        "--model.tts_type", "prodiff",
        "--model.n_fft", "512", "--model.hop_length", "128",
        "--model.n_mels", "20", "--model.fmin", "0", "--model.fmax", "none",
        "--model.prodiff.d_model", "16",
        "--model.prodiff.num_heads", "2",
        "--model.prodiff.d_ff", "32",
        "--model.prodiff.encoder_layers", "1",
        "--model.prodiff.predictor_channels", "8",
        "--model.prodiff.denoiser_channels", "8",
        "--model.prodiff.denoiser_layers", "2",
        "--model.prodiff.max_frames", "128",
        "--optim.schedule", "constant",
    ])
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
    synth_main([
        "--exp_dir", str(tmp_path / "exp"),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "synth"),
        "--griffin_lim_iters", "4",
        "--batch_size", "4",
    ])
    assert len(list((tmp_path / "synth" / "wav").glob("*.wav"))) == 4
