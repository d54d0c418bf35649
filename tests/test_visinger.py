"""VISinger (GAN-SVS): generator forward, score alignment semantics,
tiny end-to-end CLI.

Reference analogue: `test/espnet2/gan_svs/` tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_visinger_cli(tmp_path):
    from espnet_tpu.bin.gan_svs_inference import main as gi_main
    from espnet_tpu.bin.gan_svs_train import main as gt_main
    from espnet_tpu.data.synth import generate_svs_corpus

    generate_svs_corpus(tmp_path / "data", n_utts=4, hop_length=64,
                        min_notes=2, max_notes=3)
    gt_main([
        "--run.output_dir", str(tmp_path / "exp"),
        "--run.max_epoch", "1",
        "--data.train_dir", str(tmp_path / "data"),
        "--data.n_fft", "256", "--data.hop_length", "64",
        "--data.batch_size", "2", "--data.max_seconds", "1.5",
        "--data.steps_per_epoch", "2",
        "--model.channels", "16", "--model.text_heads", "2",
        "--model.text_d_ff", "32", "--model.text_layers", "1",
        "--model.posterior_layers", "2", "--model.flows", "2",
        "--model.flow_layers", "1", "--model.decoder_channels", "16",
        "--model.upsample_scales", "[8,4,2]",
        "--model.resblock_kernel_sizes", "[3]",
        "--model.segment_frames", "8",
        "--model.frame_prior_layers", "1",
        "--model.dropout_rate", "0.0",
    ])
    exp = tmp_path / "exp"
    assert (exp / "generator.msgpack").exists()
    gi_main([
        "--exp_dir", str(exp),
        "--data_dir", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "synth"),
        "--max_frames", "128", "--batch_size", "4",
    ])
    wavs = list((tmp_path / "synth" / "wav").glob("*.wav"))
    assert len(wavs) == 4


def test_visinger_score_alignment():
    """Inference length must equal sum(score durations) * hop upsampling,
    i.e. the score (not MAS) drives the alignment."""
    from espnet_tpu.models.tts.visinger import (
        VISingerConfig, VISingerGenerator,
    )
    from espnet_tpu.models.tts.vits import VITSConfig

    cfg = VISingerConfig(vits=VITSConfig(
        vocab_size=8, channels=8, text_heads=2, text_d_ff=16,
        text_layers=1, spec_dim=33, posterior_layers=1, flows=1,
        flow_layers=1, decoder_channels=8, upsample_scales=(4, 2),
        resblock_kernel_sizes=(3,), n_fft=64, hop_length=8,
        segment_frames=4, dropout_rate=0.0), frame_prior_layers=1)
    gen = VISingerGenerator(cfg)
    b, u = 1, 3
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    midi = jnp.asarray([[60, 64, 67]], jnp.int32)
    dur = jnp.asarray([[5, 7, 4]], jnp.int32)
    tlens = jnp.asarray([3])
    frames = 20
    spec = jax.random.normal(jax.random.PRNGKey(0), (b, frames, 33))
    slens = jnp.asarray([16])
    rngs = {"params": jax.random.PRNGKey(1),
            "posterior": jax.random.PRNGKey(2),
            "segment": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)}
    p = gen.init(rngs, tokens, midi, dur, tlens, spec, slens, True)
    out = gen.apply(p, tokens, midi, dur, tlens, spec, slens, True,
                    rngs={k: v for k, v in rngs.items() if k != "params"})
    assert out["wav_seg"].shape == (b, 4 * 8)
    wav, wav_lens = gen.apply(
        p, tokens, midi, dur, tlens, 32, 0.5,
        method=VISingerGenerator.inference,
        rngs={"posterior": jax.random.PRNGKey(5)},
    )
    assert int(wav_lens[0]) == 16 * 8  # sum(dur)=16 frames * upsample 8
    assert np.all(np.isfinite(np.asarray(wav)))
