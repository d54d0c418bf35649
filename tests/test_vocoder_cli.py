"""Vocoder CLI: train tiny HiFiGAN on synth corpus, then TTS inference
with the neural vocoder instead of Griffin-Lim."""

from pathlib import Path

import numpy as np
import pytest

from espnet_tpu.data.synth import generate_corpus


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_ws")
    generate_corpus(root / "data" / "train", n_utts=6, min_words=2, max_words=3)
    return root


def test_vocoder_train_cli(workspace):
    from espnet_tpu.bin.vocoder_train import main

    main([
        "--run.output_dir", str(workspace / "voc_exp"),
        "--run.max_epoch", "1",
        "--data.train_dir", str(workspace / "data" / "train"),
        "--data.fs", "16000",
        "--data.n_fft", "512",
        "--data.hop_length", "128",
        "--data.n_mels", "24",
        "--data.batch_size", "2",
        "--data.segment_size", "4096",
        "--data.steps_per_epoch", "3",
        "--model.channels", "32",
        "--model.upsample_scales", "[8, 4, 2, 2]",
        "--model.resblock_kernel_sizes", "[3]",
    ])
    exp = workspace / "voc_exp"
    assert (exp / "generator.msgpack").exists()
    assert (exp / "discriminator.msgpack").exists()


def test_vocoder_generator_runs_standalone(workspace):
    import jax
    import jax.numpy as jnp

    from espnet_tpu.tasks.vocoder import VocoderTask
    from espnet_tpu.train.checkpoint import load_pytree
    import flax.linen as nn

    vdir = workspace / "voc_exp"
    vcfg = VocoderTask.load_config(vdir)
    gen, _ = VocoderTask.build_models(vcfg["model"], vcfg["data"].n_mels)
    target = nn.meta.unbox(
        gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 24)))
    )["params"]
    params = load_pytree(vdir / "generator.msgpack", target)
    wav = gen.apply({"params": params}, jnp.zeros((2, 10, 24)))
    assert wav.shape == (2, 10 * 128, 1)
    assert bool(jnp.all(jnp.isfinite(wav)))
