"""GAN vocoder (HiFiGAN) training task.

Behavioral spec: reference GAN-TTS vocoder training — the two-optimizer
alternating loop of `espnet2/train/gan_trainer.py:52` over
`espnet2/gan_tts/hifigan/` modules; segment-level training (random fixed
-length audio crops per step) as in parallel_wavegan-style vocoder recipes
(`espnet2/gan_tts/parallel_wavegan/`). Data: a plain wav.scp dir; mels are
computed on device by the same fused frontend the TTS models use, so the
vocoder consumes exactly the features FastSpeech2/Tacotron2 produce.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict

import numpy as np

from espnet_tpu.tasks.abs_task import AbsTask, RunConfig

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class VocoderDataConfig:
    train_dir: str = ""
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    batch_size: int = 16
    segment_size: int = 8192     # samples per crop (multiple of hop*upsample)
    steps_per_epoch: int = 200


@dataclasses.dataclass(frozen=True)
class VocoderModelConfig:
    # hifigan | melgan | multiband_melgan | parallel_wavegan | style_melgan
    generator_type: str = "hifigan"
    # "" = the generator's canonical partner; or any of
    # hifigan_multi | melgan_multi | pwg | style_melgan
    discriminator_type: str = ""
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: tuple = (8, 8, 2, 2)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    pwg_layers: int = 30
    pwg_stacks: int = 3
    style_channels: int = 64
    lambda_feat_match: float = 2.0
    lambda_mel: float = 45.0
    # multi-resolution STFT loss weight (PWG / multi-band MelGAN criterion)
    lambda_stft: float = 0.0


@dataclasses.dataclass(frozen=True)
class VocoderOptimConfig:
    gen_lr: float = 2.0e-4
    disc_lr: float = 2.0e-4
    b1: float = 0.8
    b2: float = 0.99
    grad_clip: float = 5.0


class VocoderTask(AbsTask):
    name = "vocoder"
    sections = {
        "run": RunConfig,
        "optim": VocoderOptimConfig,
        "data": VocoderDataConfig,
        "model": VocoderModelConfig,
    }

    @classmethod
    def build_models(cls, model_cfg: VocoderModelConfig, n_mels: int):
        from espnet_tpu.models.tts.hifigan import (
            HiFiGANGenerator, HiFiGANMultiDiscriminator,
        )
        from espnet_tpu.models.tts.vocoders import (
            MelGANGenerator, MelGANMultiScaleDiscriminator,
            ParallelWaveGANDiscriminator, ParallelWaveGANGenerator,
            StyleMelGANDiscriminator, StyleMelGANGenerator,
        )

        g = model_cfg.generator_type
        if g == "hifigan":
            gen = HiFiGANGenerator(
                in_channels=n_mels,
                channels=model_cfg.channels,
                kernel_size=model_cfg.kernel_size,
                upsample_scales=tuple(model_cfg.upsample_scales),
                resblock_kernel_sizes=tuple(
                    model_cfg.resblock_kernel_sizes),
            )
            default_disc = "hifigan_multi"
        elif g in ("melgan", "multiband_melgan"):
            sub = 4 if g == "multiband_melgan" else 1
            gen = MelGANGenerator(
                in_channels=n_mels, out_channels=sub,
                channels=model_cfg.channels,
                kernel_size=model_cfg.kernel_size,
                upsample_scales=tuple(model_cfg.upsample_scales),
            )
            default_disc = "melgan_multi"
        elif g == "parallel_wavegan":
            gen = ParallelWaveGANGenerator(
                in_channels=n_mels, layers=model_cfg.pwg_layers,
                stacks=model_cfg.pwg_stacks,
                upsample_scales=tuple(model_cfg.upsample_scales),
            )
            default_disc = "pwg"
        elif g == "style_melgan":
            gen = StyleMelGANGenerator(
                aux_channels=n_mels, channels=model_cfg.style_channels,
            )
            default_disc = "style_melgan"
        else:
            raise ValueError(f"unknown generator_type {g}")
        d = model_cfg.discriminator_type or default_disc
        if d == "hifigan_multi":
            disc = HiFiGANMultiDiscriminator()
        elif d == "melgan_multi":
            disc = MelGANMultiScaleDiscriminator()
        elif d == "pwg":
            disc = ParallelWaveGANDiscriminator()
        elif d == "style_melgan":
            disc = StyleMelGANDiscriminator()
        else:
            raise ValueError(f"unknown discriminator_type {d}")
        return gen, disc

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        import jax
        import jax.numpy as jnp
        import optax

        from espnet_tpu.data.fileio import SoundScpReader
        from espnet_tpu.models.tts.hifigan import HiFiGANGenerator
        from espnet_tpu.ops.stft import log_mel_spectrogram
        from espnet_tpu.train.checkpoint import save_pytree
        from espnet_tpu.train.gan_steps import (
            GANLossWeights, GANTrainState, make_gan_train_step,
        )

        run: RunConfig = cfg["run"]
        data: VocoderDataConfig = cfg["data"]
        model_cfg: VocoderModelConfig = cfg["model"]
        opt: VocoderOptimConfig = cfg["optim"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        gen, disc = cls.build_models(model_cfg, data.n_mels)
        upsample = gen.upsample_factor
        if upsample != data.hop_length:
            logger.warning(
                "upsample factor %d != hop_length %d — generator output "
                "length will not match the mel grid", upsample, data.hop_length,
            )
        seg = data.segment_size - data.segment_size % data.hop_length
        mel_frames = seg // data.hop_length

        # load corpus into memory (vocoder corpora are wav-only)
        reader = SoundScpReader(Path(data.train_dir) / "wav.scp")
        waves = []
        for k in reader.keys():
            w, sr = reader[k]
            if w.ndim > 1:
                w = w[:, 0]
            if len(w) >= seg + data.n_fft:
                waves.append(w.astype(np.float32))
        if not waves:
            raise ValueError(
                f"no utterance longer than segment_size={seg} in "
                f"{data.train_dir}"
            )
        logger.info("vocoder corpus: %d usable utterances", len(waves))

        rng = jax.random.PRNGKey(run.seed)
        mel0 = jnp.zeros((1, mel_frames, data.n_mels))
        gen_params = gen.init(
            {"params": rng, "noise": jax.random.fold_in(rng, 1)}, mel0
        )["params"]
        disc_params = disc.init(rng, jnp.zeros((1, seg, 1)))["params"]

        def make_tx(lr):
            return optax.chain(
                optax.clip_by_global_norm(opt.grad_clip),
                optax.adam(lr, b1=opt.b1, b2=opt.b2),
            )

        gen_tx, disc_tx = make_tx(opt.gen_lr), make_tx(opt.disc_lr)
        state = GANTrainState.create(
            gen_params, gen_tx, disc_params, disc_tx,
            rng=jax.random.fold_in(rng, 2),
        )
        step_fn = jax.jit(make_gan_train_step(
            gen, disc, gen_tx, disc_tx,
            GANLossWeights(
                adv=1.0, feat_match=model_cfg.lambda_feat_match,
                mel=model_cfg.lambda_mel, stft=model_cfg.lambda_stft,
                fs=data.fs, n_fft=data.n_fft,
                hop_length=data.hop_length, n_mels=data.n_mels,
            ),
        ))

        mel_fn = jax.jit(
            lambda w: log_mel_spectrogram(
                w, jnp.full((w.shape[0],), seg, jnp.int32), data.fs,
                data.n_fft, data.hop_length, None, data.n_mels,
            )[0][:, :mel_frames]
        )

        np_rng = np.random.RandomState(run.seed)
        for epoch in range(1, run.max_epoch + 1):
            agg: Dict[str, float] = {}
            for it in range(data.steps_per_epoch):
                batch_wav = np.stack([
                    _crop(waves[np_rng.randint(len(waves))], seg, np_rng)
                    for _ in range(data.batch_size)
                ])
                wav_j = jnp.asarray(batch_wav)
                mel = mel_fn(wav_j)
                state, stats = step_fn(state, mel, wav_j)
                for k, v in jax.device_get(stats).items():
                    agg[k] = agg.get(k, 0.0) + float(v)
            n = data.steps_per_epoch
            msg = ", ".join(f"{k}={v / n:.4g}" for k, v in sorted(agg.items()))
            logger.info("vocoder epoch %d: %s", epoch, msg)
            save_pytree(out / "generator.msgpack", state.gen_params)
            save_pytree(out / "discriminator.msgpack", state.disc_params)
        logger.info("vocoder training finished: %s", out)
        return state, gen


def _crop(wav: np.ndarray, seg: int, rng: np.random.RandomState) -> np.ndarray:
    start = rng.randint(0, len(wav) - seg + 1)
    return wav[start:start + seg]
