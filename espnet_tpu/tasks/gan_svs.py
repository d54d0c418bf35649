"""GAN-SVS (VISinger) end-to-end score-to-wave task.

Behavioral spec: reference `espnet2/tasks/gan_svs.py` (VISinger under the
GAN trainer, `espnet2/gan_svs/vits/`). Data: the SVS layout (wav.scp +
label + midi + durations); the linear spectrogram for the posterior
encoder is computed on device.
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
class GanSVSDataConfig:
    train_dir: str = ""
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    batch_size: int = 8
    max_seconds: float = 8.0
    steps_per_epoch: int = 0


@dataclasses.dataclass(frozen=True)
class GanSVSModelSection:
    channels: int = 192
    text_heads: int = 2
    text_d_ff: int = 768
    text_layers: int = 6
    posterior_layers: int = 16
    flows: int = 4
    flow_layers: int = 4
    decoder_channels: int = 512
    upsample_scales: tuple = (8, 8, 2, 2)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    segment_frames: int = 32
    frame_prior_layers: int = 3
    dropout_rate: float = 0.1
    lambda_mel: float = 45.0
    lambda_kl: float = 1.0
    lambda_dur: float = 1.0
    lambda_fm: float = 2.0


@dataclasses.dataclass(frozen=True)
class GanSVSOptimConfig:
    gen_lr: float = 2.0e-4
    disc_lr: float = 2.0e-4
    b1: float = 0.8
    b2: float = 0.99
    grad_clip: float = 5.0


class GanSVSTask(AbsTask):
    name = "gan_svs"
    sections = {
        "run": RunConfig,
        "optim": GanSVSOptimConfig,
        "data": GanSVSDataConfig,
        "model": GanSVSModelSection,
    }

    @classmethod
    def build_models(cls, mc: GanSVSModelSection, data: GanSVSDataConfig,
                     vocab_size: int):
        from espnet_tpu.models.tts.hifigan import HiFiGANMultiDiscriminator
        from espnet_tpu.models.tts.visinger import (
            VISingerConfig, VISingerGenerator,
        )
        from espnet_tpu.models.tts.vits import VITSConfig

        if int(np.prod(mc.upsample_scales)) != data.hop_length:
            raise ValueError(
                f"prod(upsample_scales)={np.prod(mc.upsample_scales)} must "
                f"equal hop_length={data.hop_length}"
            )
        gen = VISingerGenerator(VISingerConfig(
            vits=VITSConfig(
                vocab_size=vocab_size,
                channels=mc.channels,
                text_heads=mc.text_heads,
                text_d_ff=mc.text_d_ff,
                text_layers=mc.text_layers,
                spec_dim=data.n_fft // 2 + 1,
                posterior_layers=mc.posterior_layers,
                flows=mc.flows,
                flow_layers=mc.flow_layers,
                decoder_channels=mc.decoder_channels,
                upsample_scales=tuple(mc.upsample_scales),
                resblock_kernel_sizes=tuple(mc.resblock_kernel_sizes),
                n_fft=data.n_fft,
                hop_length=data.hop_length,
                segment_frames=mc.segment_frames,
                dropout_rate=mc.dropout_rate,
            ),
            frame_prior_layers=mc.frame_prior_layers,
        ))
        disc = HiFiGANMultiDiscriminator()
        return gen, disc

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        import flax.linen as nn
        import jax
        import jax.numpy as jnp
        import optax

        from espnet_tpu.data.dataset import SVSDataset
        from espnet_tpu.ops.stft import power_spectrum, stft
        from espnet_tpu.tasks.svs import SVSTask
        from espnet_tpu.train.checkpoint import save_pytree
        from espnet_tpu.train.gan_steps import (
            GANTrainState, make_visinger_train_step,
        )

        run: RunConfig = cfg["run"]
        data: GanSVSDataConfig = cfg["data"]
        mc: GanSVSModelSection = cfg["model"]
        opt: GanSVSOptimConfig = cfg["optim"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        conv = SVSTask.build_converter(data.train_dir, out)
        ds = SVSDataset(data.train_dir, conv, data.fs)
        max_samples = int(data.max_seconds * data.fs)
        items = []
        for k in ds.keys():
            it = ds[k]
            wav = it["speech"][:max_samples]
            n = len(wav) - len(wav) % data.hop_length
            items.append((it["text"], it["midi"], it["durations"], wav[:n]))

        gen, disc = cls.build_models(mc, data, len(conv))
        upsample = int(np.prod(mc.upsample_scales))
        seg_samples = mc.segment_frames * upsample

        u_max = max(len(i[0]) for i in items)
        n_max = max(max(len(i[3]) for i in items),
                    seg_samples + data.n_fft)
        n_max += (-n_max) % data.hop_length
        frames = n_max // data.hop_length + 1

        rng = jax.random.PRNGKey(run.seed)
        gen_params = nn.meta.unbox(gen.init(
            {"params": rng, "posterior": rng, "segment": rng,
             "dropout": rng},
            jnp.zeros((1, u_max), jnp.int32),
            jnp.zeros((1, u_max), jnp.int32),
            jnp.ones((1, u_max), jnp.int32),
            jnp.asarray([u_max]),
            jnp.zeros((1, frames, data.n_fft // 2 + 1)),
            jnp.asarray([frames]),
        ))["params"]
        disc_params = disc.init(
            rng, jnp.zeros((1, seg_samples, 1))
        )["params"]

        def make_tx(lr):
            return optax.chain(
                optax.clip_by_global_norm(opt.grad_clip),
                optax.adam(lr, b1=opt.b1, b2=opt.b2),
            )

        gen_tx, disc_tx = make_tx(opt.gen_lr), make_tx(opt.disc_lr)
        state = GANTrainState.create(gen_params, gen_tx, disc_params,
                                     disc_tx)
        step_fn = jax.jit(make_visinger_train_step(
            gen, disc, gen_tx, disc_tx,
            hop_length=data.hop_length, upsample=upsample,
            lambda_fm=mc.lambda_fm, lambda_mel=mc.lambda_mel,
            lambda_kl=mc.lambda_kl, lambda_dur=mc.lambda_dur,
            mel_fs=data.fs, mel_n_fft=data.n_fft,
        ))

        spec_fn = jax.jit(
            lambda w: power_spectrum(
                *stft(w, data.n_fft, data.hop_length)
            ) ** 0.5
        )

        np_rng = np.random.RandomState(run.seed)
        bsz = data.batch_size
        steps = data.steps_per_epoch or max(1, len(items) // bsz)
        rng_step = jax.random.PRNGKey(run.seed + 1)
        for epoch in range(1, run.max_epoch + 1):
            agg: Dict[str, float] = {}
            for _ in range(steps):
                idx = np_rng.choice(len(items), bsz)
                toks = np.zeros((bsz, u_max), np.int32)
                midi = np.zeros((bsz, u_max), np.int32)
                dur = np.zeros((bsz, u_max), np.int32)
                tlens = np.zeros((bsz,), np.int32)
                wavs = np.zeros((bsz, n_max), np.float32)
                slens = np.zeros((bsz,), np.int32)
                for j, ii in enumerate(idx):
                    t, m, d, wav = items[ii]
                    toks[j, : len(t)] = t
                    midi[j, : len(m)] = m
                    dur[j, : len(d)] = d
                    tlens[j] = len(t)
                    wavs[j, : len(wav)] = wav
                    slens[j] = len(wav) // data.hop_length + 1
                spec = spec_fn(jnp.asarray(wavs))
                state, stats = step_fn(
                    state, jnp.asarray(toks), jnp.asarray(midi),
                    jnp.asarray(dur), jnp.asarray(tlens), spec,
                    jnp.asarray(slens), jnp.asarray(wavs), rng_step,
                )
                for k, v in jax.device_get(stats).items():
                    agg[k] = agg.get(k, 0.0) + float(v)
            msg = ", ".join(f"{k}={v / steps:.4g}"
                            for k, v in sorted(agg.items()))
            logger.info("gan_svs epoch %d: %s", epoch, msg)
            save_pytree(out / "generator.msgpack", state.gen_params)
            save_pytree(out / "discriminator.msgpack", state.disc_params)
        logger.info("gan_svs training finished: %s", out)
        return state, gen
