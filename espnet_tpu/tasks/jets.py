"""JETS end-to-end text-to-wave task.

Behavioral spec: reference `espnet2/tasks/gan_tts.py` with the JETS model
(`espnet2/gan_tts/jets/jets.py`) under the GAN trainer. Data: the TTS
layout (wav.scp + text); mel features, frame pitch and frame energy are
computed on device (`espnet_tpu/ops/{stft,pitch}.py`), so there is no
offline feature stage.
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
class JETSDataConfig:
    train_dir: str = ""
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    token_type: str = "char"
    token_list: str = ""
    batch_size: int = 8
    max_seconds: float = 6.0
    steps_per_epoch: int = 0


@dataclasses.dataclass(frozen=True)
class JETSModelSection:
    adim: int = 256
    num_heads: int = 2
    d_ff: int = 1024
    encoder_layers: int = 4
    decoder_layers: int = 4
    decoder_channels: int = 512
    upsample_scales: tuple = (8, 8, 2, 2)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    segment_frames: int = 32
    dropout_rate: float = 0.1
    lambda_mel: float = 45.0
    lambda_fm: float = 2.0
    lambda_var: float = 1.0
    lambda_align: float = 2.0


@dataclasses.dataclass(frozen=True)
class JETSOptimConfig:
    gen_lr: float = 2.0e-4
    disc_lr: float = 2.0e-4
    b1: float = 0.8
    b2: float = 0.99
    grad_clip: float = 5.0


class JETSTask(AbsTask):
    name = "jets"
    sections = {
        "run": RunConfig,
        "optim": JETSOptimConfig,
        "data": JETSDataConfig,
        "model": JETSModelSection,
    }

    @classmethod
    def build_models(cls, model_cfg: JETSModelSection, data: JETSDataConfig,
                     vocab_size: int):
        from espnet_tpu.models.tts.hifigan import HiFiGANMultiDiscriminator
        from espnet_tpu.models.tts.jets import JETSConfig, JETSGenerator

        if int(np.prod(model_cfg.upsample_scales)) != data.hop_length:
            raise ValueError(
                f"prod(upsample_scales)={np.prod(model_cfg.upsample_scales)}"
                f" must equal hop_length={data.hop_length}"
            )
        gen = JETSGenerator(JETSConfig(
            vocab_size=vocab_size,
            n_mels=data.n_mels,
            adim=model_cfg.adim,
            num_heads=model_cfg.num_heads,
            d_ff=model_cfg.d_ff,
            encoder_layers=model_cfg.encoder_layers,
            decoder_layers=model_cfg.decoder_layers,
            decoder_channels=model_cfg.decoder_channels,
            upsample_scales=tuple(model_cfg.upsample_scales),
            resblock_kernel_sizes=tuple(model_cfg.resblock_kernel_sizes),
            segment_frames=model_cfg.segment_frames,
            dropout_rate=model_cfg.dropout_rate,
        ))
        disc = HiFiGANMultiDiscriminator()
        return gen, disc

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        import flax.linen as nn
        import jax
        import jax.numpy as jnp
        import optax

        from espnet_tpu.data.fileio import SoundScpReader, read_2column_text
        from espnet_tpu.data.tokenizer import (
            TokenIDConverter, build_token_list, build_tokenizer,
        )
        from espnet_tpu.ops.pitch import autocorr_f0, frame_energy
        from espnet_tpu.ops.stft import log_mel_spectrogram
        from espnet_tpu.train.checkpoint import save_pytree
        from espnet_tpu.train.gan_steps import (
            GANTrainState, make_jets_train_step,
        )

        run: RunConfig = cfg["run"]
        data: JETSDataConfig = cfg["data"]
        model_cfg: JETSModelSection = cfg["model"]
        opt: JETSOptimConfig = cfg["optim"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        texts = read_2column_text(Path(data.train_dir) / "text")
        tokenizer = build_tokenizer(data.token_type)
        tok_path = (Path(data.token_list) if data.token_list
                    else out / "tokens.txt")
        if tok_path.exists():
            conv = TokenIDConverter.from_file(tok_path)
        else:
            conv = TokenIDConverter(
                build_token_list(list(texts.values()), tokenizer)
            )
            conv.save(tok_path)

        reader = SoundScpReader(Path(data.train_dir) / "wav.scp")
        max_samples = int(data.max_seconds * data.fs)
        max_samples -= max_samples % data.hop_length
        items = []
        for k in reader.keys():
            wav, _ = reader[k]
            if wav.ndim > 1:
                wav = wav[:, 0]
            wav = wav.astype(np.float32)[:max_samples]
            n = len(wav) - len(wav) % data.hop_length
            ids = conv.tokens2ids(tokenizer.text2tokens(texts[k]))
            items.append((np.asarray(ids, np.int32), wav[:n]))

        gen, disc = cls.build_models(model_cfg, data, len(conv))
        seg_samples = model_cfg.segment_frames * data.hop_length

        u_max = max(len(i[0]) for i in items)
        n_max = max(max(len(i[1]) for i in items),
                    seg_samples + data.n_fft)
        n_max += (-n_max) % data.hop_length
        frames = n_max // data.hop_length + 1

        rng = jax.random.PRNGKey(run.seed)
        gen_params = nn.meta.unbox(gen.init(
            {"params": rng, "segment": rng, "dropout": rng},
            jnp.zeros((1, u_max), jnp.int32), jnp.asarray([u_max]),
            jnp.zeros((1, frames, data.n_mels)), jnp.asarray([frames]),
            jnp.zeros((1, frames)), jnp.zeros((1, frames)),
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
        step_fn = jax.jit(make_jets_train_step(
            gen, disc, gen_tx, disc_tx,
            hop_length=data.hop_length,
            lambda_fm=model_cfg.lambda_fm, lambda_mel=model_cfg.lambda_mel,
            lambda_var=model_cfg.lambda_var,
            lambda_align=model_cfg.lambda_align,
            mel_fs=data.fs, mel_n_fft=data.n_fft, mel_bins=data.n_mels,
        ))

        feats_fn = jax.jit(lambda w, wl: (
            log_mel_spectrogram(w, wl, data.fs, data.n_fft,
                                data.hop_length, None, data.n_mels),
            autocorr_f0(w, data.fs, data.n_fft, data.hop_length)[0],
            frame_energy(w, data.n_fft, data.hop_length),
        ))

        np_rng = np.random.RandomState(run.seed)
        bsz = data.batch_size
        steps = data.steps_per_epoch or max(1, len(items) // bsz)
        rng_step = jax.random.PRNGKey(run.seed + 1)
        for epoch in range(1, run.max_epoch + 1):
            agg: Dict[str, float] = {}
            for _ in range(steps):
                idx = np_rng.choice(len(items), bsz)
                toks = np.zeros((bsz, u_max), np.int32)
                tlens = np.zeros((bsz,), np.int32)
                wavs = np.zeros((bsz, n_max), np.float32)
                wlens = np.zeros((bsz,), np.int32)
                for j, ii in enumerate(idx):
                    ids, wav = items[ii]
                    toks[j, : len(ids)] = ids
                    tlens[j] = len(ids)
                    wavs[j, : len(wav)] = wav
                    wlens[j] = len(wav)
                (feats, flens), pitch, energy = feats_fn(
                    jnp.asarray(wavs), jnp.asarray(wlens)
                )
                t = feats.shape[1]
                state, stats = step_fn(
                    state, jnp.asarray(toks), jnp.asarray(tlens),
                    feats, flens, pitch[:, :t], energy[:, :t],
                    jnp.asarray(wavs), rng_step,
                )
                for k, v in jax.device_get(stats).items():
                    agg[k] = agg.get(k, 0.0) + float(v)
            msg = ", ".join(f"{k}={v / steps:.4g}"
                            for k, v in sorted(agg.items()))
            logger.info("jets epoch %d: %s", epoch, msg)
            save_pytree(out / "generator.msgpack", state.gen_params)
            save_pytree(out / "discriminator.msgpack", state.disc_params)
        logger.info("jets training finished: %s", out)
        return state, gen
