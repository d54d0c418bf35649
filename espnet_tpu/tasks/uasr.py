"""Unsupervised ASR (wav2vec-U style) task.

Behavioral spec: reference `espnet2/tasks/uasr.py` + the alternating
`espnet2/train/uasr_trainer.py`. Data: wav.scp (speech) + text (UNPAIRED
phone/char transcripts — rows never need to correspond); features are
log-mel computed on device.
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
class UASRDataConfig:
    train_dir: str = ""
    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    n_mels: int = 40
    token_type: str = "char"
    token_list: str = ""
    batch_size: int = 8
    max_seconds: float = 6.0
    steps_per_epoch: int = 0


@dataclasses.dataclass(frozen=True)
class UASRModelSection:
    channels: int = 256
    kernel: int = 4
    stride: int = 2
    disc_channels: int = 256
    disc_layers: int = 3
    disc_kernel: int = 6
    smooth_weight: float = 0.5
    diversity_weight: float = 1.0
    gp_weight: float = 1.5


@dataclasses.dataclass(frozen=True)
class UASROptimConfig:
    gen_lr: float = 4.0e-4
    disc_lr: float = 4.0e-4
    b1: float = 0.5
    b2: float = 0.98
    grad_clip: float = 5.0


class UASRTask(AbsTask):
    name = "uasr"
    sections = {
        "run": RunConfig,
        "optim": UASROptimConfig,
        "data": UASRDataConfig,
        "model": UASRModelSection,
    }

    @classmethod
    def build_config(cls, model_cfg: UASRModelSection, data: UASRDataConfig,
                     vocab_size: int):
        from espnet_tpu.models.uasr import UASRConfig

        return UASRConfig(
            vocab_size=vocab_size,
            feat_dim=data.n_mels,
            channels=model_cfg.channels,
            kernel=model_cfg.kernel,
            stride=model_cfg.stride,
            disc_channels=model_cfg.disc_channels,
            disc_layers=model_cfg.disc_layers,
            disc_kernel=model_cfg.disc_kernel,
            smooth_weight=model_cfg.smooth_weight,
            diversity_weight=model_cfg.diversity_weight,
            gp_weight=model_cfg.gp_weight,
        )

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        import jax
        import jax.numpy as jnp
        import optax

        from espnet_tpu.data.fileio import SoundScpReader, read_2column_text
        from espnet_tpu.data.tokenizer import (
            TokenIDConverter, build_token_list, build_tokenizer,
        )
        from espnet_tpu.models.uasr import UASRDiscriminator, UASRGenerator
        from espnet_tpu.ops.stft import log_mel_spectrogram
        from espnet_tpu.train.checkpoint import save_pytree
        from espnet_tpu.train.gan_steps import GANTrainState
        from espnet_tpu.train.uasr_steps import make_uasr_train_step
        from espnet_tpu.models.uasr import UASRModel

        run: RunConfig = cfg["run"]
        data: UASRDataConfig = cfg["data"]
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
        text_ids = [
            np.asarray(conv.tokens2ids(tokenizer.text2tokens(t)), np.int32)
            for t in texts.values()
        ]

        reader = SoundScpReader(Path(data.train_dir) / "wav.scp")
        max_samples = int(data.max_seconds * data.fs)
        waves = []
        for k in reader.keys():
            w, _ = reader[k]
            if w.ndim > 1:
                w = w[:, 0]
            waves.append(w.astype(np.float32)[:max_samples])

        ucfg = cls.build_config(cfg["model"], data, len(conv))
        gen = UASRGenerator(ucfg)
        disc = UASRDiscriminator(ucfg)

        n_max = max(len(w) for w in waves)
        u_max = max(len(t) for t in text_ids)
        frames = n_max // data.hop_length + 1

        rng = jax.random.PRNGKey(run.seed)
        gen_params = gen.init(
            rng, jnp.zeros((1, frames, data.n_mels)), jnp.asarray([frames])
        )["params"]
        gen_frames = gen.apply(
            {"params": gen_params}, jnp.zeros((1, frames, data.n_mels)),
            jnp.asarray([frames]),
        )[0].shape[1]
        disc_params = disc.init(
            rng, jnp.zeros((1, gen_frames, len(conv))),
            jnp.ones((1, gen_frames), bool),
        )["params"]

        def make_tx(lr):
            return optax.chain(
                optax.clip_by_global_norm(cfg["optim"].grad_clip),
                optax.adam(lr, b1=cfg["optim"].b1, b2=cfg["optim"].b2),
            )

        gen_tx = make_tx(cfg["optim"].gen_lr)
        disc_tx = make_tx(cfg["optim"].disc_lr)
        state = GANTrainState.create(gen_params, gen_tx, disc_params,
                                     disc_tx)
        step_fn = jax.jit(make_uasr_train_step(
            UASRModel(ucfg), gen_tx, disc_tx
        ))

        mel_fn = jax.jit(lambda w, wl: log_mel_spectrogram(
            w, wl, data.fs, data.n_fft, data.hop_length, None, data.n_mels
        ))

        np_rng = np.random.RandomState(run.seed)
        bsz = data.batch_size
        steps = data.steps_per_epoch or max(1, len(waves) // bsz)
        rng_step = jax.random.PRNGKey(run.seed + 1)
        for epoch in range(1, run.max_epoch + 1):
            agg: Dict[str, float] = {}
            for _ in range(steps):
                wi = np_rng.choice(len(waves), bsz)
                ti = np_rng.choice(len(text_ids), bsz)  # unpaired!
                wavs = np.zeros((bsz, n_max), np.float32)
                wlens = np.zeros((bsz,), np.int32)
                toks = np.zeros((bsz, u_max), np.int32)
                tlens = np.zeros((bsz,), np.int32)
                for j in range(bsz):
                    w = waves[wi[j]]
                    wavs[j, : len(w)] = w
                    wlens[j] = len(w)
                    t = text_ids[ti[j]]
                    toks[j, : len(t)] = t
                    tlens[j] = len(t)
                feats, flens = mel_fn(jnp.asarray(wavs), jnp.asarray(wlens))
                state, stats = step_fn(
                    state, feats, flens, jnp.asarray(toks),
                    jnp.asarray(tlens), rng_step,
                )
                for k, v in jax.device_get(stats).items():
                    agg[k] = agg.get(k, 0.0) + float(v)
            msg = ", ".join(f"{k}={v / steps:.4g}"
                            for k, v in sorted(agg.items()))
            logger.info("uasr epoch %d: %s", epoch, msg)
            save_pytree(out / "generator.msgpack", state.gen_params)
            save_pytree(out / "discriminator.msgpack", state.disc_params)
        logger.info("uasr training finished: %s", out)
        return state, gen
