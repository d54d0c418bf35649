"""Singing voice synthesis task.

Behavioral spec: reference `espnet2/tasks/svs.py` (muskit-derived SVS task
with score preprocessing) around `espnet2/svs/espnet_model.py:85`. Data
layout: wav.scp + label (phones per note) + midi + durations (frames per
note); mel targets are computed on device.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict, Optional

from espnet_tpu.data.dataset import EpochIterator, SVSDataset
from espnet_tpu.data.fileio import read_2column_text
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.data.tokenizer import TokenIDConverter
from espnet_tpu.models.svs import SVSModel, SVSTaskConfig, XiaoiceSingConfig
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig
from espnet_tpu.train.collect_stats import (
    collect_stats, load_stats, mvn_variables,
)
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class SVSDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    fs: int = 16000
    batch_size: int = 8
    length_quantum: int = 4096
    text_quantum: int = 4


@dataclasses.dataclass(frozen=True)
class SVSModelSection:
    svs_type: str = "xiaoice"
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 128
    n_mels: int = 80
    fmin: float = 80.0
    fmax: Optional[float] = 7600.0
    normalize: str = "global_mvn"
    xiaoice: XiaoiceSingConfig = XiaoiceSingConfig()


class SVSTask(AbsTask):
    name = "svs"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": SVSDataConfig,
        "model": SVSModelSection,
    }

    @classmethod
    def build_model(cls, mc: SVSModelSection, vocab_size: int) -> SVSModel:
        import jax.numpy as jnp

        xcfg = mc.xiaoice
        d = {"vocab_size": vocab_size, "n_mels": mc.n_mels}
        if isinstance(xcfg.dtype, str):
            d["dtype"] = {"float32": jnp.float32,
                          "bfloat16": jnp.bfloat16}[xcfg.dtype]
        xcfg = dataclasses.replace(xcfg, **d)
        return SVSModel(SVSTaskConfig(
            svs_type=mc.svs_type, vocab_size=vocab_size, fs=mc.fs,
            n_fft=mc.n_fft, hop_length=mc.hop_length, n_mels=mc.n_mels,
            fmin=mc.fmin, fmax=mc.fmax, normalize=mc.normalize,
            xiaoice=xcfg,
        ))

    @classmethod
    def build_converter(cls, train_dir, out: Path) -> TokenIDConverter:
        tok_path = out / "tokens.txt"
        if tok_path.exists():
            return TokenIDConverter.from_file(tok_path)
        labels = read_2column_text(Path(train_dir) / "label")
        phones = sorted({p for v in labels.values() for p in v.split()})
        conv = TokenIDConverter(["<blank>"] + phones + ["<sos/eos>"])
        conv.save(tok_path)
        return conv

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: SVSDataConfig = cfg["data"]
        mc: SVSModelSection = cfg["model"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        conv = cls.build_converter(data.train_dir, out)
        train_ds = SVSDataset(data.train_dir, conv, data.fs)
        valid_ds = (SVSDataset(data.valid_dir, conv, data.fs)
                    if data.valid_dir else None)

        def make_batches(ds):
            shapes = {"speech": ds.speech_lengths(),
                      "text": ds.text_lengths()}
            return build_batches(
                shapes, batch_size=data.batch_size,
                length_quantum=data.length_quantum,
                text_quantum=data.text_quantum,
            )

        fields = ("speech", "text", "midi", "durations")
        train_iter = EpochIterator(train_ds, make_batches(train_ds),
                                   seed=run.seed, fields=fields)
        valid_iter = (
            EpochIterator(valid_ds, make_batches(valid_ds), seed=run.seed,
                          shuffle=False, fields=fields)
            if valid_ds else None
        )

        model = cls.build_model(mc, len(conv))
        extra_init = None
        if mc.normalize == "global_mvn":
            stats_path = out / "stats" / "feats_stats.npz"
            if not stats_path.exists():
                collect_stats(
                    train_ds, make_batches(train_ds), stats_path.parent,
                    fs=mc.fs, n_fft=mc.n_fft, hop_length=mc.hop_length,
                    n_mels=mc.n_mels,
                )
            extra_init = {"mvn": mvn_variables(load_stats(stats_path))}

        opt: OptimConfig = cfg["optim"]
        tx = build_optimizer(
            opt.name, opt.lr, opt.schedule, opt.warmup_steps,
            256, opt.weight_decay, (opt.b1, opt.b2), opt.eps, opt.grad_clip,
        )
        phase, key, mode = run.best_metric.split(".")
        trainer = Trainer(
            model, tx, out,
            TrainerOptions(
                max_epoch=run.max_epoch, patience=run.patience,
                keep_nbest=run.keep_nbest, best_metric=(phase, key, mode),
                log_interval=run.log_interval, seed=run.seed,
                resume=run.resume,
            ),
            batch_arg_names=("text", "text_lengths", "midi", "durations",
                             "speech", "speech_lengths"),
            rng_names=("dropout",),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0, extra_init)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("svs training finished: %s", out)
        return state, trainer, model, conv
