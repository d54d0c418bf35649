"""Target speaker extraction task.

Behavioral spec: reference `espnet2/tasks/enh_tse.py` (TargetSpeakerExtraction
task: encoder/extractor/decoder choices assembled into
ESPnetExtractionModel, enrollment audio routed by TSEPreprocessor) driven
by the `egs2/TEMPLATE/tse1` recipe. Data layout: wav.scp = mixture,
spk1.scp = target source, enroll_spk1.scp = enrollment utterance.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict

from espnet_tpu.data.dataset import EpochIterator, TSEDataset
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.models.enh.tse import TSEConfig, TSEModel
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class TSEDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    fs: int = 16000
    batch_bins: int = 0
    batch_size: int = 8
    length_quantum: int = 4096
    num_shards: int = 1
    shard_index: int = 0


class TSETask(AbsTask):
    name = "tse"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": TSEDataConfig,
        "model": TSEConfig,
    }

    @classmethod
    def build_model(cls, model_cfg: TSEConfig) -> TSEModel:
        d = dataclasses.asdict(model_cfg)
        d.pop("dtype", None)
        dtype = model_cfg.dtype
        if isinstance(dtype, str):
            import jax.numpy as jnp

            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
        return TSEModel(TSEConfig(dtype=dtype, **d))

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: TSEDataConfig = cfg["data"]
        model_cfg: TSEConfig = cfg["model"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        train_ds = TSEDataset(data.train_dir, data.fs)
        valid_ds = TSEDataset(data.valid_dir, data.fs) if data.valid_dir \
            else None

        def make_batches(ds):
            shapes = {"speech_mix": ds.speech_lengths()}
            return build_batches(
                shapes,
                batch_bins=data.batch_bins,
                batch_size=0 if data.batch_bins else data.batch_size,
                length_quantum=data.length_quantum,
                input_field="speech_mix",
            )

        fields = ("speech_mix", "enroll", "speech_ref")
        train_iter = EpochIterator(
            train_ds, make_batches(train_ds), seed=run.seed,
            num_shards=data.num_shards, shard_index=data.shard_index,
            fields=fields,
        )
        valid_iter = (
            EpochIterator(valid_ds, make_batches(valid_ds), seed=run.seed,
                          shuffle=False, num_shards=data.num_shards,
                          shard_index=data.shard_index, fields=fields)
            if valid_ds else None
        )

        model = cls.build_model(model_cfg)
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
            batch_arg_names=("speech_mix", "speech_mix_lengths",
                             "enroll", "enroll_lengths", "speech_ref"),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("tse training finished: %s", out)
        return state, trainer, model
