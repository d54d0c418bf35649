"""Enhancement/separation task.

Behavioral spec: reference `espnet2/tasks/enh.py` (encoder/separator/decoder
ClassChoices + PIT-wrapped criterions assembled into
ESPnetEnhancementModel) driven by the `egs2/TEMPLATE/enh1` recipe stages.
Data plane: wav.scp = mixture, spk<i>.scp = references.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict

from espnet_tpu.data.dataset import EnhDataset, EpochIterator
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.models.enh import EnhancementModel, EnhConfig
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class EnhDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    fs: int = 16000
    batch_bins: int = 0
    batch_size: int = 8
    length_quantum: int = 4096
    num_shards: int = 1
    shard_index: int = 0
    # chunk iterator (reference `espnet2/tasks/abs_task.py:1589`
    # build_chunk_iter_factory + `espnet2/iterators/chunk_iter_factory.py:13`
    # — the enh recipes' iterator_type=chunk): fixed-length windows pooled
    # across utterances, every train batch one static shape.
    iterator_type: str = "sequence"   # sequence | chunk
    chunk_length: int = 32000
    chunk_shift_ratio: float = 0.5


class EnhTask(AbsTask):
    name = "enh"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": EnhDataConfig,
        "model": EnhConfig,
    }

    @classmethod
    def build_model(cls, model_cfg: EnhConfig) -> EnhancementModel:
        d = dataclasses.asdict(model_cfg)
        d.pop("dtype", None)
        dtype = model_cfg.dtype
        if isinstance(dtype, str):
            import jax.numpy as jnp

            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
        return EnhancementModel(EnhConfig(dtype=dtype, **d))

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: EnhDataConfig = cfg["data"]
        model_cfg: EnhConfig = cfg["model"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        train_ds = EnhDataset(data.train_dir, model_cfg.num_spk, data.fs)
        valid_ds = (
            EnhDataset(data.valid_dir, model_cfg.num_spk, data.fs)
            if data.valid_dir else None
        )

        def make_batches(ds):
            shapes = {"speech_mix": ds.speech_lengths()}
            return build_batches(
                shapes,
                batch_bins=data.batch_bins,
                batch_size=0 if data.batch_bins else data.batch_size,
                length_quantum=data.length_quantum,
                input_field="speech_mix",
            )

        fields = ("speech_mix", "speech_ref")
        if data.iterator_type == "chunk":
            from espnet_tpu.data.dataset import ChunkIterator

            train_iter = ChunkIterator(
                train_ds, train_ds.keys(), data.chunk_length,
                data.batch_size, data.chunk_shift_ratio, seed=run.seed,
                fields=fields, num_shards=data.num_shards,
                shard_index=data.shard_index,
            )
        elif data.iterator_type == "sequence":
            train_iter = EpochIterator(
                train_ds, make_batches(train_ds), seed=run.seed,
                num_shards=data.num_shards, shard_index=data.shard_index,
                fields=fields,
            )
        else:
            raise ValueError(
                f"unknown iterator_type {data.iterator_type!r} "
                "(sequence | chunk)")
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
            batch_arg_names=("speech_mix", "speech_mix_lengths", "speech_ref"),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("training finished: %s", out)
        return state, trainer, model
