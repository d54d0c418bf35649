"""Speaker diarization task (SA-EEND).

Behavioral spec: reference `espnet2/tasks/diar.py` + `egs2/TEMPLATE/diar1`
(wav.scp + rttm labels -> frame activity training; DER reporting).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict, List

import numpy as np

from espnet_tpu.data.dataset import EpochIterator
from espnet_tpu.data.fileio import SoundScpReader, read_rttm
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.models.diar import DiarConfig, DiarizationModel
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class DiarDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    fs: int = 16000
    batch_size: int = 8
    length_quantum: int = 4096
    num_shards: int = 1
    shard_index: int = 0


class DiarDataset:
    """wav.scp + rttm -> speech (n,), spk_labels (n, S) sample activity."""

    def __init__(self, data_dir, num_spk: int, fs: int = 16000):
        dd = Path(data_dir)
        self.speech = SoundScpReader(dd / "wav.scp")
        self.segments = read_rttm(dd / "rttm") if (dd / "rttm").exists() else {}
        self.num_spk = num_spk
        self.fs = fs
        spks = sorted({s for segs in self.segments.values()
                       for s, _, _ in segs})
        self.spk_index = {s: i for i, s in enumerate(spks[:num_spk])}

    def keys(self) -> List[str]:
        return list(self.speech.keys())

    def __len__(self):
        return len(self.speech)

    def __getitem__(self, key):
        wav, sr = self.speech[key]
        if wav.ndim > 1:
            wav = wav[:, 0]
        out = {"speech": wav.astype(np.float32)}
        n = len(wav)
        labels = np.zeros((n, self.num_spk), np.float32)
        for spk, tbeg, tdur in self.segments.get(key, []):
            if spk not in self.spk_index:
                continue
            b = int(tbeg * self.fs)
            e = min(n, int((tbeg + tdur) * self.fs))
            labels[b:e, self.spk_index[spk]] = 1.0
        out["spk_labels"] = labels
        return out

    def speech_lengths(self) -> Dict[str, int]:
        import wave as wave_mod

        out = {}
        for k in self.speech.keys():
            try:
                with wave_mod.open(self.speech.data[k]) as w:
                    out[k] = w.getnframes()
            except Exception:
                out[k] = len(self.speech[k][0])
        return out


class DiarTask(AbsTask):
    name = "diar"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": DiarDataConfig,
        "model": DiarConfig,
    }

    @classmethod
    def build_model(cls, model_cfg: DiarConfig) -> DiarizationModel:
        d = dataclasses.asdict(model_cfg)
        d.pop("dtype", None)
        dtype = model_cfg.dtype
        if isinstance(dtype, str):
            import jax.numpy as jnp

            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
        return DiarizationModel(DiarConfig(dtype=dtype, **d))

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: DiarDataConfig = cfg["data"]
        model_cfg: DiarConfig = cfg["model"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        train_ds = DiarDataset(data.train_dir, model_cfg.num_spk, data.fs)
        valid_ds = (
            DiarDataset(data.valid_dir, model_cfg.num_spk, data.fs)
            if data.valid_dir else None
        )

        def make_batches(ds):
            return build_batches(
                {"speech": ds.speech_lengths()},
                batch_size=data.batch_size,
                length_quantum=data.length_quantum,
            )

        fields = ("speech", "spk_labels")
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
            model.config.d_model, opt.weight_decay,
            (opt.b1, opt.b2), opt.eps, opt.grad_clip,
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
            batch_arg_names=("speech", "speech_lengths", "spk_labels"),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("training finished: %s", out)
        return state, trainer, model
