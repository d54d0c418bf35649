"""Voice conversion task (Tacotron2-VC).

Behavioral spec: reference `espnet/vc/pytorch_backend/vc.py` (v1 VC trainer
around `e2e_vc_tacotron2.py`). Data layout: `wav.scp` = source speaker
audio, `tgt_wav.scp` = parallel target speaker audio; both run through the
same on-device log-mel frontend.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from espnet_tpu.models.tts.tacotron2 import Tacotron2Config
from espnet_tpu.models.tts.transformer_tts import TransformerTTSConfig
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class VCDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    fs: int = 16000
    batch_size: int = 8
    length_quantum: int = 8192
    num_shards: int = 1
    shard_index: int = 0


@dataclasses.dataclass(frozen=True)
class VCModelSection:
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    fmin: float = 80.0
    fmax: Optional[float] = 7600.0
    vc_type: str = "tacotron2"  # tacotron2 | transformer (VTN)
    tacotron2: Tacotron2Config = Tacotron2Config(input_type="feats")
    transformer: TransformerTTSConfig = TransformerTTSConfig(
        input_type="feats")


class VCDataset:
    """Parallel (source wav, target wav) pairs."""

    def __init__(self, data_dir, fs: int = 16000):
        from espnet_tpu.data.fileio import SoundScpReader

        dd = Path(data_dir)
        self.src = SoundScpReader(dd / "wav.scp")
        self.tgt = SoundScpReader(dd / "tgt_wav.scp")
        self.fs = fs

    def keys(self) -> List[str]:
        return list(self.src.keys())

    def __len__(self):
        return len(self.src)

    def __getitem__(self, key):
        s, _ = self.src[key]
        t, _ = self.tgt[key]
        if s.ndim > 1:
            s = s[:, 0]
        if t.ndim > 1:
            t = t[:, 0]
        return {"src_speech": s.astype(np.float32),
                "speech": t.astype(np.float32)}

    def speech_lengths(self) -> Dict[str, int]:
        import wave as wave_mod

        out = {}
        for k in self.src.keys():
            try:
                with wave_mod.open(self.src.data[k]) as w:
                    out[k] = w.getnframes()
            except Exception:
                out[k] = len(self.src[k][0])
        return out


class VCTask(AbsTask):
    name = "vc"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": VCDataConfig,
        "model": VCModelSection,
    }

    @classmethod
    def build_model(cls, mc: VCModelSection):
        import jax.numpy as jnp

        from espnet_tpu.models.tts.vc import VCModel, VCTaskConfig

        t2 = mc.tacotron2
        d: Dict[str, Any] = {
            "input_type": "feats", "input_dim": mc.n_mels,
            "n_mels": mc.n_mels, "vocab_size": 1,
        }
        if isinstance(t2.dtype, str):
            d["dtype"] = {"float32": jnp.float32,
                          "bfloat16": jnp.bfloat16}[t2.dtype]
        t2 = dataclasses.replace(t2, **d)
        tr = mc.transformer
        dtr = dict(d)
        if isinstance(tr.dtype, str):
            dtr["dtype"] = {"float32": jnp.float32,
                            "bfloat16": jnp.bfloat16}[tr.dtype]
        tr = dataclasses.replace(tr, **dtr)
        return VCModel(VCTaskConfig(
            fs=mc.fs, n_fft=mc.n_fft, hop_length=mc.hop_length,
            n_mels=mc.n_mels, fmin=mc.fmin, fmax=mc.fmax,
            vc_type=mc.vc_type, tacotron2=t2, transformer=tr,
        ))

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        from espnet_tpu.data.dataset import EpochIterator
        from espnet_tpu.data.sampler import build_batches
        from espnet_tpu.train.optim import build_optimizer
        from espnet_tpu.train.trainer import Trainer, TrainerOptions

        run: RunConfig = cfg["run"]
        data: VCDataConfig = cfg["data"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        train_ds = VCDataset(data.train_dir, data.fs)
        valid_ds = VCDataset(data.valid_dir, data.fs) if data.valid_dir else None

        def make_batches(ds):
            return build_batches(
                {"speech": ds.speech_lengths()},
                batch_size=data.batch_size,
                length_quantum=data.length_quantum,
            )

        fields = ("src_speech", "speech")
        train_iter = EpochIterator(
            train_ds, make_batches(train_ds), seed=run.seed,
            num_shards=data.num_shards, shard_index=data.shard_index,
            fields=fields,
        )
        valid_iter = (
            EpochIterator(valid_ds, make_batches(valid_ds), seed=run.seed,
                          shuffle=False, fields=fields)
            if valid_ds else None
        )

        model = cls.build_model(cfg["model"])
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
            batch_arg_names=("src_speech", "src_speech_lengths",
                             "speech", "speech_lengths"),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("vc training finished: %s", out)
        return state, trainer, model
