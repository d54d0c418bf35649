"""TTS task: text + raw wav -> mel targets on device -> Tacotron2/FastSpeech2.

Behavioral spec: reference `espnet2/tasks/tts.py` (feats_extract +
normalize + tts ClassChoices assembled into ESPnetTTSModel) + recipe
`egs2/TEMPLATE/tts1/tts.sh` stages (token list, stats, train). FastSpeech2
training consumes a `durations` file in the data dir
("<uid> d1 d2 ..." frames per token — produced by
`bin/tts_teacher_durations.py` from a trained Tacotron2's attention, the
reference's DurationCalculator flow,
`espnet/nets/pytorch_backend/fastspeech/duration_calculator.py`).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.data.dataset import ASRDataset, EpochIterator
from espnet_tpu.data.fileio import read_2column_text
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.models.tts.fastspeech2 import FastSpeech2Config
from espnet_tpu.models.tts.model import TTSModel, TTSTaskConfig
from espnet_tpu.models.tts.prodiff import ProDiffConfig
from espnet_tpu.models.tts.transformer_tts import TransformerTTSConfig
from espnet_tpu.models.tts.tacotron2 import Tacotron2Config
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig
from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.train.collect_stats import collect_stats, load_stats, mvn_variables
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class TTSDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    fs: int = 16000
    token_type: str = "char"
    token_list: str = ""
    bpe_model: str = ""
    batch_size: int = 16
    length_quantum: int = 8192
    text_quantum: int = 8


@dataclasses.dataclass(frozen=True)
class TTSModelSection:
    tts_type: str = "tacotron2"
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: Optional[int] = None
    n_mels: int = 80
    fmin: float = 80.0
    fmax: Optional[float] = 7600.0
    normalize: str = "global_mvn"
    tacotron2: Tacotron2Config = Tacotron2Config()
    fastspeech2: FastSpeech2Config = FastSpeech2Config()
    transformer: TransformerTTSConfig = TransformerTTSConfig()
    prodiff: ProDiffConfig = ProDiffConfig()


class TTSDatasetWithDurations(ASRDataset):
    """ASRDataset + optional durations/pitch/energy token-level targets."""

    def __init__(self, *a, durations_path=None, **kw):
        super().__init__(*a, **kw)
        self.durations = (
            {k: np.asarray([int(x) for x in v.split()], np.int32)
             for k, v in read_2column_text(durations_path).items()}
            if durations_path and Path(durations_path).exists() else None
        )

    def __getitem__(self, key):
        out = super().__getitem__(key)
        if self.durations is not None:
            out["durations"] = self.durations[key]
        return out


class TTSTask(AbsTask):
    name = "tts"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": TTSDataConfig,
        "model": TTSModelSection,
    }

    @classmethod
    def build_model(cls, mc: TTSModelSection, vocab_size: int) -> TTSModel:
        import jax.numpy as jnp

        def fix(cfg):
            d = {}
            if isinstance(cfg.dtype, str):
                d["dtype"] = {"float32": jnp.float32,
                              "bfloat16": jnp.bfloat16}[cfg.dtype]
            d["vocab_size"] = vocab_size
            d["n_mels"] = mc.n_mels
            return dataclasses.replace(cfg, **d)

        cfg = TTSTaskConfig(
            tts_type=mc.tts_type, vocab_size=vocab_size, fs=mc.fs,
            n_fft=mc.n_fft, hop_length=mc.hop_length, win_length=mc.win_length,
            n_mels=mc.n_mels, fmin=mc.fmin, fmax=mc.fmax,
            normalize=mc.normalize,
            tacotron2=fix(mc.tacotron2),
            fastspeech2=fix(mc.fastspeech2),
            transformer=fix(mc.transformer),
            prodiff=fix(mc.prodiff),
        )
        return TTSModel(cfg)

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: TTSDataConfig = cfg["data"]
        mc: TTSModelSection = cfg["model"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        train_texts = list(read_2column_text(Path(data.train_dir) / "text").values())
        tok_data = ASRTask.sections["data"]()  # reuse ASRTask token builders
        tok_data = dataclasses.replace(
            tok_data, token_type=data.token_type, token_list=data.token_list,
            bpe_model=data.bpe_model, fs=data.fs,
        )
        tokenizer = ASRTask.build_tokenizer(tok_data, out, train_texts)
        converter = ASRTask.build_token_list(tok_data, out, tokenizer, train_texts)

        fields = ("speech", "text", "durations")

        def make_ds(datadir):
            dd = Path(datadir)
            return TTSDatasetWithDurations(
                wav_scp=dd / "wav.scp", text=dd / "text",
                tokenizer=tokenizer, converter=converter, fs=data.fs,
                durations_path=dd / "durations",
            )

        train_ds = make_ds(data.train_dir)
        valid_ds = make_ds(data.valid_dir) if data.valid_dir else None

        def make_batches(ds):
            shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
            return build_batches(
                shapes, batch_size=data.batch_size,
                length_quantum=data.length_quantum,
                text_quantum=data.text_quantum,
            )

        train_batches = make_batches(train_ds)
        train_iter = EpochIterator(train_ds, train_batches, seed=run.seed,
                                   fields=fields)
        valid_iter = (
            EpochIterator(valid_ds, make_batches(valid_ds), seed=run.seed,
                          shuffle=False, fields=fields)
            if valid_ds else None
        )

        model = cls.build_model(mc, len(converter))
        extra_init = None
        if mc.normalize == "global_mvn":
            stats_path = out / "stats" / "feats_stats.npz"
            if not stats_path.exists():
                collect_stats(
                    train_ds, train_batches, stats_path.parent, fs=mc.fs,
                    n_fft=mc.n_fft, hop_length=mc.hop_length, n_mels=mc.n_mels,
                )
            extra_init = {"mvn": mvn_variables(load_stats(stats_path))}

        opt: OptimConfig = cfg["optim"]
        tx = build_optimizer(
            opt.name, opt.lr, opt.schedule, opt.warmup_steps,
            256, opt.weight_decay, (opt.b1, opt.b2), opt.eps, opt.grad_clip,
        )
        batch_args = ["text", "text_lengths", "speech", "speech_lengths"]
        if mc.tts_type in ("fastspeech2", "prodiff"):
            batch_args.append("durations")
        phase, key, mode = ("valid" if valid_iter else "train", "loss", "min")
        trainer = Trainer(
            model, tx, out,
            TrainerOptions(
                max_epoch=run.max_epoch, patience=run.patience,
                keep_nbest=run.keep_nbest, best_metric=(phase, key, mode),
                log_interval=run.log_interval, seed=run.seed,
                resume=run.resume,
                plot_attention=run.plot_attention,
                use_wandb=run.use_wandb,
                wandb_project=run.wandb_project,
            ),
            batch_arg_names=tuple(batch_args),
            rng_names=("dropout", "specaug", "prenet", "diffusion", "zoneout"),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0, extra_init)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("tts training finished: %s", out)
        return state, trainer, model, tokenizer, converter
