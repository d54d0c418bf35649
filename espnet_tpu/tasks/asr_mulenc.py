"""Multi-encoder ASR task.

Behavioral spec: the reference mulenc setup around
`espnet/nets/pytorch_backend/e2e_asr_mulenc.py` (N parallel input streams,
per-encoder CTC with training weights, HAN-fused attention decoder).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict

from espnet_tpu.data.dataset import ASRMulEncDataset, EpochIterator
from espnet_tpu.data.fileio import read_2column_text
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.models.mulenc import ASRMulEncModel, MulEncConfig
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig
from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class MulEncModelSection(MulEncConfig):
    vocab_size: int = -1


@dataclasses.dataclass(frozen=True)
class MulEncDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    fs: int = 16000
    token_type: str = "char"
    token_list: str = ""
    bpe_model: str = ""
    batch_size: int = 8
    length_quantum: int = 4096
    text_quantum: int = 4


class ASRMulEncTask(AbsTask):
    name = "asr_mulenc"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": MulEncDataConfig,
        "model": MulEncModelSection,
    }

    @classmethod
    def build_model(cls, mc: MulEncModelSection,
                    vocab_size: int) -> ASRMulEncModel:
        import jax.numpy as jnp

        d = dataclasses.asdict(mc)
        d.pop("dtype", None)
        d["vocab_size"] = vocab_size
        dtype = mc.dtype
        if isinstance(dtype, str):
            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
        return ASRMulEncModel(MulEncConfig(dtype=dtype, **d))

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: MulEncDataConfig = cfg["data"]
        mc: MulEncModelSection = cfg["model"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        train_texts = list(
            read_2column_text(Path(data.train_dir) / "text").values()
        )
        tok_data = dataclasses.replace(
            ASRTask.sections["data"](), token_type=data.token_type,
            token_list=data.token_list, bpe_model=data.bpe_model,
            fs=data.fs,
        )
        tokenizer = ASRTask.build_tokenizer(tok_data, out, train_texts)
        converter = ASRTask.build_token_list(tok_data, out, tokenizer,
                                             train_texts)

        def make_ds(datadir):
            return ASRMulEncDataset(datadir, tokenizer, converter,
                                    mc.num_encoders, data.fs)

        train_ds = make_ds(data.train_dir)
        valid_ds = make_ds(data.valid_dir) if data.valid_dir else None

        def make_batches(ds):
            shapes = {"speech": ds.speech_lengths(),
                      "text": ds.text_lengths()}
            return build_batches(
                shapes, batch_size=data.batch_size,
                length_quantum=data.length_quantum,
                text_quantum=data.text_quantum,
            )

        fields = ("speech", "speech_stream_lengths", "text")
        train_iter = EpochIterator(train_ds, make_batches(train_ds),
                                   seed=run.seed, fields=fields)
        valid_iter = (
            EpochIterator(valid_ds, make_batches(valid_ds), seed=run.seed,
                          shuffle=False, fields=fields)
            if valid_ds else None
        )

        model = cls.build_model(mc, len(converter))
        opt: OptimConfig = cfg["optim"]
        tx = build_optimizer(
            opt.name, opt.lr, opt.schedule, opt.warmup_steps,
            mc.d_model, opt.weight_decay, (opt.b1, opt.b2), opt.eps,
            opt.grad_clip,
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
            batch_arg_names=("speech", "speech_stream_lengths", "text",
                             "text_lengths"),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("asr_mulenc training finished: %s", out)
        return state, trainer, model, tokenizer, converter
