"""Speech translation task.

Behavioral spec: reference `espnet2/tasks/st.py` (ST task: target +
source token lists, ESPnetSTModel with aux ASR CTC/attention) and the
`egs2/TEMPLATE/st1` recipe layout (`text` = translation, `src_text` =
transcript).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict

from espnet_tpu.data.dataset import ASRDataset, EpochIterator
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.models.st import STConfig, STModel
from espnet_tpu.tasks.abs_task import OptimConfig, RunConfig
from espnet_tpu.tasks.asr import ASRDataConfig, ASRTask
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class STModelSection(STConfig):
    vocab_size: int = -1
    src_vocab_size: int = -1


class STTask(ASRTask):
    name = "st"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": ASRDataConfig,
        "model": STModelSection,
    }

    @classmethod
    def build_model(cls, model_cfg, vocab_size: int, src_vocab_size: int = 0):
        d = dataclasses.asdict(model_cfg)
        d["vocab_size"] = vocab_size
        d["src_vocab_size"] = src_vocab_size
        d.pop("dtype", None)
        dtype = model_cfg.dtype
        if isinstance(dtype, str):
            import jax.numpy as jnp

            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
        return STModel(STConfig(dtype=dtype, **d))

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: ASRDataConfig = cfg["data"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        from espnet_tpu.data.fileio import read_2column_text
        from espnet_tpu.data.tokenizer import TokenIDConverter, build_token_list

        tdir = Path(data.train_dir)
        tgt_texts = list(read_2column_text(tdir / "text").values())
        src_texts = list(read_2column_text(tdir / "src_text").values())
        tokenizer = cls.build_tokenizer(data, out, tgt_texts)

        conv = cls.build_token_list(data, out, tokenizer, tgt_texts)
        src_path = out / "src_tokens.txt"
        if src_path.exists():
            src_conv = TokenIDConverter.from_file(src_path)
        else:
            src_conv = TokenIDConverter(build_token_list(src_texts, tokenizer))
            src_conv.save(src_path)

        def build_ds(datadir):
            dd = Path(datadir)
            kw = dict(
                text=dd / "text", tokenizer=tokenizer, converter=conv,
                fs=data.fs, src_text=dd / "src_text",
                src_converter=src_conv,
            )
            if data.input_type == "raw":
                return ASRDataset(wav_scp=dd / "wav.scp", **kw)
            return ASRDataset(feats_scp=dd / "feats.scp", **kw)

        train_ds = build_ds(data.train_dir)
        valid_ds = build_ds(data.valid_dir) if data.valid_dir else None

        def make_batches(ds):
            shapes = {
                "speech": ds.speech_lengths(),
                "text": ds.text_lengths(),
                "src_text": {
                    k: len(ds.src_tokenizer.text2tokens(v))
                    for k, v in ds.src_text.items()
                },
            }
            return build_batches(
                shapes,
                batch_bins=data.batch_bins,
                batch_size=0 if data.batch_bins else data.batch_size,
                length_quantum=data.length_quantum,
                text_quantum=data.text_quantum,
            )

        fields = ("speech", "text", "src_text")
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

        model = cls.build_model(cfg["model"], len(conv), len(src_conv))
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
            batch_arg_names=("speech", "speech_lengths", "text",
                             "text_lengths", "src_text", "src_text_lengths"),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("training finished: %s", out)
        return state, trainer, model, tokenizer, conv
