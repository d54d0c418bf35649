"""LM task: text -> token ids -> causal LM training + perplexity.

Behavioral spec: reference `espnet2/tasks/lm.py` + `espnet2/lm/espnet_model.py:13`
(ESPnetLanguageModel: CE over [sos,y]->[y,eos], ppl stats) and
`espnet2/bin/lm_calc_perplexity.py`.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from espnet_tpu.data.fileio import read_2column_text
from espnet_tpu.data.sampler import Batch, build_batches
from espnet_tpu.data.tokenizer import TokenIDConverter, build_token_list, build_tokenizer
from espnet_tpu.models.asr import add_sos_eos
from espnet_tpu.models.lm import RNNLM, TransformerLM, lm_loss
from espnet_tpu.ops.masks import make_valid_mask
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class LMDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    token_type: str = "char"
    token_list: str = ""
    bpe_model: str = ""
    batch_size: int = 32
    text_quantum: int = 16


@dataclasses.dataclass(frozen=True)
class LMModelConfig:
    lm_type: str = "transformer"  # transformer | rnn
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    num_layers: int = 6
    dropout_rate: float = 0.1


class LMTrainModel(nn.Module):
    """ESPnetLanguageModel equivalent: wraps an LM with the sos/eos CE loss."""

    lm: Any
    sos_id: int
    eos_id: int

    def __call__(self, text, text_lengths, deterministic: bool = True):
        ys_in, ys_out, ys_lengths = add_sos_eos(
            text, text_lengths, self.sos_id, self.eos_id
        )
        logits = self.lm(ys_in, ys_lengths, deterministic)
        valid = make_valid_mask(ys_lengths, ys_in.shape[1]).astype(jnp.float32)
        return lm_loss(logits, ys_out, valid)


class TextDataset:
    """text file -> token id arrays (field name 'text')."""

    def __init__(self, text_path, tokenizer, converter):
        self.text = read_2column_text(text_path)
        self.tokenizer = tokenizer
        self.converter = converter

    def keys(self):
        return list(self.text)

    def __len__(self):
        return len(self.text)

    def __getitem__(self, key):
        toks = self.tokenizer.text2tokens(self.text[key])
        return {"text": np.asarray(self.converter.tokens2ids(toks), np.int32)}

    def text_lengths(self):
        return {k: len(self.tokenizer.text2tokens(v))
                for k, v in self.text.items()}


class LMTask(AbsTask):
    name = "lm"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": LMDataConfig,
        "model": LMModelConfig,
    }

    @classmethod
    def build_model(cls, mc: LMModelConfig, vocab_size: int) -> LMTrainModel:
        if mc.lm_type == "transformer":
            lm = TransformerLM(vocab_size, mc.d_model, mc.num_heads, mc.d_ff,
                               mc.num_layers, mc.dropout_rate)
        elif mc.lm_type == "rnn":
            lm = RNNLM(vocab_size, mc.d_model, mc.num_layers, mc.dropout_rate)
        else:
            raise ValueError(f"unknown lm_type {mc.lm_type}")
        return LMTrainModel(lm, vocab_size - 1, vocab_size - 1)

    @classmethod
    def build_inference_lm(cls, mc: LMModelConfig, vocab_size: int):
        """The bare LM module for shallow fusion; its params live under the
        'lm' key of the trained LMTrainModel params."""
        return cls.build_model(mc, vocab_size).lm

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: LMDataConfig = cfg["data"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        train_texts = list(read_2column_text(Path(data.train_dir) / "text").values())
        if data.token_type == "bpe":
            tokenizer = build_tokenizer("bpe", data.bpe_model)
        else:
            tokenizer = build_tokenizer(data.token_type)
        tl_path = Path(data.token_list) if data.token_list else out / "tokens.txt"
        if tl_path.exists():
            converter = TokenIDConverter.from_file(tl_path)
        else:
            converter = TokenIDConverter(build_token_list(train_texts, tokenizer))
            converter.save(tl_path)

        train_ds = TextDataset(Path(data.train_dir) / "text", tokenizer, converter)
        valid_ds = (
            TextDataset(Path(data.valid_dir) / "text", tokenizer, converter)
            if data.valid_dir else None
        )

        from espnet_tpu.data.dataset import EpochIterator

        def iters(ds, shuffle):
            shapes = {"text": ds.text_lengths()}
            batches = build_batches(
                shapes, batch_size=data.batch_size,
                length_quantum=data.text_quantum,
                text_quantum=data.text_quantum, input_field="text",
            )
            return EpochIterator(ds, batches, seed=run.seed, shuffle=shuffle,
                                 fields=("text",))

        train_iter = iters(train_ds, True)
        valid_iter = iters(valid_ds, False) if valid_ds else None

        model = cls.build_model(cfg["model"], len(converter))
        opt: OptimConfig = cfg["optim"]
        tx = build_optimizer(
            opt.name, opt.lr, opt.schedule, opt.warmup_steps,
            cfg["model"].d_model, opt.weight_decay, (opt.b1, opt.b2),
            opt.eps, opt.grad_clip,
        )
        phase, key, mode = (run.best_metric.split(".")
                            if run.best_metric != "valid.acc.max"
                            else ("valid" if valid_iter else "train", "loss", "min"))
        trainer = Trainer(
            model, tx, out,
            TrainerOptions(
                max_epoch=run.max_epoch, patience=run.patience,
                keep_nbest=run.keep_nbest, best_metric=(phase, key, mode),
                log_interval=run.log_interval, seed=run.seed, resume=run.resume,
            ),
            batch_arg_names=("text", "text_lengths"),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0)
        state = trainer.run(state, train_iter, valid_iter)
        return state, trainer, model, tokenizer, converter
