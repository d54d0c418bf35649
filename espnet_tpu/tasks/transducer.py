"""Transducer ASR task.

Behavioral spec: reference `espnet2/tasks/asr_transducer.py` (standalone
RNN-T task wiring frontend/specaug/normalize + its own encoder/decoder/
joint-network into `ESPnetASRTransducerModel`,
`espnet2/asr_transducer/espnet_transducer_model.py`). Shares the ASR data
plane (wav.scp/text dirs, tokenizer, length-bucketed batches) and Trainer;
only the model family differs.
"""

from __future__ import annotations

import dataclasses

from espnet_tpu.models.transducer import TransducerASRModel, TransducerConfig
from espnet_tpu.tasks.asr import ASRDataConfig, ASRTask
from espnet_tpu.tasks.abs_task import OptimConfig, RunConfig


@dataclasses.dataclass(frozen=True)
class TransducerModelSection(TransducerConfig):
    vocab_size: int = -1


class TransducerTask(ASRTask):
    name = "asr_transducer"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": ASRDataConfig,
        "model": TransducerModelSection,
    }

    @classmethod
    def build_model(cls, model_cfg: TransducerModelSection, vocab_size: int):
        d = dataclasses.asdict(model_cfg)
        d["vocab_size"] = vocab_size
        d.pop("dtype", None)
        dtype = model_cfg.dtype
        if isinstance(dtype, str):
            import jax.numpy as jnp

            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
        return TransducerASRModel(TransducerConfig(dtype=dtype, **d))
