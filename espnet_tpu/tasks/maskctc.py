"""Mask-CTC ASR task.

Behavioral spec: reference `espnet2/asr/maskctc_model.py:39` (MaskCTCModel
registered under `--model maskctc` in `espnet2/tasks/asr.py`'s model
ClassChoices) trained through the same ASR data plane. The <mask> token is
appended past the vocabulary (mask_token = vocab_size), matching the
reference's `vocab_size + 1` MLM decoder.
"""

from __future__ import annotations

import dataclasses

from espnet_tpu.models.maskctc import MaskCTCConfig, MaskCTCModel
from espnet_tpu.tasks.abs_task import OptimConfig, RunConfig
from espnet_tpu.tasks.asr import ASRDataConfig, ASRTask


@dataclasses.dataclass(frozen=True)
class MaskCTCModelSection(MaskCTCConfig):
    vocab_size: int = -1


class MaskCTCTask(ASRTask):
    name = "asr_maskctc"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": ASRDataConfig,
        "model": MaskCTCModelSection,
    }
    # the training-time mask_uniform sampling draws from its own stream
    rng_names = ("dropout", "specaug", "mask")

    @classmethod
    def build_model(cls, model_cfg: MaskCTCModelSection, vocab_size: int):
        d = dataclasses.asdict(model_cfg)
        d["vocab_size"] = vocab_size
        d.pop("dtype", None)
        dtype = model_cfg.dtype
        if isinstance(dtype, str):
            import jax.numpy as jnp

            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
        return MaskCTCModel(MaskCTCConfig(dtype=dtype, **d))
