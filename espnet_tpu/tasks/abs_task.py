"""Generic task runner.

Behavioral spec: reference `espnet2/tasks/abs_task.py` (AbsTask: YAML-config
argument parsing with --print_config, build model/optimizer/iterators,
collect-stats stage, Trainer.run, dump resolved config.yaml next to the
checkpoints for inference to re-read). The TPU build drops the
process-spawning machinery — distribution is sharding inside the compiled
step (parallel/api.py) and multi-host bring-up is
`jax.distributed.initialize` (parallel/mesh.py) — so a Task is just:
sections of dataclass config + builders + a run() that stages
collect-stats then training.
"""

from __future__ import annotations

import dataclasses
import logging
import sys
from pathlib import Path
from typing import Any, Dict, Optional, Type

from espnet_tpu.utils.config import (
    dataclass_from_dict, dataclass_to_dict, dump_yaml, load_yaml,
    merge_dicts, parse_cli_overrides,
)

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class RunConfig:
    output_dir: str = "exp"
    max_epoch: int = 40
    seed: int = 0
    patience: Optional[int] = None
    keep_nbest: int = 10
    best_metric: str = "valid.acc.max"  # phase.key.mode
    log_interval: int = 50
    resume: bool = True
    collect_stats: bool = True
    # micro-batch gradient accumulation inside the compiled step
    # (reference --accum_grad, `espnet2/train/trainer.py:619-701`)
    accum_grad: int = 1
    # build tokenizer/stats then exit (recipe stage 8, asr.sh:1021)
    stats_only: bool = False
    # comma-separated init_param specs "path:src:dst:excludes"
    init_param: str = ""
    # per-epoch attention-heatmap PNGs from one validation batch
    # (`espnet2/train/trainer.py:787`)
    plot_attention: bool = False
    # Weights & Biases logging (--use_wandb, `espnet2/tasks/abs_task.py:1305`)
    use_wandb: bool = False
    wandb_project: str = ""
    # jax.profiler trace of N steady-state steps of the first epoch
    profile_steps: int = 0
    ngpu_note: str = "unused — device parallelism is via jax mesh"


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    name: str = "adam"
    lr: float = 2e-3
    schedule: str = "warmuplr"
    warmup_steps: int = 25000
    weight_decay: float = 0.0
    grad_clip: float = 5.0
    b1: float = 0.9
    b2: float = 0.98
    eps: float = 1.0e-9


class AbsTask:
    """Subclasses define `sections` (name -> dataclass) and `run(cfg)`."""

    name = "abs"
    sections: Dict[str, Type] = {"run": RunConfig, "optim": OptimConfig}

    @classmethod
    def parse_config(cls, argv) -> Dict[str, Any]:
        overrides = parse_cli_overrides(list(argv))
        base: Dict[str, Any] = {}
        if "config" in overrides:
            base = load_yaml(overrides.pop("config"))
        raw = merge_dicts(base, overrides)
        print_and_exit = bool(raw.pop("print_config", False))
        cfg = {}
        for sec, klass in cls.sections.items():
            cfg[sec] = dataclass_from_dict(klass, raw.pop(sec, {}))
        if raw:
            raise KeyError(
                f"unknown config sections {sorted(raw)}; "
                f"valid: {sorted(cls.sections)}"
            )
        if print_and_exit:
            import yaml

            yaml.safe_dump(
                {s: dataclass_to_dict(v) for s, v in cfg.items()},
                sys.stdout, sort_keys=False,
            )
            raise SystemExit(0)
        return cfg

    @classmethod
    def dump_config(cls, cfg: Dict[str, Any], output_dir) -> None:
        dump_yaml(
            {s: dataclass_to_dict(v) for s, v in cfg.items()},
            Path(output_dir) / "config.yaml",
        )

    @classmethod
    def load_config(cls, output_dir_or_yaml) -> Dict[str, Any]:
        p = Path(output_dir_or_yaml)
        if p.is_dir():
            p = p / "config.yaml"
        raw = load_yaml(p)
        return {
            sec: dataclass_from_dict(klass, raw.get(sec, {}))
            for sec, klass in cls.sections.items()
        }

    @classmethod
    def main(cls, argv=None):
        logging.basicConfig(
            level=logging.INFO,
            format="%(asctime)s %(levelname)s %(message)s",
        )
        from espnet_tpu.utils.jax_cache import enable_persistent_cache

        enable_persistent_cache()
        cfg = cls.parse_config(argv if argv is not None else sys.argv[1:])
        return cls.run(cfg)

    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        raise NotImplementedError
