"""Checkpointing: full-state resume, per-epoch params, n-best averaging.

Behavioral spec: reference `espnet2/train/trainer.py:347-440` (single
`checkpoint.pth` {model, optimizers, schedulers, reporter} per epoch,
`NNepoch.pth` + `latest.pth` + `<phase>.<metric>.best.pth` symlinks, n-best
retention/pruning) and `espnet2/main_funcs/average_nbest_models.py:13`.
Serialization is flax msgpack (host-side, framework-neutral pytrees).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization


def save_pytree(path, pytree) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pytree = jax.device_get(pytree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(pytree))


def load_pytree(path, target):
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


class CheckpointManager:
    """Manages <out>/checkpoint.msgpack (resume), <out>/ep<N>.params.msgpack,
    best-epoch links and n-best pruning."""

    def __init__(self, out_dir, keep_nbest: int = 10):
        self.out = Path(out_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        self.keep_nbest = keep_nbest

    # --- full training state (resume) ---
    def save_state(self, state_pytree, epoch: int, reporter_state: dict) -> None:
        save_pytree(self.out / "checkpoint.msgpack", state_pytree)
        meta = {"epoch": epoch, "reporter": reporter_state}
        (self.out / "checkpoint.meta.json").write_text(json.dumps(meta))

    def has_checkpoint(self) -> bool:
        return (self.out / "checkpoint.msgpack").exists()

    def load_state(self, target_state):
        state = load_pytree(self.out / "checkpoint.msgpack", target_state)
        meta = json.loads((self.out / "checkpoint.meta.json").read_text())
        return state, meta["epoch"], meta["reporter"]

    # --- per-epoch params ---
    def params_path(self, epoch: int) -> Path:
        return self.out / f"ep{epoch}.params.msgpack"

    def save_epoch_params(self, params, epoch: int) -> None:
        save_pytree(self.params_path(epoch), params)

    def link_best(self, epoch: int, tag: str) -> None:
        """tag like 'valid.acc.best' -> symlink to epoch params."""
        link = self.out / f"{tag}.params.msgpack"
        if link.is_symlink() or link.exists():
            link.unlink()
        link.symlink_to(self.params_path(epoch).name)

    def prune(self, keep_epochs: List[int]) -> None:
        """Remove ep*.params files not in keep_epochs (reference prune,
        `trainer.py:434-440`)."""
        keep = {self.params_path(e).name for e in keep_epochs}
        for p in self.out.glob("ep*.params.msgpack"):
            if p.name not in keep:
                p.unlink()

    def average_nbest(self, params_target, epochs: List[int], tag: str):
        """Average params over the given epochs
        (`average_nbest_models.py:13`), save as <tag>.ave.params.msgpack."""
        acc = None
        n = 0
        for e in epochs:
            p = load_pytree(self.params_path(e), params_target)
            if acc is None:
                acc = jax.tree_util.tree_map(
                    lambda x: np.asarray(x, np.float64), p
                )
            else:
                acc = jax.tree_util.tree_map(
                    lambda a, x: a + np.asarray(x, np.float64), acc, p
                )
            n += 1
        # floats averaged; non-floats (e.g. counters) keep the first value
        first = load_pytree(self.params_path(epochs[0]), params_target)
        ave = jax.tree_util.tree_map(
            lambda a, f: (a / n).astype(np.float32)
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else f,
            acc,
            first,
        )
        save_pytree(self.out / f"{tag}.ave.params.msgpack", ave)
        return ave
