"""Sharded train/eval step construction (GSPMD).

Replaces the reference's DDP/fairscale wrapping
(`espnet2/train/trainer.py:222-253`) and within-batch rank sharding
(`espnet2/tasks/abs_task.py:1566-1575`): the *same* train step function is
jitted with NamedSharding constraints over a ("data","model") mesh —
parameters laid out by the flax logical-partitioning annotations, batches
split on the leading axis over "data" — and XLA inserts gradient psums
over ICI/DCN. No separate distributed code path exists.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from espnet_tpu.parallel.mesh import DEFAULT_RULES, batch_sharding
from espnet_tpu.train.steps import TrainState


def state_shardings(
    boxed_state: TrainState, mesh: Mesh, rules=DEFAULT_RULES,
    zero: bool = False,
) -> TrainState:
    """NamedSharding tree for a *boxed* TrainState (params still carrying
    `nn.LogicallyPartitioned` metadata from init). The returned tree matches
    the *unboxed* state structure; everything unannotated is replicated.

    ``zero=True`` additionally shards the optimizer-state tensors (Adam
    moments etc.) over the 'data' mesh axis — ZeRO-1 optimizer-state
    partitioning, the fairscale OSS role in the reference
    (SURVEY §2.6/§2.7): each moment tensor takes the 'data' axis on its
    first dimension that is unsharded and divisible, XLA inserting the
    reduce-scatter/all-gather around the update. Parameters and gradients
    keep their TP layout (ZeRO-1, not ZeRO-3).
    """
    logical_specs = nn.get_partition_spec(boxed_state)
    mesh_specs = nn.logical_to_mesh(logical_specs, rules)

    def to_sharding(spec):
        if not isinstance(spec, P):
            spec = P()
        return NamedSharding(mesh, spec)

    shardings = jax.tree_util.tree_map(
        to_sharding, mesh_specs,
        is_leaf=lambda x: isinstance(x, P) or x is None,
    )
    if zero and "data" in mesh.shape and mesh.shape["data"] > 1:
        data_size = mesh.shape["data"]
        unboxed = nn.meta.unbox(boxed_state)

        def zero_spec(sharding, leaf):
            shape = getattr(leaf, "shape", ())
            parts = list(sharding.spec) if sharding.spec else []
            parts += [None] * (len(shape) - len(parts))
            used = {p for p in parts if p is not None}
            if "data" in used or not shape:
                return sharding
            for i, (ax, dim) in enumerate(zip(parts, shape)):
                if ax is None and dim % data_size == 0:
                    parts[i] = "data"
                    return NamedSharding(mesh, P(*parts))
            return sharding  # too small to split: stays replicated

        shardings = shardings.replace(
            opt_state=jax.tree_util.tree_map(
                zero_spec, shardings.opt_state, unboxed.opt_state
            )
        )
    return shardings


def shard_state(boxed_state: TrainState, shardings: TrainState) -> TrainState:
    """Unbox the logical-partitioning metadata and place every leaf on the
    mesh according to `shardings` (same structure as the unboxed state)."""
    state = nn.meta.unbox(boxed_state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )


def make_batch_put(
    mesh: Mesh, allow_pad: bool = False
) -> Callable[[Dict[str, np.ndarray]], Dict]:
    """Host batch dict -> device arrays sharded over the 'data' axis.

    Batch sizes must divide the data-axis size — use the sampler's
    `size_multiple` (`data/sampler.py`) to guarantee it; an indivisible
    batch raises instead of silently repeat-padding (round-1 verdict: the
    repeats skewed loss normalisation and gradients). `allow_pad=True`
    restores repeat-padding for throughput-only paths and logs once.

    Multi-process (multi-host) runs build the global array from each
    process's local shard via `jax.make_array_from_process_local_data` —
    every process passes ITS OWN batch (selected by the process-sharded
    iterator, replacing `espnet2/tasks/abs_task.py:1566-1575`'s
    within-batch rank split), and the concatenation over processes is the
    global batch.
    """
    n_data = mesh.shape["data"]
    sharding = batch_sharding(mesh)
    multi_process = jax.process_count() > 1
    warned = []

    def put(batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        out = {}
        b = None
        for k, v in batch.items():
            if k == "keys":
                continue
            b = len(v)
            break
        local_div = n_data // jax.process_count() if multi_process else n_data
        pad = (-b) % max(local_div, 1) if b else 0
        if pad and not allow_pad:
            raise ValueError(
                f"batch size {b} does not divide the data axis ({n_data} "
                f"across {jax.process_count()} process(es)); build batches "
                "with size_multiple (data/sampler.py) or pass allow_pad=True"
            )
        if pad and not warned:
            warned.append(True)
            import logging

            logging.getLogger("espnet_tpu").warning(
                "repeat-padding batch %d -> %d for the data axis; loss "
                "normalisation includes the repeats", b, b + pad,
            )
        for k, v in batch.items():
            if k == "keys":
                continue
            if pad:
                reps = v[np.arange(pad) % b]
                v = np.concatenate([v, reps], axis=0)
            if multi_process:
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            else:
                out[k] = jax.device_put(v, sharding)
        return out

    return put


def unreplicate(tree):
    """Fetch a (possibly sharded) pytree to host numpy."""
    return jax.device_get(tree)
