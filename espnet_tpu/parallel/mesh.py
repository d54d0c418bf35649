"""Device mesh construction.

Replaces the reference's process-group management
(`espnet2/train/distributed_utils.py`, SURVEY §2.7): instead of
rank/world-size resolution + NCCL init, we build a `jax.sharding.Mesh`
with ("data", "model") axes and let GSPMD insert collectives. Multi-host
initialisation goes through `jax.distributed.initialize` (driven by the
launcher env), after which `jax.devices()` spans the slice and the same
mesh code applies.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (replaces init_torch_distributed,
    `distributed_utils.py:86`). Arguments default from the standard env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, as set
    by `bin/launch.py`, or TPU metadata); no-op when single-host."""
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None:
        return  # single-host, nothing to do
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(
    model_parallel: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Mesh with axes ("data", "model"); data = n_devices / model_parallel.

    On real slices `jax.experimental.mesh_utils.create_device_mesh` lays the
    axes out so that "model" rides the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    shape = (n // model_parallel, model_parallel)
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "model"))


# Logical-axis -> mesh-axis rules for the flax logical partitioning names
# used across models/ (attention.py, transformer.py): the head/mlp/vocab
# dimensions are the tensor-parallel shards, embed is replicated.
DEFAULT_RULES = (
    ("embed", None),
    ("heads", "model"),
    ("mlp", "model"),
    ("vocab", "model"),
    ("kv", None),
    # stacked-layer axis introduced by nn.scan over encoder blocks
    # (ConformerEncoder scan_layers=True): replicated — layers are a
    # sequential pipeline, not a shardable dimension on a 2D dp/tp mesh
    ("layers", None),
)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
