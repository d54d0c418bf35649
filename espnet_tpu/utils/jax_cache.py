"""Persistent XLA compilation cache.

The flagship train step costs minutes of XLA+Mosaic compile per shape
bucket (BENCH_r02: 634 s compile+first-step). The reference amortises this
with torch's eager execution; the TPU-native equivalent is JAX's persistent
compilation cache — compiled executables are keyed by (HLO, compile flags,
backend) and reloaded in milliseconds on every later process, so bucket
recompiles across trainer restarts / decode runs / bench runs are paid once
per machine instead of once per process.

Enabled by every CLI entry (`tasks/abs_task.py` main) and `bench.py`.
Set ESPNET_TPU_CACHE_DIR to relocate, or ESPNET_TPU_CACHE_DIR="" to disable.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently point JAX at an on-disk compilation cache."""
    global _ENABLED
    if _ENABLED:
        return None
    # Honor JAX_PLATFORMS even where an installed accelerator plugin (the
    # 'axon' TPU tunnel) overrides the env var at import time: recipe
    # subprocesses launched with JAX_PLATFORMS=cpu must actually run on
    # CPU (the config API wins over the plugin's auto-selection).
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if path is None:
        path = os.environ.get(
            "ESPNET_TPU_CACHE_DIR",
            str(Path.home() / ".cache" / "espnet_tpu" / "xla"),
        )
    if not path:  # explicitly disabled
        return None
    import jax

    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default min compile time is 1 s; keep it — sub-second programs are
    # cheaper to recompile than to hash + stat.
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knob
        pass
    _ENABLED = True
    return path
