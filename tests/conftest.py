"""Test configuration: force an 8-device virtual CPU platform.

Mirrors the reference's CI strategy (CPU-only, SURVEY.md §4) — multi-device
code paths (pjit/shard_map over a Mesh) are exercised on 8 virtual CPU
devices, matching how the driver dry-runs the multichip path.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

# The preinstalled 'axon' TPU plugin overrides JAX_PLATFORMS at import time;
# force the CPU platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles
# (77 min cold); cached reruns skip them. ESPNET_TPU_CACHE_DIR="" disables.
from espnet_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
