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

import pytest  # noqa: E402

# Modules whose tests are compile-dominated integration/CLI runs (>~45 s
# each, measured with --durations): auto-marked `slow` so
# `pytest -m "not slow"` is a fast smoke tier. The FULL run (no marker
# filter) remains the release gate.
_SLOW_MODULES = {
    "test_recipe", "test_jets", "test_visinger", "test_vocoder_cli",
    "test_asr_mix", "test_st_mt", "test_vits_cli", "test_maskctc_cli",
    "test_e2e_smoke", "test_mulenc", "test_streaming_cli", "test_ngram",
    "test_ineube", "test_enh_s2t", "test_prodiff", "test_svs",
    "test_maskctc", "test_svoice", "test_vocoders", "test_tts_cli",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
