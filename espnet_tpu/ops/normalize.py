"""Feature normalisation: global MVN (from collected stats) and utterance MVN.

Behavioral spec: reference `espnet2/layers/global_mvn.py:13` (loads
{count, sum, sum_square} stats npz produced by the collect-stats pass) and
`espnet2/layers/utterance_mvn.py:10`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.masks import make_valid_mask


def global_mvn_params(
    stats: dict, norm_means: bool = True, norm_vars: bool = True, eps: float = 1.0e-20
) -> Tuple[np.ndarray, np.ndarray]:
    """{count, sum, sum_square} -> (mean, inv_std) arrays of shape (D,)."""
    count = np.asarray(stats["count"], np.float64)
    mean = np.asarray(stats["sum"], np.float64) / count
    var = np.asarray(stats["sum_square"], np.float64) / count - mean * mean
    std = np.sqrt(np.maximum(var, eps))
    if not norm_means:
        mean = np.zeros_like(mean)
    if not norm_vars:
        std = np.ones_like(std)
    return mean.astype(np.float32), (1.0 / std).astype(np.float32)


def global_mvn(
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
) -> jnp.ndarray:
    """(B, T, D) -> normalised, padding re-zeroed."""
    out = (x - mean) * inv_std
    if lengths is not None:
        mask = make_valid_mask(lengths, x.shape[1])[:, :, None]
        out = out * mask.astype(out.dtype)
    return out


def utterance_mvn(
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    norm_means: bool = True,
    norm_vars: bool = False,
    eps: float = 1.0e-20,
) -> jnp.ndarray:
    """Per-utterance mean/var normalisation over valid frames only."""
    if lengths is None:
        n = jnp.full((x.shape[0], 1, 1), x.shape[1], x.dtype)
        mask = jnp.ones(x.shape[:2], x.dtype)[:, :, None]
    else:
        mask = make_valid_mask(lengths, x.shape[1]).astype(x.dtype)[:, :, None]
        n = lengths.astype(x.dtype)[:, None, None]
    mean = jnp.sum(x * mask, axis=1, keepdims=True) / n
    if norm_means:
        out = (x - mean) * mask
    else:
        out = x * mask
    if norm_vars:
        var = jnp.sum(((x - mean) * mask) ** 2, axis=1, keepdims=True) / n
        out = out / jnp.sqrt(jnp.maximum(var, eps))
    return out
