"""SpecAugment as pure-functional jax random masking.

Behavioral spec: reference `espnet2/asr/specaug/specaug.py:9` +
`espnet2/layers/mask_along_axis.py` (MaskAlongAxis with mask_width_range,
num_mask, replace with zero/mean) and `espnet2/layers/time_warp.py`.
TPU-first formulation: masks are built with broadcasted iota comparisons
(no dynamic shapes), the same jitted code path for any batch, and applied
as a multiply — XLA fuses it into the surrounding frontend chain.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _mask_along_axis(
    key: jax.Array,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    axis: int,
    num_masks: int,
    width_range: Tuple[int, int],
) -> jnp.ndarray:
    """Zero `num_masks` random spans of width in [w0, w1) along `axis`.

    x: (B, T, D); axis=1 masks time (span limited by per-utt length),
    axis=2 masks frequency.
    """
    b = x.shape[0]
    size = x.shape[axis]
    k1, k2 = jax.random.split(key)
    widths = jax.random.randint(k1, (b, num_masks), width_range[0], width_range[1])
    if axis == 1 and lengths is not None:
        limit = lengths[:, None]
        # Adaptive cap (reference MaskAlongAxisVariableMaxWidth,
        # `espnet2/layers/mask_along_axis.py`): never let the masks jointly
        # cover a whole short utterance — an all-masked (constant-zero)
        # feature tensor makes every LayerNorm backward multiply the
        # cotangent by 1/sqrt(eps) and gradients explode.
        widths = jnp.minimum(widths, jnp.maximum(limit // (2 * num_masks), 1))
    else:
        limit = size
        widths = jnp.minimum(widths, max(size // (2 * num_masks), 1))
    starts = (
        jax.random.uniform(k2, (b, num_masks)) * jnp.maximum(limit - widths, 1)
    ).astype(jnp.int32)
    pos = jnp.arange(size)[None, None, :]  # (1, 1, size)
    masked = (pos >= starts[:, :, None]) & (pos < (starts + widths)[:, :, None])
    keep = ~jnp.any(masked, axis=1)  # (B, size)
    shape = [b, 1, 1]
    shape[axis] = size
    return x * keep.reshape(shape).astype(x.dtype)


def specaug(
    key: jax.Array,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    *,
    num_freq_masks: int = 2,
    freq_mask_width: Tuple[int, int] = (0, 20),
    num_time_masks: int = 2,
    time_mask_width: Tuple[int, int] = (0, 100),
    apply_freq_mask: bool = True,
    apply_time_mask: bool = True,
) -> jnp.ndarray:
    """Apply SpecAugment to (B, T, D) features. Defaults mirror the reference
    SpecAug module's defaults (`espnet2/asr/specaug/specaug.py:29-46`,
    time-warp off by default in our TPU build; warping is a gather that
    contributes little at conformer scale and breaks static-shape fusion).
    """
    if apply_freq_mask:
        key, sub = jax.random.split(key)
        x = _mask_along_axis(sub, x, lengths, 2, num_freq_masks, freq_mask_width)
    if apply_time_mask:
        key, sub = jax.random.split(key)
        x = _mask_along_axis(sub, x, lengths, 1, num_time_masks, time_mask_width)
    return x
