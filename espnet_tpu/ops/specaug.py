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


def time_warp(
    key: jax.Array,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    window: int = 5,
) -> jnp.ndarray:
    """SpecAugment time warp as a static-shape linear-interp gather.

    Behavioral spec: `espnet2/layers/time_warp.py:49` (TimeWarp): pick a
    centre frame c in (window, L-window) and a warp target c' = c + U(-w, w),
    then stretch [0, c) onto [0, c') and [c, L) onto [c', L). The reference
    interpolates bicubically through F.interpolate; here the time axis is
    resampled with piecewise-linear interpolation (same warp map, cheaper
    and shape-static — the smoothing kernel is immaterial for augmentation).
    Utterances shorter than 2*window+2 frames pass through unchanged.
    """
    b, t, d = x.shape
    if lengths is None:
        lens = jnp.full((b,), t, jnp.int32)
    else:
        lens = lengths.astype(jnp.int32)
    kc, kw = jax.random.split(key)
    lo = jnp.full((b,), window + 1, jnp.int32)
    hi = jnp.maximum(lens - window, lo + 1)
    c = (
        lo
        + (jax.random.uniform(kc, (b,)) * (hi - lo).astype(jnp.float32)).astype(
            jnp.int32
        )
    ).astype(jnp.float32)
    shift = jax.random.randint(kw, (b,), -window, window + 1).astype(jnp.float32)
    wp = c + shift
    lens_f = lens.astype(jnp.float32)
    pos = jnp.arange(t, dtype=jnp.float32)[None, :]  # (1, T)
    left = pos * (c / jnp.maximum(wp, 1.0))[:, None]
    right = (
        c[:, None]
        + (pos - wp[:, None])
        * ((lens_f - 1.0 - c) / jnp.maximum(lens_f - 1.0 - wp, 1.0))[:, None]
    )
    src = jnp.where(pos < wp[:, None], left, right)
    # identity outside the valid region and for too-short utterances
    identity = (pos >= lens_f[:, None]) | (lens[:, None] <= 2 * window + 2)
    src = jnp.where(identity, pos, jnp.clip(src, 0.0, lens_f[:, None] - 1.0))
    i0 = jnp.floor(src).astype(jnp.int32)
    frac = (src - i0.astype(jnp.float32)).astype(x.dtype)[:, :, None]
    i1 = jnp.minimum(i0 + 1, t - 1)
    g0 = jnp.take_along_axis(x, i0[:, :, None], axis=1)
    g1 = jnp.take_along_axis(x, i1[:, :, None], axis=1)
    return g0 * (1 - frac) + g1 * frac


def specaug(
    key: jax.Array,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    *,
    apply_time_warp: bool = True,
    time_warp_window: int = 5,
    num_freq_masks: int = 2,
    freq_mask_width: Tuple[int, int] = (0, 20),
    num_time_masks: int = 2,
    time_mask_width: Tuple[int, int] = (0, 100),
    apply_freq_mask: bool = True,
    apply_time_mask: bool = True,
) -> jnp.ndarray:
    """Apply SpecAugment to (B, T, D) features. Defaults mirror the reference
    SpecAug module's defaults (`espnet2/asr/specaug/specaug.py:29-46`):
    time-warp (window 5) + 2 freq masks + 2 time masks.
    """
    if apply_time_warp:
        key, sub = jax.random.split(key)
        x = time_warp(sub, x, lengths, time_warp_window)
    if apply_freq_mask:
        key, sub = jax.random.split(key)
        x = _mask_along_axis(sub, x, lengths, 2, num_freq_masks, freq_mask_width)
    if apply_time_mask:
        key, sub = jax.random.split(key)
        x = _mask_along_axis(sub, x, lengths, 1, num_time_masks, time_mask_width)
    return x
