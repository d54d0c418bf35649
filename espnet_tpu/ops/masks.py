"""Length/causal mask utilities.

Semantics match the reference's mask helpers
(``espnet/nets/pytorch_backend/nets_utils.py`` `make_pad_mask` /
``espnet/nets/pytorch_backend/transformer/mask.py`` `subsequent_mask`), but
expressed as pure functions over static shapes: every sequence in a batch is
padded to the same ``maxlen`` and masks are boolean arrays, True = *valid*
(note: the reference's make_pad_mask is True = pad; we standardise on
valid-masks internally and keep helpers for both conventions).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_valid_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, maxlen) bool, True where index < length."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def make_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """True where padded (reference convention)."""
    return ~make_valid_mask(lengths, maxlen)


def subsequent_mask(size: int, dtype=jnp.bool_) -> jnp.ndarray:
    """(size, size) lower-triangular causal mask, True = attendable."""
    return jnp.tril(jnp.ones((size, size), dtype=dtype))


def attention_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Convert a boolean attend-mask to an additive bias (-inf on masked)."""
    neg = jnp.finfo(dtype).min
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), neg, dtype))
