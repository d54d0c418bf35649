"""Positional encodings.

Behavioral spec: reference `espnet/nets/pytorch_backend/transformer/embedding.py`
(`PositionalEncoding:35` — sinusoidal, x scaled by sqrt(d_model);
`RelPositionalEncoding:260` — symmetric positive+negative position table for
Transformer-XL style relative attention). Implemented as precomputed tables
applied functionally; dropout is handled by callers.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def sinusoidal_table(maxlen: int, d_model: int) -> np.ndarray:
    """(maxlen, d_model) sin/cos position table."""
    pos = np.arange(maxlen, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((maxlen, d_model), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def add_positional_encoding(x: jnp.ndarray, scale: bool = True) -> jnp.ndarray:
    """x: (B, T, D). Returns x*sqrt(D) + PE[:T] (absolute sinusoidal)."""
    t, d = x.shape[-2], x.shape[-1]
    pe = jnp.asarray(sinusoidal_table(t, d))
    if scale:
        x = x * jnp.asarray(np.sqrt(d), x.dtype)
    return x + pe.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def rel_positional_table(maxlen: int, d_model: int) -> np.ndarray:
    """(2*maxlen-1, d_model) table for positions [maxlen-1 ... -(maxlen-1)].

    Matches RelPositionalEncoding's layout (positive positions first,
    reversed, then negative), `embedding.py:260-333`.
    """
    pos = np.arange(maxlen, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe_pos = np.zeros((maxlen, d_model), np.float64)
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((maxlen, d_model), np.float64)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    out = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)
    return out.astype(np.float32)


def rel_position_encoding(t: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 2T-1, D) relative position embedding for a length-T sequence."""
    table = rel_positional_table(t, d_model)
    return jnp.asarray(table, dtype)[None]
