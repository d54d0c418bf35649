"""Convolutional subsampling front blocks.

Behavioral spec: reference `espnet/nets/pytorch_backend/transformer/subsampling.py`
(`Conv2dSubsampling:46` ×4 and its ×2/×6/×8 variants): two (or three) 3x3
stride-2 conv+relu over a (B, 1, T, F) "image", then a linear projection of
the flattened (channels × reduced-freq) axis to d_model.  Length recurrence
per stride-2 valid conv: t -> (t - 1) // 2 (floor((t - 3)/2) + 1).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


def _conv_out_len(t, kernel=3, stride=2):
    return (t - kernel) // stride + 1


def subsampled_length(lengths: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Output lengths after Conv2dSubsampling with total reduction `factor`."""
    out = lengths
    if factor == 2:
        out = _conv_out_len(_conv_out_len(out, 3, 2), 3, 1)
    elif factor == 4:
        out = _conv_out_len(_conv_out_len(out, 3, 2), 3, 2)
    elif factor == 6:
        out = _conv_out_len(_conv_out_len(out, 3, 2), 5, 3)
    elif factor == 8:
        out = _conv_out_len(_conv_out_len(_conv_out_len(out, 3, 2), 3, 2), 3, 2)
    else:
        raise ValueError(f"unsupported subsampling factor {factor}")
    return out


class Conv2dSubsampling(nn.Module):
    """(B, T, F) features -> (B, T', d_model), T' ≈ T/factor."""

    d_model: int
    factor: int = 4  # one of {2, 4, 6, 8}
    channels: int = None  # defaults to d_model
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.channels or self.d_model
        x = x[..., None]  # (B, T, F, C=1) — NHWC for lax conv
        if self.factor == 2:
            convs = [(3, 2), (3, 1)]
        elif self.factor == 4:
            convs = [(3, 2), (3, 2)]
        elif self.factor == 6:
            convs = [(3, 2), (5, 3)]
        elif self.factor == 8:
            convs = [(3, 2), (3, 2), (3, 2)]
        else:
            raise ValueError(f"unsupported subsampling factor {self.factor}")
        freq = x.shape[2]
        for i, (k, s) in enumerate(convs):
            x = nn.Conv(
                c, (k, k), strides=(s, s), padding="VALID", dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            freq = _conv_out_len(freq, k, s)
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, freq * c)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="out")(x)
        return x, subsampled_length(lengths, self.factor)
