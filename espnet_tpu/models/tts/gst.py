"""Global style tokens (GST) style encoder.

Behavioral spec: reference `espnet2/tts/gst/style_encoder.py`
(StyleEncoder: ReferenceEncoder — strided conv2d stack over the reference
mel + GRU — followed by StyleTokenLayer: multi-head attention of the
reference embedding over learned style tokens). The style embedding
conditions the TTS encoder outputs (broadcast-add, as in the reference's
Tacotron2-GST integration).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ReferenceEncoder(nn.Module):
    """Strided conv stack + GRU over a reference mel (B, T, M)."""

    conv_channels: Sequence[int] = (32, 32, 64, 64, 128, 128)
    gru_units: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = mel[..., None]                     # (B, T, M, 1)
        for i, ch in enumerate(self.conv_channels):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        b, t, m, c = x.shape
        x = x.reshape(b, t, m * c)
        h = nn.RNN(nn.GRUCell(self.gru_units), name="gru")(x)
        return h[:, -1]                        # (B, gru_units)


class StyleTokenLayer(nn.Module):
    """Attention over learned style tokens (`style_encoder.py` GST)."""

    num_tokens: int = 10
    token_dim: int = 256
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref_emb):               # (B, D_ref) -> (B, token_dim)
        tokens = self.param(
            "tokens", nn.initializers.normal(0.5),
            (self.num_tokens, self.token_dim),
        )
        keys = jnp.tanh(tokens)                # (K, D)
        h = self.num_heads
        dk = self.token_dim // h
        q = nn.Dense(self.token_dim, dtype=self.dtype, name="q")(ref_emb)
        k = nn.Dense(self.token_dim, dtype=self.dtype, name="k")(keys)
        v = nn.Dense(self.token_dim, dtype=self.dtype, name="v")(keys)
        b = q.shape[0]
        qh = q.reshape(b, h, dk)
        kh = k.reshape(self.num_tokens, h, dk)
        vh = v.reshape(self.num_tokens, h, dk)
        scores = jnp.einsum("bhd,khd->bhk", qh, kh) / jnp.sqrt(float(dk))
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhk,khd->bhd", w, vh).reshape(b, self.token_dim)
        return out


class StyleEncoder(nn.Module):
    """ReferenceEncoder + StyleTokenLayer -> style embedding (B, token_dim)."""

    num_tokens: int = 10
    token_dim: int = 256
    num_heads: int = 4
    gru_units: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref_mel):
        ref = ReferenceEncoder(gru_units=self.gru_units, dtype=self.dtype,
                               name="ref_enc")(ref_mel)
        return StyleTokenLayer(self.num_tokens, self.token_dim,
                               self.num_heads, self.dtype,
                               name="style_tokens")(ref)
