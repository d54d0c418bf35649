"""Longformer-style encoder: sliding-window local self-attention.

Behavioral spec: reference `espnet2/asr/encoder/longformer_encoder.py`
(conformer blocks whose self-attention is Longformer sliding-window
attention with `attention_window` per layer; no global tokens in the ASR
use). The reference delegates to the longformer CUDA/sparse kernels.

TPU-native design: blocked local attention. The sequence is chunked into
blocks of size w (= attention_window); queries in block i attend to keys
in blocks {i-1, i, i+1} with an exact |p - q| <= w band mask. Everything
is dense (B, H, nc, w, 3w) einsum work that tiles onto the MXU — O(T*w)
memory instead of O(T^2), no gather/scatter.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.conformer import ConvolutionModule
from espnet_tpu.models.subsampling import Conv2dSubsampling
from espnet_tpu.models.transformer import PositionwiseFeedForward
from espnet_tpu.ops.masks import make_valid_mask

_NEG = float(jnp.finfo(jnp.float32).min)


class LocalSelfAttention(nn.Module):
    """Banded self-attention: token p attends to q iff |p - q| <= window.

    Same projection layout as
    `espnet_tpu.models.attention.MultiHeadAttention` (q/k/v/out_proj), so
    parameters are interchangeable — the band is the only difference.
    """

    num_heads: int
    d_model: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, D); pad_mask: (B, T) True=valid
        from espnet_tpu.models.attention import _dense

        b, t, _ = x.shape
        h, w = self.num_heads, self.window
        dk = self.d_model // h
        q = _dense(self.d_model, self.dtype, "q_proj")(x)
        k = _dense(self.d_model, self.dtype, "k_proj")(x)
        v = _dense(self.d_model, self.dtype, "v_proj")(x)

        nc = -(-t // w)
        pad_t = nc * w - t

        def chunk(y):  # (B, T, D) -> (B, H, nc, w, dk)
            y = jnp.pad(y, ((0, 0), (0, pad_t), (0, 0)))
            return y.reshape(b, nc, w, h, dk).transpose(0, 3, 1, 2, 4)

        qc = chunk(q)
        kc = chunk(k)
        vc = chunk(v)
        valid = jnp.pad(pad_mask, ((0, 0), (0, pad_t)))
        valid = valid.reshape(b, nc, w)

        def neighbors(y):  # (B, H, nc, w, dk) -> (B, H, nc, 3w, dk)
            y = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
            return jnp.concatenate(
                [y[:, :, :-2], y[:, :, 1:-1], y[:, :, 2:]], axis=3
            )

        kn = neighbors(kc)
        vn = neighbors(vc)
        # key validity including the phantom blocks at the edges
        vpad = jnp.pad(valid, ((0, 0), (1, 1), (0, 0)))
        kvalid = jnp.concatenate(
            [vpad[:, :-2], vpad[:, 1:-1], vpad[:, 2:]], axis=2
        )  # (B, nc, 3w)

        scores = jnp.einsum(
            "bhcqd,bhckd->bhcqk", qc, kn,
            preferred_element_type=jnp.float32,
        ) / (dk ** 0.5)
        # band mask: query local pos i (global c*w + i), key local pos j in
        # the 3w stripe has global pos c*w + j - w => |i - (j - w)| <= window
        qi = jax.lax.broadcasted_iota(jnp.int32, (w, 3 * w), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (w, 3 * w), 1) - w
        band = jnp.abs(qi - kj) <= w  # (w, 3w)
        mask = band[None, None, None] & kvalid[:, None, :, None, :]
        scores = jnp.where(mask, scores, _NEG)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhcqk,bhckd->bhcqd", attn, vn)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, nc * w, h * dk)[:, :t]
        out = _dense(self.d_model, self.dtype, "out_proj",
                     logical=("heads", "embed"))(out)
        return out * pad_mask[:, :, None].astype(out.dtype)


class LongformerLayer(nn.Module):
    """Conformer-style block with local attention
    (`longformer_encoder.py` builds conformer EncoderLayers with
    LongformerAttention)."""

    d_model: int
    num_heads: int
    d_ff: int
    window: int
    kernel_size: int = 31
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff1")(x)
        h = PositionwiseFeedForward(self.d_model, self.d_ff,
                                    self.dropout_rate, activation="swish",
                                    dtype=self.dtype, name="ff1")(
            h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_attn")(x)
        h = LocalSelfAttention(self.num_heads, self.d_model, self.window,
                               self.dtype, name="self_attn")(h, pad_mask)
        x = x + drop(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
        h = ConvolutionModule(self.d_model, self.kernel_size, "layer",
                              self.dtype, name="conv")(
            h, pad_mask, deterministic)
        x = x + drop(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff2")(x)
        h = PositionwiseFeedForward(self.d_model, self.d_ff,
                                    self.dropout_rate, activation="swish",
                                    dtype=self.dtype, name="ff2")(
            h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm_final")(x)


class LongformerEncoder(nn.Module):
    """Conv2d-subsampled encoder of LongformerLayers
    (`espnet2/asr/encoder/longformer_encoder.py` equivalent)."""

    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_layers: int = 12
    window: int = 100
    kernel_size: int = 31
    dropout_rate: float = 0.1
    subsampling_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True):
        from espnet_tpu.models.embedding import add_positional_encoding

        x, olens = Conv2dSubsampling(
            self.d_model, self.subsampling_factor, dtype=self.dtype,
            name="embed",
        )(feats, lengths)
        x = add_positional_encoding(x * jnp.asarray(self.d_model ** 0.5,
                                                    x.dtype))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        pad_mask = make_valid_mask(olens, x.shape[1])
        for i in range(self.num_layers):
            x = LongformerLayer(
                self.d_model, self.num_heads, self.d_ff, self.window,
                self.kernel_size, self.dropout_rate, self.dtype,
                name=f"layer{i}",
            )(x, pad_mask, deterministic)
        return x, olens
