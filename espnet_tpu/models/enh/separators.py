"""Separators: encoded mixture -> per-speaker masked features.

Behavioral spec: reference `espnet2/enh/separator/tcn_separator.py:15`
(TCN/Conv-TasNet), `dprnn_separator.py:15` (dual-path RNN),
`transformer_separator.py` (transformer encoder over frames). Each returns
(masked feature per speaker, lengths, {mask_spk<i>}).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.enh.layers import (
    DPRNNBlock, TemporalConvNet, merge_segments, segment_sequence,
)


class TCNSeparator(nn.Module):
    """Conv-TasNet separator (`tcn_separator.py:15`)."""

    input_dim: int
    num_spk: int = 2
    layers: int = 8
    stacks: int = 3
    bottleneck: int = 128
    hidden: int = 512
    kernel: int = 3
    norm_type: str = "gLN"
    causal: bool = False
    nonlinear: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        masks = TemporalConvNet(
            self.input_dim, self.num_spk, self.layers, self.stacks,
            self.bottleneck, self.hidden, self.kernel, self.norm_type,
            self.causal, self.nonlinear, self.dtype, name="tcn",
        )(feat)  # (B, C, T, N)
        masked = masks * feat[:, None]
        others = {
            f"mask_spk{i + 1}": masks[:, i] for i in range(self.num_spk)
        }
        return masked, lengths, others


class DPRNNSeparator(nn.Module):
    """Dual-path RNN separator (`dprnn_separator.py:15`)."""

    input_dim: int
    num_spk: int = 2
    num_blocks: int = 6
    hidden: int = 128
    chunk_size: int = 100
    nonlinear: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        b, t, n = feat.shape
        seg, t_orig = segment_sequence(feat, self.chunk_size)
        for i in range(self.num_blocks):
            seg = DPRNNBlock(n, self.hidden, dtype=self.dtype,
                             name=f"block{i}")(seg)
        h = nn.Dense(self.num_spk * n, dtype=self.dtype, name="mask_out")(seg)
        h = h.reshape(b, seg.shape[1], self.chunk_size, self.num_spk, n)
        h = h.transpose(0, 3, 1, 2, 4).reshape(
            b * self.num_spk, seg.shape[1], self.chunk_size, n
        )
        masks = merge_segments(h, t_orig).reshape(b, self.num_spk, t, n)
        if self.nonlinear == "relu":
            masks = nn.relu(masks)
        elif self.nonlinear == "sigmoid":
            masks = nn.sigmoid(masks)
        else:
            masks = nn.tanh(masks)
        masked = masks * feat[:, None]
        others = {
            f"mask_spk{i + 1}": masks[:, i] for i in range(self.num_spk)
        }
        return masked, lengths, others


class TransformerSeparator(nn.Module):
    """Transformer-encoder separator (`transformer_separator.py`)."""

    input_dim: int
    num_spk: int = 2
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    num_layers: int = 4
    dropout_rate: float = 0.1
    nonlinear: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        from espnet_tpu.models.embedding import add_positional_encoding
        from espnet_tpu.models.transformer import TransformerEncoderLayer
        from espnet_tpu.ops.masks import attention_bias, make_valid_mask

        b, t, n = feat.shape
        x = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")(feat)
        x = add_positional_encoding(x)
        bias = attention_bias(make_valid_mask(lengths, t)[:, None, None, :])
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.num_heads, self.d_ff, self.dropout_rate,
                dtype=self.dtype, name=f"layer{i}",
            )(x, bias, deterministic)
        h = nn.Dense(self.num_spk * n, dtype=self.dtype, name="mask_out")(x)
        masks = h.reshape(b, t, self.num_spk, n).transpose(0, 2, 1, 3)
        if self.nonlinear == "relu":
            masks = nn.relu(masks)
        elif self.nonlinear == "sigmoid":
            masks = nn.sigmoid(masks)
        else:
            masks = nn.tanh(masks)
        masked = masks * feat[:, None]
        others = {
            f"mask_spk{i + 1}": masks[:, i] for i in range(self.num_spk)
        }
        return masked, lengths, others
