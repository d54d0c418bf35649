"""Branchformer and E-Branchformer encoders.

Behavioral spec: reference `espnet2/asr/encoder/branchformer_encoder.py`
(parallel attention + cgMLP branches merged by concat+proj) and
`e_branchformer_encoder.py` (macaron FFN pair around the two branches with
a depthwise-conv fusion merge, `:93,160-164`); cgMLP per
`espnet2/asr/layers/cgmlp.py` (ConvolutionalSpatialGatingUnit `:15`:
split halves, LayerNorm + depthwise conv on the gate half, elementwise
product).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.attention import RelPositionMultiHeadAttention
from espnet_tpu.models.embedding import rel_position_encoding
from espnet_tpu.models.subsampling import Conv2dSubsampling
from espnet_tpu.models.transformer import PositionwiseFeedForward
from espnet_tpu.ops.masks import attention_bias, make_valid_mask


class ConvolutionalGatingMLP(nn.Module):
    """cgMLP: proj-up -> GeLU -> spatial gating unit -> proj-down
    (`cgmlp.py:84`)."""

    d_model: int
    d_hidden: int            # linear_units (split into halves by the CSGU)
    kernel_size: int = 31
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        h = nn.Dense(self.d_hidden, dtype=self.dtype, name="channel_proj1")(x)
        h = nn.gelu(h)
        # spatial gating unit (`cgmlp.py:15`)
        x_r, x_g = jnp.split(h, 2, axis=-1)
        x_g = nn.LayerNorm(dtype=self.dtype, name="gate_norm")(x_g)
        x_g = x_g * pad_mask[:, :, None].astype(x_g.dtype)
        x_g = nn.Conv(
            self.d_hidden // 2, (self.kernel_size,), padding="SAME",
            feature_group_count=self.d_hidden // 2, dtype=self.dtype,
            name="gate_conv",
        )(x_g)
        h = x_r * x_g
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="channel_proj2")(h)


class BranchformerLayer(nn.Module):
    """Two parallel branches merged by concat + linear
    (`branchformer_encoder.py:99-100`)."""

    d_model: int
    num_heads: int
    cgmlp_hidden: int
    cgmlp_kernel: int = 31
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, bias, pad_mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)
        # attention branch
        h1 = nn.LayerNorm(dtype=self.dtype, name="norm_attn")(x)
        h1 = RelPositionMultiHeadAttention(
            self.num_heads, self.d_model, self.dtype, name="self_attn",
        )(h1, pos_emb, bias)
        h1 = drop(h1, deterministic=deterministic)
        # cgMLP branch
        h2 = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")(x)
        h2 = ConvolutionalGatingMLP(
            self.d_model, self.cgmlp_hidden, self.cgmlp_kernel,
            self.dropout_rate, self.dtype, name="cgmlp",
        )(h2, pad_mask, deterministic)
        h2 = drop(h2, deterministic=deterministic)
        merged = nn.Dense(self.d_model, dtype=self.dtype, name="merge_proj")(
            jnp.concatenate([h1, h2], axis=-1)
        )
        return x + drop(merged, deterministic=deterministic)


class EBranchformerLayer(nn.Module):
    """Macaron FFN pair + branches with depthwise-conv fusion merge
    (`e_branchformer_encoder.py:93,160-164`)."""

    d_model: int
    num_heads: int
    d_ff: int
    cgmlp_hidden: int
    cgmlp_kernel: int = 31
    merge_kernel: int = 3
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, bias, pad_mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff1")(x)
        h = PositionwiseFeedForward(self.d_model, self.d_ff,
                                    self.dropout_rate, activation="swish",
                                    dtype=self.dtype, name="ff1")(
            h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)

        h1 = nn.LayerNorm(dtype=self.dtype, name="norm_attn")(x)
        h1 = RelPositionMultiHeadAttention(
            self.num_heads, self.d_model, self.dtype, name="self_attn",
        )(h1, pos_emb, bias)
        h1 = drop(h1, deterministic=deterministic)
        h2 = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")(x)
        h2 = ConvolutionalGatingMLP(
            self.d_model, self.cgmlp_hidden, self.cgmlp_kernel,
            self.dropout_rate, self.dtype, name="cgmlp",
        )(h2, pad_mask, deterministic)
        h2 = drop(h2, deterministic=deterministic)

        concat = jnp.concatenate([h1, h2], axis=-1)
        fused = nn.Conv(
            2 * self.d_model, (self.merge_kernel,), padding="SAME",
            feature_group_count=2 * self.d_model, dtype=self.dtype,
            name="merge_conv",
        )(concat)
        merged = nn.Dense(self.d_model, dtype=self.dtype, name="merge_proj")(
            concat + fused
        )
        x = x + drop(merged, deterministic=deterministic)

        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff2")(x)
        h = PositionwiseFeedForward(self.d_model, self.d_ff,
                                    self.dropout_rate, activation="swish",
                                    dtype=self.dtype, name="ff2")(
            h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm_final")(x)


class BranchformerEncoder(nn.Module):
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048            # used by e-branchformer FFNs
    num_layers: int = 12
    cgmlp_hidden: int = 2048
    cgmlp_kernel: int = 31
    dropout_rate: float = 0.1
    subsampling_factor: int = 4
    variant: str = "branchformer"  # branchformer | e_branchformer
    merge_kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True):
        x, olens = Conv2dSubsampling(
            self.d_model, self.subsampling_factor, dtype=self.dtype,
            name="embed",
        )(feats, lengths)
        x = x * jnp.asarray(self.d_model ** 0.5, x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        t = x.shape[1]
        pos_emb = rel_position_encoding(t, self.d_model, self.dtype)
        pad_mask = make_valid_mask(olens, t)
        bias = attention_bias(pad_mask[:, None, None, :])
        for i in range(self.num_layers):
            if self.variant == "e_branchformer":
                x = EBranchformerLayer(
                    self.d_model, self.num_heads, self.d_ff,
                    self.cgmlp_hidden, self.cgmlp_kernel, self.merge_kernel,
                    self.dropout_rate, self.dtype, name=f"layer{i}",
                )(x, pos_emb, bias, pad_mask, deterministic)
            else:
                x = BranchformerLayer(
                    self.d_model, self.num_heads, self.cgmlp_hidden,
                    self.cgmlp_kernel, self.dropout_rate, self.dtype,
                    name=f"layer{i}",
                )(x, pos_emb, bias, pad_mask, deterministic)
        if self.variant != "e_branchformer":
            x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        return x, olens
