"""Conformer encoder (flax.linen).

Behavioral spec: reference `espnet/nets/pytorch_backend/conformer/`
(`Encoder` encoder.py:38: macaron feed-forward pair scaled by 1/2, rel-pos
self-attention, depthwise conv module `convolution.py:13` with GLU +
batch-norm + swish, pre-norm everywhere, final LayerNorm) and
`espnet2/asr/encoder/conformer_encoder.py:48`. TPU-first: the depthwise conv
is a feature-grouped `lax.conv_general_dilated` (maps to VPU/MXU without
im2col), batch-norm is replaced by the masked batch-independent variant
(group/layer-norm option) by default since per-batch statistics break under
`shard_map` data parallelism — `norm_type="batch"` is still available and
aggregates via masked moments.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.attention import RelPositionMultiHeadAttention
from espnet_tpu.models.embedding import rel_position_encoding
from espnet_tpu.models.subsampling import Conv2dSubsampling
from espnet_tpu.models.transformer import PositionwiseFeedForward
from espnet_tpu.ops.dropout import FastDropout
from espnet_tpu.ops.masks import attention_bias, make_valid_mask


class ConvolutionModule(nn.Module):
    """Pointwise(2D)->GLU->depthwise->norm->swish->pointwise, residual outside.

    Mirror of `conformer/convolution.py:13`.
    """

    d_model: int
    kernel_size: int = 31
    norm_type: str = "layer"  # "layer" (shard_map-safe) | "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        # x: (B, T, D); pad_mask: (B, T) True=valid
        d = self.d_model
        h = nn.Dense(2 * d, dtype=self.dtype, name="pointwise_conv1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        # zero out padding so the depthwise conv cannot leak across it
        h = h * pad_mask[:, :, None].astype(h.dtype)
        h = nn.Conv(
            d,
            (self.kernel_size,),
            padding="SAME",
            feature_group_count=d,
            dtype=self.dtype,
            name="depthwise_conv",
        )(h)
        if self.norm_type == "batch":
            h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                             name="norm")(h)
        else:
            h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        h = nn.swish(h)
        return nn.Dense(d, dtype=self.dtype, name="pointwise_conv2")(h)


class ConformerBlock(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    kernel_size: int = 31
    dropout_rate: float = 0.1
    conv_norm_type: str = "layer"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, bias, pad_mask, deterministic: bool = True):
        drop = FastDropout(self.dropout_rate)
        # Macaron FF 1 (scaled 1/2)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff1")(x)
        h = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout_rate,
                                    activation="swish", dtype=self.dtype,
                                    name="ff1")(h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)
        # Self-attention (rel pos)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_attn")(x)
        h = RelPositionMultiHeadAttention(self.num_heads, self.d_model,
                                          self.dtype, name="self_attn")(
            h, pos_emb, bias)
        x = x + drop(h, deterministic=deterministic)
        # Conv module
        h = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
        h = ConvolutionModule(self.d_model, self.kernel_size,
                              self.conv_norm_type, self.dtype, name="conv")(
            h, pad_mask, deterministic)
        x = x + drop(h, deterministic=deterministic)
        # Macaron FF 2 (scaled 1/2)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff2")(x)
        h = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout_rate,
                                    activation="swish", dtype=self.dtype,
                                    name="ff2")(h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm_final")(x)


class ConformerEncoder(nn.Module):
    """Conv2d-subsampled conformer encoder.

    Equivalent of `espnet2/asr/encoder/conformer_encoder.py:48` with
    pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
    macaron + conv modules on.
    """

    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_layers: int = 12
    kernel_size: int = 31
    dropout_rate: float = 0.1
    subsampling_factor: int = 4
    conv_norm_type: str = "layer"
    # 1-based layer indices whose outputs are also returned (InterCTC,
    # `espnet2/asr/encoder/conformer_encoder.py` interctc_layer_idx)
    capture_layers: tuple = ()
    # rematerialize each block's activations in the backward pass
    # (jax.checkpoint): trades ~30% more FLOPs in bwd for O(layers) less
    # activation HBM, unlocking larger batches at higher MFU
    remat: bool = False
    # compile the layer stack as ONE nn.scan over weight-stacked blocks
    # instead of `num_layers` unrolled copies: XLA compiles a single block
    # body (compile time drops ~linearly in depth) at identical math.
    # Param layout changes to stacked (L, ...) leaves under "layers/block",
    # so checkpoints are not interchangeable with the unrolled layout.
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True):
        x, olens = Conv2dSubsampling(
            self.d_model, self.subsampling_factor, dtype=self.dtype, name="embed"
        )(feats, lengths)
        x = x * jnp.asarray(self.d_model ** 0.5, x.dtype)
        x = FastDropout(self.dropout_rate)(x, deterministic=deterministic)
        t = x.shape[1]
        pos_emb = rel_position_encoding(t, self.d_model, self.dtype)
        pad_mask = make_valid_mask(olens, t)
        bias = attention_bias(pad_mask[:, None, None, :])
        block_cls = (nn.remat(ConformerBlock, static_argnums=(5,),
                              prevent_cse=not self.scan_layers)
                     if self.remat else ConformerBlock)
        if self.scan_layers:
            if self.capture_layers:
                raise ValueError(
                    "scan_layers is incompatible with capture_layers "
                    "(InterCTC needs per-layer outputs); use the unrolled "
                    "layout for InterCTC models"
                )

            def body(block, carry, _):
                return block(
                    carry, pos_emb, bias, pad_mask, deterministic
                ), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            block = block_cls(
                self.d_model, self.num_heads, self.d_ff, self.kernel_size,
                self.dropout_rate, self.conv_norm_type, self.dtype,
                name="block",
            )
            x, _ = scan(block, x, None)
            return x, olens
        intermediates = []
        for i in range(self.num_layers):
            x = block_cls(
                self.d_model, self.num_heads, self.d_ff, self.kernel_size,
                self.dropout_rate, self.conv_norm_type, self.dtype,
                name=f"layer{i}",
            )(x, pos_emb, bias, pad_mask, deterministic)
            if (i + 1) in self.capture_layers:
                intermediates.append((i + 1, x))
        if self.capture_layers:
            return x, olens, intermediates
        return x, olens
