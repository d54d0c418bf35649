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
import jax
import jax.numpy as jnp

from espnet_tpu.models.attention import RelPositionMultiHeadAttention
from espnet_tpu.models.embedding import rel_position_encoding
from espnet_tpu.models.subsampling import Conv2dSubsampling
from espnet_tpu.models.transformer import (
    PositionwiseFeedForward, _dropout_seeds, _ffn_tileable, _FFNParams,
    _LNParams)
from espnet_tpu.ops.dropout import FastDropout
from espnet_tpu.ops.masks import attention_bias, make_valid_mask


class _ConvDense(nn.Module):
    """nn.Dense-compatible holder."""

    d_in: int
    d_out: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.d_in, self.d_out), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.d_out,), jnp.float32)


class _DepthwiseConvParams(nn.Module):
    """nn.Conv(feature_group_count=d)-compatible holder ((k,1,d) kernel)."""

    k: int
    d: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.k, 1, self.d), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.d,), jnp.float32)


class _ConvModuleParams(nn.Module):
    """ConvolutionModule-compatible parameter tree for the fused kernel."""

    d: int
    k: int

    def setup(self):
        self.pointwise_conv1 = _ConvDense(self.d, 2 * self.d)
        self.depthwise_conv = _DepthwiseConvParams(self.k, self.d)
        self.norm = _LNParams(self.d)
        self.pointwise_conv2 = _ConvDense(self.d, self.d)


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
    # Opt-in: fuse the whole pre-LN conv sub-block into one Pallas kernel
    # (ops/pallas_conv_module.py). Parity-verified and 2.3 ms faster in
    # ISOLATION (10.35 vs 12.65 ms for the 12-layer chain on v5e), but in
    # the full train step XLA's formulation overlaps this memory-bound
    # chain with its neighbours better than an opaque custom call can
    # (measured step 76.4 vs 74.6 ms), so the default stays False.
    fused_conv: Optional[bool] = None
    # None = auto: the conv module's two matmul-anchored ENDS run as Pallas
    # kernels (LN+pw1+GLU head, LN+swish+pw2+drop+residual tail) with the
    # memory-bound depthwise conv left to XLA between them — the round-5
    # middle road after the whole-module kernel (fused_conv) lost
    # in-context (ops/pallas_conv_glu.py).
    fused_conv_split: Optional[bool] = None
    # None = auto: macaron FFN sub-blocks (LN + FFN + dropouts + 0.5
    # residual) run as single Pallas kernels on TPU (fused_prenorm_ffn).
    fused_ffn: Optional[bool] = None

    @nn.compact
    def __call__(self, x, pos_emb, bias, pad_mask, deterministic: bool = True):
        drop = FastDropout(self.dropout_rate)
        fused_ffn = self.fused_ffn
        if fused_ffn is None:
            from espnet_tpu.models.transformer import _fused_auto

            fused_ffn = _fused_auto(x)
        fused_ffn = fused_ffn and _ffn_tileable(x, self.d_model, self.d_ff,
                                                256)

        def macaron(x, ln_name, ffn_name):
            """x + 0.5*drop(FFN(LN(x))) — one Pallas kernel on TPU."""
            if fused_ffn:
                from espnet_tpu.ops.pallas_ffn import fused_prenorm_ffn

                ln = _LNParams(self.d_model, name=ln_name)
                fp = _FFNParams(self.d_model, self.d_ff, name=ffn_name)
                rate = self.dropout_rate if not deterministic else 0.0
                seeds = _dropout_seeds(self, 2) if rate > 0.0 else None
                return fused_prenorm_ffn(
                    x.astype(self.dtype), ln.scale, ln.bias,
                    fp.w1.kernel.astype(self.dtype), fp.w1.bias,
                    fp.w2.kernel.astype(self.dtype), fp.w2.bias,
                    seeds, drop_rate=rate, activation="swish",
                    residual_scale=0.5)
            h = nn.LayerNorm(dtype=self.dtype, name=ln_name)(x)
            h = PositionwiseFeedForward(
                self.d_model, self.d_ff, self.dropout_rate,
                activation="swish", dtype=self.dtype, name=ffn_name,
            )(h, deterministic)
            return x + 0.5 * drop(h, deterministic=deterministic)

        # Macaron FF 1 (scaled 1/2)
        x = macaron(x, "norm_ff1", "ff1")
        # Self-attention (rel pos)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_attn")(x)
        h = RelPositionMultiHeadAttention(self.num_heads, self.d_model,
                                          self.dtype, name="self_attn")(
            h, pos_emb, bias)
        x = x + drop(h, deterministic=deterministic)
        # Conv module (pre-LN + module + dropout + residual)
        fused_conv = bool(self.fused_conv)
        # MEASURED on v5e (round 5): the split fusion loses ~1.1 ms/step
        # in-context at b32 (train step 73.3 vs 72.2 ms; encoder fwd 23.2
        # vs 21.6) — XLA fuses the GLU/LN chains into the pointwise
        # matmuls and overlaps the module better than the two opaque
        # custom calls allow, the same verdict as the r4 whole-module
        # kernel. Default OFF; ESPNET_TPU_CONV_SPLIT=1 re-enables for A/B.
        fused_split = self.fused_conv_split
        if fused_split is None:
            import os

            fused_split = (jax.default_backend() == "tpu"
                           and os.environ.get("ESPNET_TPU_CONV_SPLIT",
                                              "0") == "1")
        fused_split = (fused_split and not fused_conv
                       and self.conv_norm_type == "layer"
                       and _ffn_tileable(x, self.d_model, self.d_model, 256))
        if fused_split:
            from espnet_tpu.ops.pallas_conv_glu import (
                fused_postnorm_proj, fused_prenorm_glu)

            ln = _LNParams(self.d_model, name="norm_conv")
            cp = _ConvModuleParams(self.d_model, self.kernel_size,
                                   name="conv")
            rate = self.dropout_rate if not deterministic else 0.0
            seed = _dropout_seeds(self, 1) if rate > 0.0 else None
            g = fused_prenorm_glu(
                x.astype(self.dtype), ln.scale, ln.bias,
                cp.pointwise_conv1.kernel.astype(self.dtype),
                cp.pointwise_conv1.bias)
            g = g * pad_mask[:, :, None].astype(g.dtype)
            g = jax.lax.conv_general_dilated(
                g, cp.depthwise_conv.kernel.astype(g.dtype),
                window_strides=(1,), padding="SAME",
                feature_group_count=self.d_model,
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + cp.depthwise_conv.bias.astype(g.dtype)
            x = fused_postnorm_proj(
                g, x.astype(self.dtype), cp.norm.scale, cp.norm.bias,
                cp.pointwise_conv2.kernel.astype(self.dtype),
                cp.pointwise_conv2.bias, seed, drop_rate=rate)
        elif fused_conv and self.conv_norm_type == "layer":
            from espnet_tpu.ops.pallas_conv_module import fused_conv_module

            ln = _LNParams(self.d_model, name="norm_conv")
            cp = _ConvModuleParams(self.d_model, self.kernel_size,
                                   name="conv")
            seed = None
            rate = self.dropout_rate if not deterministic else 0.0
            if rate > 0.0:
                rng = self.make_rng("dropout")
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)
            x = fused_conv_module(
                x.astype(self.dtype), pad_mask,
                ln.scale, ln.bias,
                cp.pointwise_conv1.kernel.astype(self.dtype),
                cp.pointwise_conv1.bias,
                cp.depthwise_conv.kernel[:, 0, :].astype(self.dtype),
                cp.depthwise_conv.bias,
                cp.norm.scale, cp.norm.bias,
                cp.pointwise_conv2.kernel.astype(self.dtype),
                cp.pointwise_conv2.bias,
                seed, drop_rate=rate, kernel_size=self.kernel_size,
            )
        else:
            h = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
            h = ConvolutionModule(self.d_model, self.kernel_size,
                                  self.conv_norm_type, self.dtype,
                                  name="conv")(h, pad_mask, deterministic)
            x = x + drop(h, deterministic=deterministic)
        # Macaron FF 2 (scaled 1/2)
        x = macaron(x, "norm_ff2", "ff2")
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
