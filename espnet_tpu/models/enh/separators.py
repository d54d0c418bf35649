"""Separators: encoded mixture -> per-speaker masked features.

Behavioral spec: reference `espnet2/enh/separator/tcn_separator.py:15`
(TCN/Conv-TasNet), `dprnn_separator.py:15` (dual-path RNN),
`transformer_separator.py` (transformer encoder over frames). Each returns
(masked feature per speaker, lengths, {mask_spk<i>}).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
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


class _ImprovedTransformerLayer(nn.Module):
    """DPTNet "improved transformer": MHA + RNN-based position-wise FF
    (`espnet2/enh/layers/dptnet.py` ImprovedTransformerLayer)."""

    d_model: int
    num_heads: int
    hidden: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (B*, T, N)
        from espnet_tpu.models.attention import MultiHeadAttention

        drop = nn.Dropout(self.dropout_rate)
        h = MultiHeadAttention(self.num_heads, self.d_model, self.dtype,
                               name="self_attn")(x, x, x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm_attn")(
            x + drop(h, deterministic=deterministic)
        )
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="ff_fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="ff_bwd")(x)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ff_proj")(
            nn.relu(h)
        )
        return nn.LayerNorm(dtype=self.dtype, name="norm_ff")(
            x + drop(h, deterministic=deterministic)
        )


class DPTNetSeparator(nn.Module):
    """Dual-path transformer separator
    (`espnet2/enh/separator/dptnet_separator.py:19`): segment into
    half-overlapping chunks, alternate intra-chunk and inter-chunk improved
    transformer layers, mask head per speaker."""

    input_dim: int
    num_spk: int = 2
    num_blocks: int = 4
    d_model: int = 0          # 0 => input_dim
    num_heads: int = 4
    hidden: int = 128
    chunk_size: int = 100
    nonlinear: str = "relu"
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        b, t, n = feat.shape
        seg, t_orig = segment_sequence(feat, self.chunk_size)
        s, k = seg.shape[1], seg.shape[2]
        d = self.d_model or n
        if d != n:
            seg = nn.Dense(d, dtype=self.dtype, name="in_proj")(seg)
        for i in range(self.num_blocks):
            h = seg.reshape(b * s, k, d)
            h = _ImprovedTransformerLayer(
                d, self.num_heads, self.hidden, self.dropout_rate,
                self.dtype, name=f"intra{i}",
            )(h, deterministic)
            seg = h.reshape(b, s, k, d)
            h = seg.transpose(0, 2, 1, 3).reshape(b * k, s, d)
            h = _ImprovedTransformerLayer(
                d, self.num_heads, self.hidden, self.dropout_rate,
                self.dtype, name=f"inter{i}",
            )(h, deterministic)
            seg = h.reshape(b, k, s, d).transpose(0, 2, 1, 3)
        h = nn.Dense(self.num_spk * n, dtype=self.dtype, name="mask_out")(
            nn.swish(seg)
        )
        h = h.reshape(b, s, k, self.num_spk, n)
        h = h.transpose(0, 3, 1, 2, 4).reshape(b * self.num_spk, s, k, n)
        masks = merge_segments(h, t_orig).reshape(b, self.num_spk, t, n)
        masks = _mask_nonlinear(masks, self.nonlinear)
        masked = masks * feat[:, None]
        others = {
            f"mask_spk{i + 1}": masks[:, i] for i in range(self.num_spk)
        }
        return masked, lengths, others


class _SegLSTM(nn.Module):
    """Per-segment (Bi)LSTM with external initial states, projection +
    LayerNorm + residual (`espnet2/enh/layers/skim.py` SegLSTM)."""

    input_dim: int
    hidden: int
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, carry_fwd):  # x: (BS, K, N); carry=(c,h) (BS,H)
        carry_out, fwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden), return_carry=True,
            name="lstm_fwd",
        )(x, initial_carry=carry_fwd)
        if self.bidirectional:
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                         keep_order=True, name="lstm_bwd")(x)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            h = fwd
        h = nn.Dense(self.input_dim, dtype=self.dtype, name="proj")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        return x + h, carry_out


class _MemLSTM(nn.Module):
    """Memory LSTM over the segment axis: turns per-segment final (c, h)
    states into initial states for the next SegLSTM layer
    (`espnet2/enh/layers/skim.py` MemLSTM, mem_type="hc")."""

    hidden: int
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c, h):  # (B, S, H) each
        def _run(x, name):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden),
                         name=f"{name}_fwd")(x)
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                             keep_order=True, name=f"{name}_bwd")(x)
                y = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                y = fwd
            y = nn.Dense(self.hidden, dtype=self.dtype, name=f"{name}_proj")(y)
            return nn.LayerNorm(dtype=self.dtype, name=f"{name}_norm")(x + y)

        return _run(c, "c"), _run(h, "h")


class SkiMSeparator(nn.Module):
    """Skipping-Memory LSTM separator
    (`espnet2/enh/separator/skim_separator.py:17`): non-overlapping
    segments, SegLSTM within each segment, MemLSTM carrying states across
    segments between layers."""

    input_dim: int
    num_spk: int = 2
    num_blocks: int = 4
    hidden: int = 128
    segment_size: int = 20
    bidirectional: bool = True
    mem_type: str = "hc"       # hc | id
    nonlinear: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        b, t, n = feat.shape
        k = self.segment_size
        s = -(-t // k)
        xp = jnp.pad(feat, ((0, 0), (0, s * k - t), (0, 0)))
        seg = xp.reshape(b, s, k, n)
        h_dim = self.hidden
        c0 = jnp.zeros((b * s, h_dim), self.dtype)
        h0 = jnp.zeros((b * s, h_dim), self.dtype)
        for i in range(self.num_blocks):
            x = seg.reshape(b * s, k, n)
            x, (c_out, h_out) = _SegLSTM(
                n, h_dim, self.bidirectional, self.dtype, name=f"seg{i}",
            )(x, (c0, h0))
            seg = x.reshape(b, s, k, n)
            if i < self.num_blocks - 1:
                if self.mem_type == "hc":
                    c_seq = c_out.reshape(b, s, h_dim)
                    h_seq = h_out.reshape(b, s, h_dim)
                    c_seq, h_seq = _MemLSTM(
                        h_dim, self.bidirectional, self.dtype,
                        name=f"mem{i}",
                    )(c_seq, h_seq)
                    c0 = c_seq.reshape(b * s, h_dim)
                    h0 = h_seq.reshape(b * s, h_dim)
                else:  # "id": carry the states through unchanged
                    c0, h0 = c_out, h_out
        h = nn.Dense(self.num_spk * n, dtype=self.dtype, name="mask_out")(
            seg.reshape(b, s * k, n)[:, :t]
        )
        masks = h.reshape(b, t, self.num_spk, n).transpose(0, 2, 1, 3)
        masks = _mask_nonlinear(masks, self.nonlinear)
        masked = masks * feat[:, None]
        others = {
            f"mask_spk{i + 1}": masks[:, i] for i in range(self.num_spk)
        }
        return masked, lengths, others


class ConformerSeparator(nn.Module):
    """Conformer-encoder separator
    (`espnet2/enh/separator/conformer_separator.py:22`)."""

    input_dim: int
    num_spk: int = 2
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    num_layers: int = 4
    kernel_size: int = 15
    dropout_rate: float = 0.1
    nonlinear: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        from espnet_tpu.models.conformer import ConformerBlock
        from espnet_tpu.models.embedding import rel_position_encoding
        from espnet_tpu.ops.masks import attention_bias, make_valid_mask

        b, t, n = feat.shape
        x = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")(feat)
        pos_emb = rel_position_encoding(t, self.d_model, self.dtype)
        pad_mask = make_valid_mask(lengths, t)
        bias = attention_bias(pad_mask[:, None, None, :])
        for i in range(self.num_layers):
            x = ConformerBlock(
                self.d_model, self.num_heads, self.d_ff, self.kernel_size,
                self.dropout_rate, "layer", self.dtype, name=f"layer{i}",
            )(x, pos_emb, bias, pad_mask, deterministic)
        h = nn.Dense(self.num_spk * n, dtype=self.dtype, name="mask_out")(x)
        masks = h.reshape(b, t, self.num_spk, n).transpose(0, 2, 1, 3)
        masks = _mask_nonlinear(masks, self.nonlinear)
        masked = masks * feat[:, None]
        others = {
            f"mask_spk{i + 1}": masks[:, i] for i in range(self.num_spk)
        }
        return masked, lengths, others


def _mask_nonlinear(masks: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "relu":
        return nn.relu(masks)
    if kind == "sigmoid":
        return nn.sigmoid(masks)
    if kind == "softmax":
        return nn.softmax(masks, axis=1)
    return nn.tanh(masks)


class RNNSeparator(nn.Module):
    """Classic BLSTM mask estimator (`espnet2/enh/separator/rnn_separator.py`):
    stacked (bi)LSTM over the feature sequence -> per-speaker sigmoid masks
    applied to the input feature."""

    input_dim: int
    num_spk: int = 2
    layers: int = 3
    hidden: int = 512
    bidirectional: bool = True
    nonlinear: str = "sigmoid"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        x = feat  # (B, T, N)
        for i in range(self.layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         name=f"lstm{i}_f")(x)
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                    name=f"lstm{i}_b", reverse=True, keep_order=True,
                )(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        act = {"sigmoid": nn.sigmoid, "relu": nn.relu,
               "tanh": nn.tanh}[self.nonlinear]
        masks = act(
            nn.Dense(self.num_spk * self.input_dim, dtype=self.dtype,
                     name="mask_proj")(x)
        ).reshape(feat.shape[0], feat.shape[1], self.num_spk, self.input_dim)
        masks = masks.transpose(0, 2, 1, 3)  # (B, C, T, N)
        masked = masks * feat[:, None]
        others = {f"mask_spk{i + 1}": masks[:, i]
                  for i in range(self.num_spk)}
        return masked, lengths, others


class DANSeparator(nn.Module):
    """Deep-attractor network (`espnet2/enh/separator/dan_separator.py`,
    Chen et al. 2017): BLSTM -> TF embeddings; attractors are the
    oracle-mask-weighted embedding means at train time and are estimated
    by the same means over estimated masks at inference; masks come from
    softmax over embedding-attractor similarities.

    Training callers pass `oracle_masks` (B, T, F, n_spk); without them the
    separator bootstraps attractors from a first-pass softmax over a
    learned codebook (k-means-free inference approximation).
    """

    input_dim: int
    num_spk: int = 2
    layers: int = 2
    hidden: int = 256
    emb_dim: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True,
                 oracle_masks=None):
        b, t, f = feat.shape
        x = feat
        for i in range(self.layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         name=f"lstm{i}_f")(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         name=f"lstm{i}_b", reverse=True, keep_order=True)(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        emb = nn.tanh(
            nn.Dense(f * self.emb_dim, dtype=self.dtype, name="emb_proj")(x)
        ).reshape(b, t * f, self.emb_dim)  # (B, TF, D)
        if oracle_masks is not None:
            w = oracle_masks.reshape(b, t * f, self.num_spk)
        else:
            codebook = self.param(
                "attractor_init", nn.initializers.normal(1.0),
                (self.num_spk, self.emb_dim),
            )
            sim0 = jnp.einsum("bnd,sd->bns", emb, codebook.astype(emb.dtype))
            w = jax.nn.softmax(sim0, axis=-1)
        denom = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-6)
        attractors = jnp.einsum("bns,bnd->bsd", w / denom, emb)  # (B, S, D)
        sim = jnp.einsum("bnd,bsd->bns", emb, attractors)
        masks = jax.nn.softmax(sim, axis=-1).reshape(b, t, f, self.num_spk)
        masks = masks.transpose(0, 3, 1, 2)  # (B, C, T, F)
        masked = masks * feat[:, None]
        others = {f"mask_spk{i + 1}": masks[:, i]
                  for i in range(self.num_spk)}
        others["embedding"] = emb
        return masked, lengths, others
