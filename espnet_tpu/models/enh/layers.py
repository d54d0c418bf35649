"""Enhancement building blocks: signal encoders/decoders and separator nets.

Behavioral spec: reference `espnet2/enh/encoder/conv_encoder.py` /
`decoder/conv_decoder.py` (TasNet learned filterbank),
`encoder/stft_encoder.py` / `decoder/stft_decoder.py`,
`espnet2/enh/layers/tcn.py` (Conv-TasNet TemporalConvNet: stacked dilated
depthwise conv blocks with gLN/cLN and skip connections) and
`espnet2/enh/layers/dprnn.py` (dual-path RNN: intra-/inter-chunk RNNs).

TPU notes: all convs are `lax.conv_general_dilated` through flax (NWC
layout); gLN/cLN are masked-moment normalisations; DPRNN's segmentation is
a static reshape so both paths run as big batched matmul/RNN programs.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GlobalLayerNorm(nn.Module):
    """gLN: normalise over (time, channels) jointly (`layers/tcn.py`)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, T, N)
        g = self.param("gamma", nn.initializers.ones, (self.dim,))
        b = self.param("beta", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + 1e-8) * g + b


class ChannelwiseLayerNorm(nn.Module):
    """cLN: per-frame channel normalisation (causal-safe)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, N)
        g = self.param("gamma", nn.initializers.ones, (self.dim,))
        b = self.param("beta", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + 1e-8) * g + b


def _norm(norm_type: str, dim: int, name: str):
    if norm_type == "gLN":
        return GlobalLayerNorm(dim, name=name)
    return ChannelwiseLayerNorm(dim, name=name)


class ConvEncoder(nn.Module):
    """Learned analysis filterbank: Conv1d(1->N, kernel, stride) + ReLU
    (`enh/encoder/conv_encoder.py`)."""

    channels: int = 256
    kernel_size: int = 20
    stride: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray, lengths: jnp.ndarray):
        # wav (B, n) -> (B, T, N)
        x = wav[:, :, None]
        feat = nn.Conv(
            self.channels, (self.kernel_size,), strides=(self.stride,),
            padding="VALID", use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        feat = nn.relu(feat)
        flens = (lengths - self.kernel_size) // self.stride + 1
        return feat, flens


class ConvDecoder(nn.Module):
    """Synthesis filterbank: ConvTranspose(N->1) (`enh/decoder/conv_decoder.py`)."""

    channels: int = 256
    kernel_size: int = 20
    stride: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, n_samples: int):
        # feat (B, T, N) -> wav (B, n_samples)
        wav = nn.ConvTranspose(
            1, (self.kernel_size,), strides=(self.stride,), padding="VALID",
            use_bias=False, dtype=self.dtype, name="deconv",
        )(feat)[..., 0]
        t = wav.shape[1]
        if t >= n_samples:
            return wav[:, :n_samples]
        return jnp.pad(wav, ((0, 0), (0, n_samples - t)))


class STFTEncoder(nn.Module):
    """STFT magnitude+phase encoder (`enh/encoder/stft_encoder.py`)."""

    n_fft: int = 512
    hop_length: int = 128
    dtype: Any = jnp.float32

    def __call__(self, wav, lengths):
        from espnet_tpu.ops.stft import stft, stft_frames_lengths

        real, imag = stft(wav, self.n_fft, self.hop_length)
        flens = stft_frames_lengths(lengths, self.n_fft, self.hop_length)
        return jnp.concatenate([real, imag], axis=-1), flens  # (B, T, 2F)

    @property
    def output_dim(self):
        return 2 * (self.n_fft // 2 + 1)


class STFTDecoder(nn.Module):
    """iSTFT decoder (`enh/decoder/stft_decoder.py`)."""

    n_fft: int = 512
    hop_length: int = 128
    dtype: Any = jnp.float32

    def __call__(self, feat, n_samples: int):
        from espnet_tpu.ops.stft import istft

        f = feat.shape[-1] // 2
        wav = istft(feat[..., :f], feat[..., f:], self.n_fft, self.hop_length)
        t = wav.shape[1]
        if t >= n_samples:
            return wav[:, :n_samples]
        return jnp.pad(wav, ((0, 0), (0, n_samples - t)))


class TCNBlock(nn.Module):
    """One dilated conv block: 1x1 -> PReLU -> norm -> depthwise(dilated)
    -> PReLU -> norm -> {residual 1x1, skip 1x1} (`layers/tcn.py`
    TemporalBlock + DepthwiseSeparableConv)."""

    bottleneck: int
    hidden: int
    kernel: int
    dilation: int
    norm_type: str = "gLN"
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, B_dim)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="conv1x1")(x)
        h = nn.PReLU()(h)
        h = _norm(self.norm_type, self.hidden, "norm1")(h)
        pad = (self.kernel - 1) * self.dilation
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad - pad // 2)]
        h = nn.Conv(
            self.hidden, (self.kernel,), padding=padding,
            kernel_dilation=(self.dilation,),
            feature_group_count=self.hidden, dtype=self.dtype,
            name="dconv",
        )(h)
        h = nn.PReLU()(h)
        h = _norm(self.norm_type, self.hidden, "norm2")(h)
        res = nn.Dense(self.bottleneck, dtype=self.dtype, name="res_out")(h)
        skip = nn.Dense(self.bottleneck, dtype=self.dtype, name="skip_out")(h)
        return x + res, skip


class TemporalConvNet(nn.Module):
    """Conv-TasNet mask network (`layers/tcn.py` TemporalConvNet)."""

    input_dim: int
    num_outputs: int          # num_spk (masks)
    layers: int = 8
    stacks: int = 3
    bottleneck: int = 128
    hidden: int = 512
    kernel: int = 3
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):  # (B, T, N) -> masks (B, num_outputs, T, N)
        x = ChannelwiseLayerNorm(self.input_dim, name="ln")(feat)
        x = nn.Dense(self.bottleneck, dtype=self.dtype, name="bottleneck")(x)
        skip_sum = 0.0
        for s in range(self.stacks):
            for l in range(self.layers):
                x, skip = TCNBlock(
                    self.bottleneck, self.hidden, self.kernel, 2 ** l,
                    self.norm_type, self.causal, self.dtype,
                    name=f"stack{s}_layer{l}",
                )(x)
                skip_sum = skip_sum + skip
        h = nn.PReLU()(skip_sum)
        h = nn.Dense(self.num_outputs * self.input_dim, dtype=self.dtype,
                     name="mask_out")(h)
        b, t, _ = h.shape
        masks = h.reshape(b, t, self.num_outputs, self.input_dim)
        masks = masks.transpose(0, 2, 1, 3)  # (B, C, T, N)
        if self.mask_nonlinear == "relu":
            return nn.relu(masks)
        if self.mask_nonlinear == "sigmoid":
            return nn.sigmoid(masks)
        if self.mask_nonlinear == "tanh":
            return nn.tanh(masks)
        return nn.softmax(masks, axis=1)


class DPRNNBlock(nn.Module):
    """Intra-chunk BiLSTM + inter-chunk (Bi)LSTM, each with projection +
    LayerNorm and residual (`layers/dprnn.py` DPRNN)."""

    feature_dim: int
    hidden: int
    causal_inter: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, n_chunks, K, N)
        b, s, k, n = x.shape
        # intra-chunk: bidirectional over K
        h = x.reshape(b * s, k, n)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="intra_fwd")(h)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="intra_bwd")(h)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        h = nn.Dense(n, dtype=self.dtype, name="intra_proj")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="intra_norm")(h)
        x = x + h.reshape(b, s, k, n)
        # inter-chunk: over chunk axis
        h = x.transpose(0, 2, 1, 3).reshape(b * k, s, n)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="inter_fwd")(h)
        if self.causal_inter:
            h2 = fwd
            h2 = nn.Dense(n, dtype=self.dtype, name="inter_proj")(h2)
        else:
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                         keep_order=True, name="inter_bwd")(h)
            h2 = jnp.concatenate([fwd, bwd], axis=-1)
            h2 = nn.Dense(n, dtype=self.dtype, name="inter_proj")(h2)
        h2 = nn.LayerNorm(dtype=self.dtype, name="inter_norm")(h2)
        h2 = h2.reshape(b, k, s, n).transpose(0, 2, 1, 3)
        return x + h2


def segment_sequence(x: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    """(B, T, N) -> (B, n_chunks, chunk, N) with 50% overlap, zero-padded."""
    b, t, n = x.shape
    hop = chunk // 2
    n_chunks = max(1, int(np.ceil(max(t - chunk, 0) / hop)) + 1)
    need = (n_chunks - 1) * hop + chunk
    xp = jnp.pad(x, ((0, 0), (0, need - t), (0, 0)))
    idx = (np.arange(n_chunks) * hop)[:, None] + np.arange(chunk)[None, :]
    return xp[:, idx], t


def merge_segments(seg: jnp.ndarray, t: int) -> jnp.ndarray:
    """Inverse of segment_sequence: overlap-add with 50% overlap."""
    b, s, k, n = seg.shape
    hop = k // 2
    need = (s - 1) * hop + k
    out = jnp.zeros((b, need, n), seg.dtype)
    wsum = jnp.zeros((1, need, 1), seg.dtype)
    idx = (np.arange(s) * hop)[:, None] + np.arange(k)[None, :]
    out = out.at[:, idx.reshape(-1)].add(seg.reshape(b, s * k, n))
    wsum = wsum.at[:, idx.reshape(-1)].add(
        jnp.ones((1, s * k, 1), seg.dtype)
    )
    return (out / jnp.maximum(wsum, 1.0))[:, :t]
