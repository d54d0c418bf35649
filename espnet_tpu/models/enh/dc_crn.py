"""DC-CRN: Densely-Connected Convolutional Recurrent Network separator.

Behavioral spec: reference `espnet2/enh/separator/dc_crn_separator.py:16`
(complex masking/mapping over STFT features) built from
`espnet2/enh/layers/dc_crn.py` (GluConv2d :103, DenselyConnectedBlock :207,
GLSTM :15, DC_CRN :312 — the U-Net of densely-connected GLU conv blocks with
skip-pathway blocks and a grouped-LSTM bottleneck; Tan et al. 2021).

TPU-first notes: channels-last (B, T, F, C) layout so every conv maps to an
XLA convolution with the feature dim innermost; the exact transposed-conv
output-padding arithmetic of the reference is replaced by a static
compute-then-pad/slice to the recorded encoder freq sizes (same result,
shape-static under jit); grouped LSTMs ride `nn.RNN` scans.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class GluConv(nn.Module):
    """Conv with GLU gate (`dc_crn.py:103`)."""

    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    transpose: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = nn.ConvTranspose if self.transpose else nn.Conv
        a = conv(self.features, self.kernel, strides=self.stride,
                 padding=self.padding, dtype=self.dtype, name="conv")(x)
        g = conv(self.features, self.kernel, strides=self.stride,
                 padding=self.padding, dtype=self.dtype, name="gate")(x)
        return a * nn.sigmoid(g)


class DenselyConnectedBlock(nn.Module):
    """Dense conv block (`dc_crn.py:207`): (layers-1) x [conv(1,3) + BN +
    ELU] with dense concatenation, then a GLU conv that changes channel
    count (and optionally down/up-samples freq with stride (1,2))."""

    out_channels: int
    hid_channels: int = 8
    layers: int = 5
    last_kernel: Tuple[int, int] = (1, 4)
    last_stride: Tuple[int, int] = (1, 2)
    transpose: bool = False
    out_freq: int = 0          # transpose=True: target freq size to restore
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        outputs = [x]
        h = x
        for i in range(self.layers - 1):
            h = nn.Conv(self.hid_channels, (1, 3), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(
                jnp.concatenate(outputs, axis=-1) if i else x
            )
            h = nn.BatchNorm(use_running_average=deterministic,
                             dtype=self.dtype, name=f"bn{i}")(h)
            h = nn.elu(h)
            outputs.append(h)
        h = jnp.concatenate(outputs, axis=-1)
        if self.transpose:
            # freq-upsampling GLU deconv; restore the exact encoder freq
            # (the reference solves this with output_padding — we pad/slice)
            h = GluConv(self.out_channels, self.last_kernel,
                        stride=self.last_stride, transpose=True,
                        dtype=self.dtype, name="glu")(h)
            f = h.shape[2]
            if f > self.out_freq:
                h = h[:, :, :self.out_freq]
            elif f < self.out_freq:
                h = jnp.pad(h, ((0, 0), (0, 0), (0, self.out_freq - f),
                                (0, 0)))
            return h
        # (1,4)/(1,2) with padding (0,1): F -> floor(F/2)
        return GluConv(self.out_channels, self.last_kernel,
                       stride=self.last_stride,
                       padding=((0, 0), (1, 1)), dtype=self.dtype,
                       name="glu")(h)


class GLSTM(nn.Module):
    """Grouped LSTM bottleneck (`dc_crn.py:15`): the flattened (C*F)
    feature is chunked into groups, each driven by its own (B)LSTM; layer 0
    interleaves group outputs (stack+flatten), later layers concatenate —
    the reference's exact rearrangement — each followed by LayerNorm."""

    groups: int = 2
    layers: int = 2
    bidirectional: bool = False
    rearrange: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, T, F, C) -> same shape."""
        b, t, f, c = x.shape
        # channel-major flatten to mirror (B, C, T, D).transpose(1, 2)
        h = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        total = c * f
        assert total % self.groups == 0, (total, self.groups)
        gsize = total // self.groups

        def run_group(li, gi, xg):
            if self.bidirectional:
                half = gsize // 2
                fwd = nn.RNN(nn.OptimizedLSTMCell(half),
                             name=f"l{li}g{gi}_fwd")(xg)
                bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True,
                             keep_order=True, name=f"l{li}g{gi}_bwd")(xg)
                return jnp.concatenate([fwd, bwd], axis=-1)
            return nn.RNN(nn.OptimizedLSTMCell(gsize),
                          name=f"l{li}g{gi}")(xg)

        chunks = jnp.split(h, self.groups, axis=-1)
        outs = [run_group(0, g, chunks[g]) for g in range(self.groups)]
        # layer 0: stack(dim=-1)+flatten interleaves groups (dc_crn.py:78)
        h = jnp.stack(outs, axis=-1).reshape(b, t, total)
        h = nn.LayerNorm(dtype=self.dtype, name="ln0")(h)
        for li in range(1, self.layers):
            if self.rearrange:
                h = (h.reshape(b, t, self.groups, gsize)
                     .transpose(0, 1, 3, 2).reshape(b, t, total))
            chunks = jnp.split(h, self.groups, axis=-1)
            h = jnp.concatenate(
                [run_group(li, g, chunks[g]) for g in range(self.groups)],
                axis=-1,
            )
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln{li}")(h)
        return h.reshape(b, t, c, f).transpose(0, 1, 3, 2)


class DC_CRNSeparator(nn.Module):
    """DC-CRN complex-masking separator (`dc_crn_separator.py:16`).

    Input: STFTEncoder features (B, T, 2F) = real||imag concat.
    Output: (masked (B, num_out, T, 2F), lengths, {mask_spk<i>}).
    """

    input_dim: int                      # 2F (STFTEncoder output_dim)
    num_spk: int = 2
    predict_noise: bool = False
    input_channels: Tuple[int, ...] = (2, 16, 32, 64, 128, 256)
    enc_hid_channels: int = 8
    enc_layers: int = 5
    glstm_groups: int = 2
    glstm_layers: int = 2
    glstm_bidirectional: bool = False
    glstm_rearrange: bool = False
    mode: str = "masking"               # masking | mapping
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        assert self.mode in ("masking", "mapping"), self.mode
        f = self.input_dim // 2
        re, im = feat[..., :f], feat[..., f:]
        x = jnp.stack([re, im], axis=-1)   # (B, T, F, 2)
        num_out = self.num_spk + 1 if self.predict_noise else self.num_spk

        chans = self.input_channels
        # encoder: freq halves per block
        freqs = [f]
        enc_outs = []
        h = x
        for i in range(1, len(chans)):
            h = DenselyConnectedBlock(
                chans[i], self.enc_hid_channels, self.enc_layers,
                dtype=self.dtype, name=f"enc{i - 1}",
            )(h, deterministic)
            freqs.append(h.shape[2])
            enc_outs.append(h)

        h = GLSTM(self.glstm_groups, self.glstm_layers,
                  self.glstm_bidirectional, self.glstm_rearrange,
                  dtype=self.dtype, name="glstm")(h)

        # decoder with skip-pathway dense blocks (shape-preserving)
        for d, i in enumerate(range(len(chans) - 1, 0, -1)):
            res = DenselyConnectedBlock(
                chans[i], self.enc_hid_channels, self.enc_layers,
                last_kernel=(1, 3), last_stride=(1, 1),
                dtype=self.dtype, name=f"skip{d}",
            )(enc_outs[i - 1], deterministic)
            h = jnp.concatenate([h, res], axis=-1)
            out_ch = chans[i - 1] if i != 1 else num_out * 2
            h = DenselyConnectedBlock(
                out_ch, self.enc_hid_channels, self.enc_layers,
                transpose=True, out_freq=freqs[i - 1],
                dtype=self.dtype, name=f"dec{d}",
            )(h, deterministic)

        # (B, T, F, 2*num_out) -> real/imag halves -> per-freq Dense
        m_re = nn.Dense(f, dtype=self.dtype,
                        name="fc_real")(h[..., :num_out].transpose(0, 1, 3, 2))
        m_im = nn.Dense(f, dtype=self.dtype,
                        name="fc_imag")(h[..., num_out:].transpose(0, 1, 3, 2))
        # (B, T, num_out, F) each
        if self.mode == "masking":
            # complex multiply with the input spectrum
            out_re = m_re * re[:, :, None] - m_im * im[:, :, None]
            out_im = m_re * im[:, :, None] + m_im * re[:, :, None]
        else:  # mapping: the network output IS the separated spectrum
            out_re, out_im = m_re, m_im
        masked = jnp.concatenate([out_re, out_im],
                                 axis=-1).transpose(0, 2, 1, 3)
        # (B, num_out, T, 2F)
        others = {}
        for i in range(self.num_spk):
            others[f"mask_spk{i + 1}"] = jnp.concatenate(
                [m_re[:, :, i], m_im[:, :, i]], axis=-1
            )
        if self.predict_noise:
            others["noise1"] = masked[:, -1]
            masked = masked[:, :self.num_spk]
        return masked, lengths, others
