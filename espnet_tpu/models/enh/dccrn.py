"""DCCRN: Deep Complex Convolution Recurrent Network separator.

Behavioral spec: reference `espnet2/enh/separator/dccrn_separator.py:23`
(DCCRNSeparator — distinct from the densely-connected DC-CRN of
`dc_crn_separator.py`) built from `espnet2/enh/layers/complexnn.py`
(ComplexConv2d :81, ComplexConvTranspose2d :170, NavieComplexLSTM :6):
a complex-valued conv U-Net over the (freq, time) plane — freq stride 2,
causal time kernel 2 — with a complex-LSTM bottleneck and complex masks
applied in E (polar), C (complex product) or R (real) mode.

TPU-first notes: complex tensors are carried as (real, imag) pairs so every
op is real bf16/f32 math XLA can fuse — no complex dtype in the hot path;
layout is channels-last (B, T, F, C) so each complex conv lowers to four
MXU convolutions with shared weights; the encoder freq sizes are recorded
and the transposed-conv outputs are sliced/padded back to them (same result
as torch output_padding arithmetic, static under jit). The reference's
`apply_masks` loop reuses the masked spectrum as the input of the next
speaker's mask (an upstream artifact, immaterial for its num_spk=1
default); here every mask is applied to the original mixture.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

EPS = 1.1920929e-07  # float32 eps, matching the reference's torch EPS role


class ComplexConv(nn.Module):
    """Complex 2D conv on (real, imag) pairs, spatial dims (T, F).

    Mirror of `complexnn.py:81` ComplexConv2d with causal time padding:
    kernel (2, 5), stride (1, freq_stride), pad time (1, 0), freq (2, 2).
    """

    features: int  # complex output channels
    kernel: Tuple[int, int] = (2, 5)
    freq_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, re, im):
        kt, kf = self.kernel
        pad = ((kt - 1, 0), (kf // 2, kf // 2))  # causal time, centred freq
        conv_r = nn.Conv(self.features, self.kernel, (1, self.freq_stride),
                         padding=pad, dtype=self.dtype, name="conv_r")
        conv_i = nn.Conv(self.features, self.kernel, (1, self.freq_stride),
                         padding=pad, dtype=self.dtype, name="conv_i")
        return (conv_r(re) - conv_i(im), conv_i(re) + conv_r(im))


class ComplexConvTranspose(nn.Module):
    """Complex transposed 2D conv (freq upsample x2), spatial dims (T, F).

    Mirror of `complexnn.py:170` ComplexConvTranspose2d(kernel (5, 2),
    stride (2, 1), padding (2, 0), output_padding (1, 0)) followed by the
    decoder's first-frame crop (`dccrn_separator.py:246` `out[..., 1:]`):
    freq (F -> 2F), time (T -> T).
    """

    features: int
    kernel: Tuple[int, int] = (2, 5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, re, im):
        kt, kf = self.kernel
        cin = re.shape[-1]
        wr = self.param("kernel_r", nn.initializers.normal(0.05),
                        (kt, kf, cin, self.features), self.dtype)
        wi = self.param("kernel_i", nn.initializers.normal(0.05),
                        (kt, kf, cin, self.features), self.dtype)
        br = self.param("bias_r", nn.initializers.zeros,
                        (self.features,), self.dtype)
        bi = self.param("bias_i", nn.initializers.zeros,
                        (self.features,), self.dtype)

        def deconv(x, w):
            # torch ConvTranspose2d(stride s, padding p, output_padding op)
            # == conv over the s-dilated input with pads (k-1-p, k-1-p+op):
            # time: k=2, p=0, op=0 -> (1, 1); freq: k=5, p=2, op=1 -> (2, 3)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), w,
                window_strides=(1, 1),
                padding=((kt - 1, kt - 1), (kf // 2, kf // 2 + 1)),
                lhs_dilation=(1, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        r = deconv(re, wr) - deconv(im, wi) + br
        i = deconv(re, wi) + deconv(im, wr) + bi
        # crop the extra leading frame the (k_t - 1)-padded deconv produces
        return r[:, 1:], i[:, 1:]


class ComplexLSTM(nn.Module):
    """NavieComplexLSTM (`complexnn.py:6`): shared real/imag LSTMs combined
    with the complex product rule; optional per-part projection."""

    units: int  # per-part hidden size (reference rnn_units // 2)
    projection: int = 0  # per-part output dim (0 = no projection)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, re, im):
        lstm_r = nn.RNN(nn.OptimizedLSTMCell(self.units, dtype=self.dtype),
                        name="lstm_r")
        lstm_i = nn.RNN(nn.OptimizedLSTMCell(self.units, dtype=self.dtype),
                        name="lstm_i")
        r2r, r2i = lstm_r(re), lstm_i(re)
        i2r, i2i = lstm_r(im), lstm_i(im)
        out_r = r2r - i2i
        out_i = i2r + r2i
        if self.projection:
            out_r = nn.Dense(self.projection, dtype=self.dtype,
                             name="r_trans")(out_r)
            out_i = nn.Dense(self.projection, dtype=self.dtype,
                             name="i_trans")(out_i)
        return out_r, out_i


class DCCRNSeparator(nn.Module):
    """DCCRN complex U-Net separator (`dccrn_separator.py:23`).

    Input: STFTEncoder features (B, T, 2F) = real||imag concat.
    Output: (masked (B, num_out, T, 2F), lengths, {mask_spk<i>}).
    """

    input_dim: int                      # 2F (STFTEncoder output_dim)
    num_spk: int = 1
    rnn_layer: int = 2
    rnn_units: int = 256                # total (real+imag) LSTM width
    masking_mode: str = "E"             # E (polar) | C (complex) | R (real)
    kernel_num: Tuple[int, ...] = (32, 64, 128, 256, 256, 256)  # total chans
    use_noise_mask: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True):
        if self.masking_mode not in ("E", "C", "R"):
            raise ValueError(f"unsupported masking mode {self.masking_mode}")
        f = self.input_dim // 2
        mix_re, mix_im = feat[..., :f], feat[..., f:]
        # drop the DC bin (reference `cspecs[:, :, 1:]`), channels-last
        re = mix_re[..., 1:, None]
        im = mix_im[..., 1:, None]
        num_out = self.num_spk + 1 if self.use_noise_mask else self.num_spk
        cchans = [k // 2 for k in self.kernel_num]  # complex channels

        # ---- encoder ----
        skips = []
        freqs = []
        for li, ch in enumerate(cchans):
            freqs.append(re.shape[2])
            re, im = ComplexConv(ch, dtype=self.dtype,
                                 name=f"enc{li}")(re, im)
            # real BatchNorm over the stacked real||imag channels
            # (reference default use_cbn=False: one BatchNorm2d over 2C)
            both = jnp.concatenate([re, im], axis=-1)
            both = nn.BatchNorm(use_running_average=deterministic,
                                dtype=self.dtype, name=f"bn{li}")(both)
            both = nn.PReLU(name=f"prelu{li}")(both)
            re, im = both[..., :ch], both[..., ch:]
            skips.append((re, im))

        # ---- complex LSTM bottleneck over time ----
        b, t, fz, cz = re.shape
        rr = re.reshape(b, t, fz * cz)
        ii = im.reshape(b, t, fz * cz)
        for li in range(self.rnn_layer):
            proj = fz * cz if li == self.rnn_layer - 1 else 0
            rr, ii = ComplexLSTM(self.rnn_units // 2, proj, self.dtype,
                                 name=f"clstm{li}")(rr, ii)
        re = rr.reshape(b, t, fz, cz)
        im = ii.reshape(b, t, fz, cz)

        # ---- decoder with complex-cat skip connections ----
        n_layers = len(cchans)
        for di in range(n_layers):
            sk_re, sk_im = skips[n_layers - 1 - di]
            re = jnp.concatenate([re, sk_re], axis=-1)
            im = jnp.concatenate([im, sk_im], axis=-1)
            last = di == n_layers - 1
            out_ch = num_out if last else cchans[n_layers - 2 - di]
            re, im = ComplexConvTranspose(out_ch, dtype=self.dtype,
                                          name=f"dec{di}")(re, im)
            # restore the exact encoder freq size (torch output_padding math)
            tgt = freqs[n_layers - 1 - di]
            if re.shape[2] > tgt:
                re, im = re[:, :, :tgt], im[:, :, :tgt]
            elif re.shape[2] < tgt:
                pad = ((0, 0), (0, 0), (0, tgt - re.shape[2]), (0, 0))
                re, im = jnp.pad(re, pad), jnp.pad(im, pad)
            if not last:
                ch = out_ch
                both = jnp.concatenate([re, im], axis=-1)
                both = nn.BatchNorm(use_running_average=deterministic,
                                    dtype=self.dtype, name=f"dec_bn{di}")(both)
                both = nn.PReLU(name=f"dec_prelu{di}")(both)
                re, im = both[..., :ch], both[..., ch:]

        # masks: (B, T, F-1, num_out) -> pad the DC bin back with zeros
        mask_re = jnp.pad(re, ((0, 0), (0, 0), (1, 0), (0, 0)))
        mask_im = jnp.pad(im, ((0, 0), (0, 0), (1, 0), (0, 0)))
        mask_re = mask_re.transpose(0, 3, 1, 2)  # (B, num_out, T, F)
        mask_im = mask_im.transpose(0, 3, 1, 2)

        est_re, est_im = self._apply_masks(
            mask_re, mask_im, mix_re[:, None], mix_im[:, None]
        )
        masked = jnp.concatenate([est_re, est_im], axis=-1)
        others: Dict[str, jnp.ndarray] = {}
        for i in range(self.num_spk):
            others[f"mask_spk{i + 1}"] = jnp.concatenate(
                [mask_re[:, i], mask_im[:, i]], axis=-1
            )
        if self.use_noise_mask:
            others["mask_noise1"] = jnp.concatenate(
                [mask_re[:, -1], mask_im[:, -1]], axis=-1
            )
            others["noise1"] = masked[:, -1]
            masked = masked[:, : self.num_spk]
        return masked, lengths, others

    def _apply_masks(self, mask_re, mask_im, re, im):
        """`dccrn_separator.py:320` apply_masks, per-mask on the mixture."""
        if self.masking_mode == "E":
            spec_mags = jnp.sqrt(re**2 + im**2 + 1e-8)
            spec_phase = jnp.arctan2(im, re)
            mask_mags_raw = jnp.sqrt(mask_re**2 + mask_im**2)
            real_phase = mask_re / (mask_mags_raw + EPS)
            imag_phase = mask_im / (mask_mags_raw + EPS)
            mask_phase = jnp.arctan2(imag_phase, real_phase)
            mask_mags = jnp.tanh(mask_mags_raw)
            est_mags = mask_mags * spec_mags
            est_phase = spec_phase + mask_phase
            return est_mags * jnp.cos(est_phase), est_mags * jnp.sin(est_phase)
        if self.masking_mode == "C":
            return (re * mask_re - im * mask_im,
                    re * mask_im + im * mask_re)
        return re * mask_re, im * mask_im  # "R"
