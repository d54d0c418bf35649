"""DNN-supported WPE dereverberation and MVDR neural beamformer.

Behavioral spec: reference `espnet2/enh/layers/dnn_wpe.py` (DNN_WPE:
mask-based power estimate + WPE step), `espnet2/enh/layers/dnn_beamformer.py`
(DNN_Beamformer: MaskEstimator -> speech/noise PSDs -> MVDR -> enhanced
STFT; AttentionReference/fixed ref channel) and
`espnet/nets/pytorch_backend/frontends/mask_estimator.py` (shared BLSTM
over per-channel magnitudes, sigmoid masks).

TPU-native: masks come from a BLSTM over (B*C, T, F) log-magnitude; all
complex linear algebra is batched over (B, F) (see
`espnet_tpu/ops/beamformer.py`); a multichannel utterance is one jittable
static-shape program — no per-frequency Python loops.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.ops.beamformer import (
    apply_beamformer, mvdr_weights, psd_matrix, wpe_one_iteration,
)


class MaskEstimator(nn.Module):
    """Shared BLSTM mask estimator (`frontends/mask_estimator.py:15`):
    per-channel log-magnitude -> BLSTM -> Dense -> sigmoid, one mask per
    requested output (e.g. speech + noise)."""

    n_masks: int = 2
    hidden: int = 128
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        # y: (B, F, C, T) complex -> masks each (B, F, C, T) in [0, 1]
        b, f, c, t = y.shape
        x = jnp.log1p(jnp.abs(y))  # (B, F, C, T)
        x = x.transpose(0, 2, 3, 1).reshape(b * c, t, f)
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden),
                         name=f"lstm{i}_fwd")(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                         keep_order=True, name=f"lstm{i}_bwd")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        masks = []
        for i in range(self.n_masks):
            m = nn.sigmoid(
                nn.Dense(f, dtype=self.dtype, name=f"mask_out{i}")(x)
            )
            masks.append(
                m.reshape(b, c, t, f).transpose(0, 3, 1, 2)
            )
        return tuple(masks)


class DNNWPE(nn.Module):
    """Mask-driven single-iteration WPE (`dnn_wpe.py:14`): the DNN
    estimates the source power, then one WPE filter solve."""

    taps: int = 5
    delay: int = 3
    hidden: int = 128
    num_layers: int = 1
    use_dnn_mask: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # y: (B, F, C, T) complex -> (dereverberated, power_mask)
        if self.use_dnn_mask:
            (mask,) = MaskEstimator(
                1, self.hidden, self.num_layers, self.dtype, name="mask_est",
            )(y)
            power = jnp.mean(mask * jnp.abs(y) ** 2, axis=-2)  # (B, F, T)
        else:
            mask = jnp.ones(y.shape, self.dtype)
            power = jnp.mean(jnp.abs(y) ** 2, axis=-2)
        x = wpe_one_iteration(y, power, self.taps, self.delay)
        return x, mask


class DNNBeamformer(nn.Module):
    """Mask-based MVDR beamformer (`dnn_beamformer.py:31`): MaskEstimator
    -> channel-averaged speech/noise masks -> PSDs -> Souden MVDR with a
    fixed reference channel -> enhanced single-channel STFT."""

    hidden: int = 128
    num_layers: int = 2
    ref_channel: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray):
        # y: (B, F, C, T) complex
        b, f, c, t = y.shape
        mask_s, mask_n = MaskEstimator(
            2, self.hidden, self.num_layers, self.dtype, name="mask_est",
        )(y)
        # channel-average the masks (reference averages via mask.mean(dim=-2))
        ms = jnp.mean(mask_s, axis=-2)  # (B, F, T)
        mn = jnp.mean(mask_n, axis=-2)
        psd_s = psd_matrix(y, ms)
        psd_n = psd_matrix(y, mn)
        u = jnp.zeros((b, c)).at[:, self.ref_channel].set(1.0)
        w = mvdr_weights(psd_s, psd_n, u)  # (B, F, C)
        enhanced = apply_beamformer(w, y)  # (B, F, T)
        return enhanced, {"mask_spk1": mask_s, "mask_noise1": mask_n}


class BeamformerSeparator(nn.Module):
    """Joint WPE + MVDR front-end as a waveform-to-waveform enhancer
    (`espnet2/enh/separator/neural_beamformer.py:15`).

    Takes a multichannel mixture (B, n, C), STFTs every channel, optionally
    dereverberates, beamforms to one channel, and iSTFTs back.
    """

    n_fft: int = 512
    hop_length: int = 128
    use_wpe: bool = False
    wpe_taps: int = 5
    wpe_delay: int = 3
    hidden: int = 128
    num_layers: int = 2
    ref_channel: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, speech_mix: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True):
        from espnet_tpu.ops.stft import istft, stft, stft_frames_lengths

        b, n, c = speech_mix.shape
        flat = speech_mix.transpose(0, 2, 1).reshape(b * c, n)
        real, imag = stft(flat, self.n_fft, self.hop_length)
        t, f = real.shape[1], real.shape[2]
        y = (real + 1j * imag).reshape(b, c, t, f)
        y = y.transpose(0, 3, 1, 2)  # (B, F, C, T)
        others = {}
        if self.use_wpe:
            y, wpe_mask = DNNWPE(
                self.wpe_taps, self.wpe_delay, self.hidden, 1,
                dtype=self.dtype, name="wpe",
            )(y)
            others["mask_dereverb1"] = wpe_mask
        enhanced, masks = DNNBeamformer(
            self.hidden, self.num_layers, self.ref_channel, self.dtype,
            name="beamformer",
        )(y)
        others.update(masks)
        spec = enhanced.transpose(0, 2, 1)  # (B, T, F)
        wav = istft(spec.real, spec.imag, self.n_fft, self.hop_length)
        wav = (
            wav[:, :n] if wav.shape[1] >= n
            else jnp.pad(wav, ((0, 0), (0, n - wav.shape[1])))
        )
        flens = stft_frames_lengths(lengths, self.n_fft, self.hop_length)
        return wav[:, None, :], flens, others
