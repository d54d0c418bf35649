"""Lightweight Sinc convolutions: learnable band-pass front-end on raw
waveform windows.

Behavioral spec: reference `espnet2/layers/sinc_conv.py` (SincConv with
mel-initialised learnable cutoffs, Hamming window) and
`espnet2/asr/preencoder/sinc.py` (LightweightSincConvs: sliding-window
frames -> SincConv block -> depthwise conv blocks -> per-frame feature
vector, used in place of the fbank frontend).

TPU-native: the sinc kernels are *generated on device* from the two
cutoff-parameter vectors each step (a (kernel, channels) outer-product +
sin — trivially fused by XLA), then applied as one big conv over all
frames batched on the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.stft import frame_signal


class SincConv(nn.Module):
    """Band-pass sinc filterbank conv (`sinc_conv.py` SincConv).

    Parameters are per-filter (low_hz, band_hz) in mel-spaced init; the
    kernel is built on the fly: 2*band*sinc(2*pi*band*t) shifted to the
    band centre, Hamming-windowed.
    """

    out_channels: int = 128
    kernel_size: int = 101
    fs: int = 16000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, N) -> (B, N - kernel + 1, out_channels)  (VALID conv)
        fs, oc, k = self.fs, self.out_channels, self.kernel_size

        def mel_init_low(_):
            mel = np.linspace(
                2595.0 * np.log10(1.0 + 30.0 / 700.0),
                2595.0 * np.log10(1.0 + (fs / 2 - 100.0) / 700.0),
                oc + 1,
            )
            hz = 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
            return jnp.asarray(hz[:-1], jnp.float32)

        def mel_init_band(_):
            mel = np.linspace(
                2595.0 * np.log10(1.0 + 30.0 / 700.0),
                2595.0 * np.log10(1.0 + (fs / 2 - 100.0) / 700.0),
                oc + 1,
            )
            hz = 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
            return jnp.asarray(np.diff(hz), jnp.float32)

        low_hz = self.param("low_hz", mel_init_low)
        band_hz = self.param("band_hz", mel_init_band)
        low = self.min_low_hz + jnp.abs(low_hz)
        high = jnp.clip(
            low + self.min_band_hz + jnp.abs(band_hz), 0.0, fs / 2
        )
        # time axis (centered), Hamming window
        n = (k - 1) // 2
        t = jnp.arange(-n, n + 1, dtype=jnp.float32) / fs  # (k,)
        window = 0.54 - 0.46 * jnp.cos(
            2.0 * jnp.pi * jnp.arange(k, dtype=jnp.float32) / (k - 1)
        )

        def bandpass(cut):  # (oc,) -> (k, oc) low-pass sinc at cutoff
            arg = 2.0 * jnp.pi * cut[None, :] * t[:, None]  # (k, oc)
            # safe-sinc: keep the 0/0 point out of BOTH branches so the
            # gradient of the unselected branch cannot produce NaN
            near0 = jnp.abs(arg) < 1e-8
            arg_safe = jnp.where(near0, 1.0, arg)
            sinc = jnp.where(near0, 1.0, jnp.sin(arg_safe) / arg_safe)
            return 2.0 * cut[None, :] * sinc

        kern = (bandpass(high) - bandpass(low)) * window[:, None]  # (k, oc)
        kern = kern / (2.0 * (high - low))[None, :]
        kern = kern.astype(self.dtype)
        y = jnp.einsum(
            "bnk,kc->bnc",
            frame_signal(x, k, 1, center=False),
            kern,
            preferred_element_type=jnp.float32,
        )
        return y.astype(self.dtype)


class LightweightSincConvs(nn.Module):
    """Sliding-window raw-audio front-end (`preencoder/sinc.py`
    LightweightSincConvs): frames of raw samples -> SincConv -> pooled
    depthwise conv blocks -> (B, T, out_dim) features."""

    fs: int = 16000
    win_length: int = 400
    hop_length: int = 160
    sinc_channels: int = 128
    sinc_kernel: int = 101
    out_dim: int = 256
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, speech: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, _ = speech.shape
        frames = frame_signal(speech, self.win_length, self.hop_length,
                              center=True)  # (B, T, win)
        t = frames.shape[1]
        flens = jnp.minimum(lengths // self.hop_length + 1, t)
        x = frames.reshape(b * t, self.win_length)
        h = SincConv(self.sinc_channels, self.sinc_kernel, self.fs,
                     dtype=self.dtype, name="sinc")(x)  # (BT, L, C)
        h = jnp.abs(h)
        h = nn.max_pool(h, (2,), strides=(2,))
        h = nn.LayerNorm(dtype=self.dtype, name="norm0")(h)
        h = nn.leaky_relu(h)
        # two depthwise-separable conv blocks (reference DSconv blocks)
        for i, ch in enumerate([self.out_dim, self.out_dim]):
            h = nn.Conv(h.shape[-1], (25,), padding="SAME",
                        feature_group_count=h.shape[-1], dtype=self.dtype,
                        name=f"dw{i}")(h)
            h = nn.Conv(ch, (1,), dtype=self.dtype, name=f"pw{i}")(h)
            h = nn.max_pool(h, (2,), strides=(2,))
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm{i + 1}")(h)
            h = nn.leaky_relu(h)
        h = jnp.mean(h, axis=1)  # pool within the window -> (BT, out_dim)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        feats = h.reshape(b, t, self.out_dim)
        mask = (jnp.arange(t)[None, :] < flens[:, None]).astype(feats.dtype)
        return feats * mask[:, :, None], flens
