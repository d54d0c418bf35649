"""Frame-level pitch (F0) and energy extraction on device.

Behavioral spec: reference `espnet2/tts/feats_extract/dio.py` (pyworld Dio
F0 + continuous-F0 postprocessing) and `energy.py` (L2 norm of the STFT
frame). The reference delegates F0 to the pyworld C extension; here it is
a framed-autocorrelation estimator in pure XLA (one rFFT + one irFFT per
frame batch, peak-pick over the plausible lag band) — same frame grid as
the log-mel frontend so targets line up with mel features.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.stft import frame_signal, stft


def frame_energy(wav: jnp.ndarray, n_fft: int = 1024,
                 hop_length: int = 256) -> jnp.ndarray:
    """(B, N) -> (B, T) energy = ||STFT frame||_2
    (`feats_extract/energy.py`)."""
    real, imag = stft(wav, n_fft, hop_length)
    return jnp.sqrt(jnp.clip(jnp.sum(real * real + imag * imag, axis=-1),
                             1e-10))


def autocorr_f0(
    wav: jnp.ndarray,
    fs: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 256,
    f0min: float = 80.0,
    f0max: float = 400.0,
    voicing_threshold: float = 0.35,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) -> (log_f0 (B, T), voiced (B, T)); unvoiced frames get 0.

    Normalized-autocorrelation peak picking in the [fs/f0max, fs/f0min]
    lag band; voicing decision by peak-to-r0 ratio (Dio-equivalent targets
    for variance predictors, not a vocoder-grade tracker).
    """
    frames = frame_signal(wav, n_fft, hop_length, center=True)  # (B, T, W)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # autocorrelation via power spectrum (Wiener-Khinchin)
    spec = jnp.fft.rfft(frames, n=2 * n_fft, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), axis=-1)[..., :n_fft]
    r0 = jnp.maximum(ac[..., :1], 1e-8)
    acn = ac / r0
    lag_min = max(int(fs / f0max), 2)
    lag_max = min(int(fs / f0min) + 1, n_fft - 1)
    band = acn[..., lag_min:lag_max]
    peak = jnp.argmax(band, axis=-1)
    peak_val = jnp.take_along_axis(band, peak[..., None], axis=-1)[..., 0]
    lag = (peak + lag_min).astype(jnp.float32)
    f0 = fs / lag
    # voicing: strong normalized peak + actual signal energy in the frame
    energy = jnp.sqrt(jnp.mean(frames ** 2, axis=-1))
    voiced = (peak_val > voicing_threshold) & (
        energy > 1e-4 * jnp.max(energy, axis=-1, keepdims=True)
    )
    log_f0 = jnp.where(voiced, jnp.log(f0), 0.0)
    return log_f0, voiced.astype(jnp.float32)
