"""Griffin-Lim phase reconstruction (mel -> waveform fallback vocoder).

Behavioral spec: reference `espnet2/utils/griffin_lim.py` (logmel ->
inverse mel -> |S| -> iterative phase recovery with torch/librosa
griffinlim). Implemented on our stft/istft ops with a `lax.fori_loop`, so
vocoding jit-compiles on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.stft import istft, mel_filterbank, stft


def logmel_to_linear(
    log_mel: jnp.ndarray,  # (B, T, n_mels), natural log
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jnp.ndarray:
    """Pseudo-inverse mel -> linear magnitude spectrogram (B, T, n_fft//2+1)."""
    mel_basis = mel_filterbank(fs, n_fft, n_mels, fmin, fmax)  # (F, M)
    # mel = power @ mel_basis  =>  power ≈ mel @ pinv(mel_basis)
    inv = np.linalg.pinv(mel_basis)  # (M, F)
    power = jnp.maximum(jnp.einsum("btm,mf->btf", jnp.exp(log_mel), inv), 1e-10)
    return jnp.sqrt(power)


def griffin_lim(
    magnitude: jnp.ndarray,  # (B, T, F) linear magnitude
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    n_iter: int = 32,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Iterative phase reconstruction. Returns (B, N) waveform."""
    b, t, f = magnitude.shape
    out_len = length or hop_length * (t - 1)

    key = jax.random.PRNGKey(0)
    angle = jax.random.uniform(key, magnitude.shape, minval=-np.pi, maxval=np.pi)
    real = magnitude * jnp.cos(angle)
    imag = magnitude * jnp.sin(angle)

    def body(_, ri):
        real, imag = ri
        wav = istft(real, imag, n_fft, hop_length, win_length, length=out_len)
        r2, i2 = stft(wav, n_fft, hop_length, win_length)
        r2 = r2[:, :t]
        i2 = i2[:, :t]
        mag2 = jnp.sqrt(jnp.maximum(r2 * r2 + i2 * i2, 1e-12))
        return magnitude * r2 / mag2, magnitude * i2 / mag2

    real, imag = jax.lax.fori_loop(0, n_iter, body, (real, imag))
    return istft(real, imag, n_fft, hop_length, win_length, length=out_len)


def logmel_to_wav(
    log_mel: jnp.ndarray,
    fs: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    n_mels: int = 80,
    n_iter: int = 32,
) -> jnp.ndarray:
    mag = logmel_to_linear(log_mel, fs, n_fft, n_mels)
    return griffin_lim(mag, n_fft, hop_length, win_length, n_iter)
