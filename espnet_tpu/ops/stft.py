"""STFT / log-mel filterbank ops, TPU-first.

Numerical semantics match the reference frontend
(``espnet2/layers/stft.py:111`` = ``torch.stft`` with hann window,
center=True reflect padding, onesided; ``espnet2/layers/log_mel.py:50`` =
librosa slaney mel filterbank, clamp(1e-10), natural log), but the
implementation is designed for the MXU rather than cuFFT:

* framing is a strided gather done once per batch;
* the DFT is expressed as two real matmuls with precomputed cos/sin bases
  (n_fft x (n_fft//2+1)), so frame->window->DFT->power->mel->log is one
  XLA-fused chain of matmuls and elementwise ops — no FFT primitive needed
  and everything lands on the systolic array.  For large n_fft an rFFT path
  is also provided.

All functions are pure and jit-safe with static shapes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (same as torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


def _padded_window(win_length: int, n_fft: int, window: str = "hann") -> np.ndarray:
    if window == "hann":
        w = hann_window(win_length)
    elif window is None or window == "rect":
        w = np.ones(win_length, np.float32)
    else:
        raise ValueError(f"unknown window: {window}")
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, np.float32)
    out[left : left + win_length] = w
    return out


@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin bases: (n_fft, n_fft//2+1) each.

    X[k] = sum_n x[n] cos(-2*pi*k*n/N) + i*sum_n x[n] sin(-2*pi*k*n/N)
    """
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def frame_signal(
    x: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True
) -> jnp.ndarray:
    """(B, N) -> (B, F, n_fft) frames; reflect-pads n_fft//2 when center.

    When hop divides n_fft (the usual 512/128 case) framing is k = n_fft/hop
    shifted reshape-views concatenated on the last axis — pure data movement
    XLA lowers to cheap copies. The equivalent strided *gather* costs ~6x
    more HBM time on TPU (measured 11.7 ms vs 1.9 ms at B=32, 15 s audio).
    """
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    b = x.shape[0]
    n = x.shape[-1]
    num_frames = 1 + (n - n_fft) // hop_length
    if n_fft % hop_length == 0:
        k = n_fft // hop_length
        nhop = n // hop_length
        hops = x[:, : nhop * hop_length].reshape(b, nhop, hop_length)
        return jnp.concatenate(
            [hops[:, i : i + num_frames] for i in range(k)], axis=-1
        )
    idx = (
        np.arange(num_frames, dtype=np.int32)[:, None] * hop_length
        + np.arange(n_fft, dtype=np.int32)[None, :]
    )
    return x[:, idx]


def stft_frames_lengths(ilens: jnp.ndarray, n_fft: int, hop_length: int,
                        center: bool = True) -> jnp.ndarray:
    """Per-utterance frame counts (matches torch.stft output length)."""
    if center:
        return ilens // hop_length + 1
    return (ilens - n_fft) // hop_length + 1


def stft(
    x: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    use_fft: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT of (B, N) float signal -> (real, imag), each (B, F, n_fft//2+1).

    Matches torch.stft(..., center=True, onesided=True, normalized=False)
    (reference `espnet2/layers/stft.py:111`).
    """
    win_length = win_length or n_fft
    frames = frame_signal(x, n_fft, hop_length, center)
    w = jnp.asarray(_padded_window(win_length, n_fft, window))
    frames = frames * w[None, None, :]
    if use_fft:
        spec = jnp.fft.rfft(frames, axis=-1)
        return jnp.real(spec), jnp.imag(spec)
    cos_b, sin_b = _dft_bases(n_fft)
    # Default HIGHEST precision: on TPU the default matmul precision is
    # bf16-ish, which is too coarse for spectral analysis (frontend
    # numerics gate WER parity). The ASR training frontend passes HIGH
    # (3-pass): measured max log-mel deviation vs HIGHEST is 1.1e-3
    # (mean 2e-5) at ~20% less frontend time — far below feature noise.
    real = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(cos_b),
                      precision=precision)
    imag = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(sin_b),
                      precision=precision)
    return real, imag


def power_spectrum(real: jnp.ndarray, imag: jnp.ndarray) -> jnp.ndarray:
    return real * real + imag * imag


def _hz_to_mel(freq: np.ndarray, htk: bool) -> np.ndarray:
    freq = np.asarray(freq, np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(freq / min_log_hz) / logstep
    return np.where(freq >= min_log_hz, log_branch, mels)


def _mel_to_hz(mels: np.ndarray, htk: bool) -> np.ndarray:
    mels = np.asarray(mels, np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """Mel filterbank matrix (n_fft//2+1, n_mels).

    Same numerics as librosa.filters.mel (slaney scale + slaney area norm by
    default), which the reference uses at `espnet2/layers/log_mel.py:50`.
    """
    fmax = fs / 2 if fmax is None else fmax
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, fs / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)  # (n_mels+2,)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_freqs)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


def log_mel(
    power: jnp.ndarray,
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    floor: float = 1e-10,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(B, F, n_freqs) power -> (B, F, n_mels) natural-log mel energies."""
    mat = jnp.asarray(mel_filterbank(fs, n_fft, n_mels, fmin, fmax, htk))
    mel = jnp.einsum("bfk,km->bfm", power, mat, precision=precision)
    return jnp.log(jnp.maximum(mel, floor))


def log_mel_spectrogram(
    x: jnp.ndarray,
    ilens: jnp.ndarray,
    fs: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused frontend: raw wave (B, N) -> (log-mel (B, F, n_mels), frame lens).

    Equivalent to the reference DefaultFrontend chain Stft->power->LogMel
    (`espnet2/asr/frontend/default.py:17`), padded frames are zeroed.
    """
    real, imag = stft(x, n_fft, hop_length, win_length, precision=precision)
    feats = log_mel(power_spectrum(real, imag), fs, n_fft, n_mels, fmin,
                    fmax, precision=precision)
    olens = stft_frames_lengths(ilens, n_fft, hop_length)
    from espnet_tpu.ops.masks import make_valid_mask

    mask = make_valid_mask(olens, feats.shape[1])
    return feats * mask[:, :, None].astype(feats.dtype), olens


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT with overlap-add + window-envelope normalisation.

    Mirror of `espnet2/layers/stft.py` Stft.inverse (torch.functional.istft
    semantics); used by enhancement and Griffin-Lim.
    """
    win_length = win_length or n_fft
    b, f, k = real.shape
    cos_b, sin_b = _dft_bases(n_fft)
    # Inverse real DFT: x[n] = (1/N) * [X[0] + 2*sum_{k=1}^{N/2-1} (Re cos + ...) + X[N/2]]
    scale = np.ones((k,), np.float32) * 2.0
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    # x[n] = (1/N) Σ_k scale_k (Re cos(2πkn/N) - Im sin(2πkn/N)); our bases
    # store cos(-θ)=cos θ and sin(-θ)=-sin θ, hence the '+' on the imag term.
    frames = (
        jnp.einsum("bfk,nk->bfn", real * scale, jnp.asarray(cos_b),
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.einsum("bfk,nk->bfn", imag * scale, jnp.asarray(sin_b),
                     precision=jax.lax.Precision.HIGHEST)
    ) / n_fft
    w = jnp.asarray(_padded_window(win_length, n_fft, window))
    frames = frames * w[None, None, :]
    out_len = n_fft + hop_length * (f - 1)
    # Overlap-add via scatter-add over frame positions.
    idx = (
        np.arange(f, dtype=np.int32)[:, None] * hop_length
        + np.arange(n_fft, dtype=np.int32)[None, :]
    ).reshape(-1)
    sig = jnp.zeros((b, out_len), real.dtype).at[:, idx].add(frames.reshape(b, -1))
    wsq = jnp.zeros((out_len,), real.dtype).at[idx].add(
        jnp.tile(w * w, (f,)).reshape(-1)
    )
    sig = sig / jnp.maximum(wsq, 1e-11)[None, :]
    if center:
        pad = n_fft // 2
        sig = sig[:, pad : out_len - pad]
    if length is not None:
        sig = sig[:, :length]
    return sig
