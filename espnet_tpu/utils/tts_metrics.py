"""Objective TTS evaluation: mel-cepstral distortion (MCD) with DTW.

Fills the tts.sh evaluation role (the reference publishes no objective TTS
numbers — SURVEY §6 — but the standard measure for synthesized speech is
MCD). Mel cepstra are DCT-II coefficients of our log-mel spectrogram
(`ops/stft.log_mel_spectrogram`, librosa-parity), frames are aligned with
dynamic time warping, and MCD is the usual
(10 * sqrt(2) / ln 10) * mean ||c_ref - c_syn||_2 over the aligned path,
excluding c0 (energy).
"""

from __future__ import annotations

import numpy as np


def mel_cepstra(wav: np.ndarray, fs: int = 16000, n_mels: int = 80,
                n_mcep: int = 13) -> np.ndarray:
    """(N,) waveform -> (T, n_mcep) mel cepstra (DCT-II of log-mel)."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.ops.stft import log_mel_spectrogram

    mel, lens = log_mel_spectrogram(
        jnp.asarray(wav[None].astype(np.float32)),
        jnp.asarray([len(wav)], np.int32), fs=fs, n_mels=n_mels)
    mel = np.asarray(mel[0, : int(lens[0])], np.float64)
    # orthonormal DCT-II over the mel axis
    m = mel.shape[1]
    k = np.arange(m)
    basis = np.cos(np.pi * (k[:, None] + 0.5) * k[None, :n_mcep + 1] / m)
    basis *= np.sqrt(2.0 / m)
    basis[:, 0] *= np.sqrt(0.5)
    return mel @ basis  # (T, n_mcep+1), col 0 = c0 (energy)


def dtw_path_cost(a: np.ndarray, b: np.ndarray) -> float:
    """Mean euclidean frame distance along the DTW path of (Ta,D),(Tb,D)."""
    ta, tb = a.shape[0], b.shape[0]
    # pairwise distances
    d = np.sqrt(
        np.maximum(
            (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :]
            - 2.0 * (a @ b.T),
            0.0,
        )
    )
    acc = np.full((ta + 1, tb + 1), np.inf)
    cnt = np.zeros((ta + 1, tb + 1), np.int64)
    acc[0, 0] = 0.0
    for i in range(1, ta + 1):
        for j in range(1, tb + 1):
            prev = min((acc[i - 1, j], (i - 1, j)),
                       (acc[i, j - 1], (i, j - 1)),
                       (acc[i - 1, j - 1], (i - 1, j - 1)))
            acc[i, j] = d[i - 1, j - 1] + prev[0]
            cnt[i, j] = cnt[prev[1]] + 1
    return float(acc[ta, tb] / max(int(cnt[ta, tb]), 1))


def mel_cepstral_distortion(ref_wav: np.ndarray, syn_wav: np.ndarray,
                            fs: int = 16000, n_mcep: int = 13) -> float:
    """MCD in dB between a reference and a synthesized waveform."""
    cr = mel_cepstra(ref_wav, fs=fs, n_mcep=n_mcep)[:, 1:]  # drop c0
    cs = mel_cepstra(syn_wav, fs=fs, n_mcep=n_mcep)[:, 1:]
    k = 10.0 * np.sqrt(2.0) / np.log(10.0)
    return k * dtw_path_cost(cr, cs)
