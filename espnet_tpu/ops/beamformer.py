"""Complex-valued multichannel ops: WPE dereverberation, PSD matrices,
MVDR beamforming.

Behavioral spec: reference `espnet2/enh/layers/wpe.py` (nara-wpe style
block iteration), `espnet2/enh/layers/beamformer.py`
(`get_power_spectral_density_matrix`, `get_mvdr_vector`,
`apply_beamforming_vector`) and the torch_complex-based v1 equivalents in
`espnet/nets/pytorch_backend/frontends/{dnn_wpe,dnn_beamformer}.py`.

TPU-native design: everything is batched einsum over (B, F) so the
per-frequency C x C solves batch into one big `jnp.linalg.solve` — no
Python loops over frequencies; complex arithmetic stays in XLA.

Shapes follow the reference convention: Y is (B, F, C, T) complex.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def _hermite(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.conj(jnp.swapaxes(x, -1, -2))


def _loaded(mat: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Diagonal loading: mat + eps * trace(mat)/n * I (reference
    `beamformer.py` eps regularisation)."""
    n = mat.shape[-1]
    tr = jnp.trace(mat, axis1=-2, axis2=-1).real[..., None, None]
    eye = jnp.eye(n, dtype=mat.dtype)
    return mat + (eps * tr / n + 1e-10) * eye


def signal_framing(y: jnp.ndarray, taps: int, delay: int) -> jnp.ndarray:
    """Stack delayed copies: (B, F, C, T) -> (B, F, C*taps, T) where tap k
    holds Y[..., t - delay - k] (`wpe.py:signal_framing`)."""
    outs = []
    for k in range(taps):
        shift = delay + k
        pad = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (shift, 0)))
        outs.append(pad[..., : y.shape[-1]])
    return jnp.concatenate(outs, axis=-2)


def wpe_one_iteration(
    y: jnp.ndarray,
    power: jnp.ndarray,
    taps: int = 5,
    delay: int = 3,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """One WPE step given the power estimate.

    y: (B, F, C, T) complex observed; power: (B, F, T) real.
    Returns dereverberated (B, F, C, T) (`wpe.py:wpe_one_iteration`).
    """
    c, t = y.shape[-2], y.shape[-1]
    inv_p = 1.0 / jnp.maximum(power, eps)  # (B, F, T)
    ytilde = signal_framing(y, taps, delay)  # (B, F, CK, T)
    yw = ytilde * inv_p[..., None, :].astype(ytilde.dtype)
    # correlation matrix R (B,F,CK,CK) and vector P (B,F,CK,C)
    r_mat = jnp.einsum("...it,...jt->...ij", yw, jnp.conj(ytilde))
    p_mat = jnp.einsum("...it,...jt->...ij", yw, jnp.conj(y))
    g = jnp.linalg.solve(_loaded(r_mat, eps), p_mat)  # (B, F, CK, C)
    tail = jnp.einsum("...ki,...kt->...it", jnp.conj(g), ytilde)
    return y - tail


def wpe(
    y: jnp.ndarray,
    taps: int = 5,
    delay: int = 3,
    iterations: int = 3,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Blind iterative WPE (`wpe.py:wpe`): alternate power estimation from
    the current dereverberated signal and the filter solve."""
    x = y
    for _ in range(iterations):
        power = jnp.mean(jnp.abs(x) ** 2, axis=-2)  # avg over channels
        x = wpe_one_iteration(y, power, taps, delay, eps)
    return x


def psd_matrix(y: jnp.ndarray, mask: jnp.ndarray,
               normalize: bool = True, eps: float = 1e-6) -> jnp.ndarray:
    """Mask-weighted cross-channel PSD
    (`beamformer.py:get_power_spectral_density_matrix`).

    y: (B, F, C, T) complex; mask: (B, F, T) real in [0, 1].
    Returns (B, F, C, C) complex.
    """
    m = mask[..., None, :].astype(y.dtype)  # (B, F, 1, T)
    psd = jnp.einsum("...it,...jt->...ij", y * m, jnp.conj(y))
    if normalize:
        denom = jnp.sum(mask, axis=-1)[..., None, None]  # (B, F, 1, 1)
        psd = psd / jnp.maximum(denom, eps).astype(psd.dtype)
    return psd


def mvdr_weights(
    psd_speech: jnp.ndarray,
    psd_noise: jnp.ndarray,
    reference_vector: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Souden MVDR filter (`beamformer.py:get_mvdr_vector`):
    w = (Phi_n^-1 Phi_s / tr(Phi_n^-1 Phi_s)) u.

    psd_*: (B, F, C, C); reference_vector: (B, C) one-hot (or soft).
    Returns w (B, F, C) complex.
    """
    numerator = jnp.linalg.solve(_loaded(psd_noise, eps), psd_speech)
    tr = jnp.trace(numerator, axis1=-2, axis2=-1)[..., None, None]
    ws = numerator / (tr + 1e-10)
    u = reference_vector[:, None, :, None].astype(ws.dtype)  # (B,1,C,1)
    return jnp.squeeze(ws @ u, axis=-1)  # (B, F, C)


def apply_beamformer(w: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """w: (B, F, C), y: (B, F, C, T) -> (B, F, T)
    (`beamformer.py:apply_beamforming_vector`: w^H y)."""
    return jnp.einsum("...c,...ct->...t", jnp.conj(w), y)


# ---------------------------------------------------------------------------
# Delay-and-sum beamforming (the BeamformIt role, `tools/Makefile:180`)
# ---------------------------------------------------------------------------


def gcc_phat_tdoa(
    ref: jnp.ndarray,
    sig: jnp.ndarray,
    max_delay: int = 800,
) -> jnp.ndarray:
    """GCC-PHAT time-difference-of-arrival of `sig` vs `ref` (samples).

    Classic BeamformIt channel-alignment estimator: cross-power spectrum
    whitened to phase only, inverse transform, argmax within +-max_delay.
    Positive result = `sig` LAGS `ref` by that many samples.
    """
    n = ref.shape[-1]
    nfft = 1
    while nfft < 2 * n:
        nfft *= 2
    r = jnp.fft.rfft(ref, nfft)
    s = jnp.fft.rfft(sig, nfft)
    cross = r * jnp.conj(s)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    cc = jnp.fft.irfft(cross, nfft)
    # lags [-max_delay, max_delay]: irfft layout has negative lags at the end
    cc = jnp.concatenate([cc[..., -max_delay:], cc[..., : max_delay + 1]],
                         axis=-1)
    # R*conj(S) peaks at -(lag of sig); negate so a POSITIVE return means
    # sig lags ref (sig = roll(ref, +tdoa) for identical signals)
    return max_delay - jnp.argmax(cc, axis=-1)


def delay_and_sum(
    y: jnp.ndarray,
    ref_channel: int = 0,
    max_delay: int = 800,
    weighted: bool = True,
) -> jnp.ndarray:
    """Delay-and-sum beamformer over (C, N) multichannel time signals.

    BeamformIt-role algorithm (SURVEY §2.6, `tools/Makefile:180`):
    per-channel TDOA via GCC-PHAT against the reference channel, integer
    delay alignment (jnp.roll — the scene edges wrap, negligible for
    utterance-scale signals), then a weighted sum whose weights are the
    aligned channels' normalized cross-correlation with the reference
    (BeamformIt's channel-quality weighting role; `weighted=False` gives
    the plain average). Returns (N,) enhanced signal.
    """
    c, n = y.shape
    ref = y[ref_channel]
    tdoas = jnp.stack([
        gcc_phat_tdoa(ref, y[i], max_delay) for i in range(c)
    ])  # (C,)
    aligned = jnp.stack([
        jnp.roll(y[i], -tdoas[i]) for i in range(c)  # undo each lag
    ])  # (C, N)
    if not weighted:
        return jnp.mean(aligned, axis=0)
    rn = ref / jnp.maximum(jnp.linalg.norm(ref), 1e-12)
    an = aligned / jnp.maximum(
        jnp.linalg.norm(aligned, axis=-1, keepdims=True), 1e-12)
    xcorr = jnp.maximum(an @ rn, 0.0)  # (C,) non-negative quality
    w = xcorr / jnp.maximum(jnp.sum(xcorr), 1e-12)
    return jnp.sum(aligned * w[:, None], axis=0)
