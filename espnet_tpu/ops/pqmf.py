"""Pseudo-QMF filterbank for multi-band vocoders.

Behavioral spec: reference `espnet2/gan_tts/melgan/pqmf.py` (PQMF:
kaiser-windowed prototype lowpass, cosine-modulated analysis/synthesis
banks, conv downsample / transposed-conv upsample). Used by multi-band
MelGAN and the StyleMelGAN discriminator.

Pure functions of static shapes: the filterbanks are numpy constants baked
at trace time; analysis/synthesis are single strided convs on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.142,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed ideal lowpass (`pqmf.py:design_prototype_filter`)."""
    assert taps % 2 == 0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore", divide="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = omega_c / np.pi
    return h_i * np.kaiser(taps + 1, beta)


def pqmf_banks(subbands: int = 4, taps: int = 62,
               cutoff_ratio: float = 0.0,
               beta: float = 9.0) -> Tuple[np.ndarray, np.ndarray]:
    """Cosine-modulated analysis/synthesis banks, each (subbands, taps+1).

    cutoff_ratio<=0 grid-searches the near-perfect-reconstruction optimum
    for the requested band count (the reference's 0.142 is this optimum
    for 4 bands, `pqmf.py:1` docstring)."""
    if cutoff_ratio <= 0.0:
        cutoff_ratio = _optimal_cutoff(subbands, taps, beta)
    h = design_prototype_filter(taps, cutoff_ratio, beta)
    m = subbands
    ana = np.zeros((m, taps + 1))
    syn = np.zeros((m, taps + 1))
    n = np.arange(taps + 1)
    for k in range(m):
        arg = (2 * k + 1) * (np.pi / (2 * m)) * (n - taps / 2)
        phi = (-1) ** k * np.pi / 4
        ana[k] = 2 * h * np.cos(arg + phi)
        syn[k] = 2 * h * np.cos(arg - phi)
    return ana.astype(np.float32), syn.astype(np.float32)


def _np_reconstruction_error(subbands: int, taps: int, beta: float,
                             cutoff: float) -> float:
    """Impulse-response reconstruction error of the full analysis ->
    zero-stuff -> synthesis chain (numpy, used only for cutoff search)."""
    h = design_prototype_filter(taps, cutoff, beta)
    m = subbands
    n = np.arange(taps + 1)
    impulse = np.zeros(8 * (taps + 1))
    impulse[len(impulse) // 2] = 1.0
    out = np.zeros(len(impulse))
    for k in range(m):
        arg = (2 * k + 1) * (np.pi / (2 * m)) * (n - taps / 2)
        phi = (-1) ** k * np.pi / 4
        ana = 2 * h * np.cos(arg + phi)
        syn = 2 * h * np.cos(arg - phi)
        band = np.convolve(impulse, ana)[taps // 2:][: len(impulse)]
        dec = np.zeros_like(band)
        dec[::m] = band[::m] * m  # decimate + zero-stuff upsample
        out += np.convolve(dec, syn)[taps // 2:][: len(impulse)]
    # ideal output = impulse delayed by the two filters' group delay
    ideal = np.zeros_like(out)
    ideal[len(impulse) // 2] = 1.0
    return float(np.sum((out - ideal) ** 2))


_CUTOFF_CACHE = {}


def _optimal_cutoff(subbands: int, taps: int, beta: float) -> float:
    key = (subbands, taps, beta)
    if key not in _CUTOFF_CACHE:
        centre = 0.5 / subbands
        grid = np.linspace(0.6 * centre, 1.6 * centre, 81)
        errs = [_np_reconstruction_error(subbands, taps, beta, c)
                for c in grid]
        _CUTOFF_CACHE[key] = float(grid[int(np.argmin(errs))])
    return _CUTOFF_CACHE[key]


def pqmf_analysis(x: jnp.ndarray, subbands: int = 4, taps: int = 62,
                  cutoff_ratio: float = 0.0,
                  beta: float = 9.0) -> jnp.ndarray:
    """(B, T) or (B, T, 1) -> (B, T // subbands, subbands)
    (`pqmf.py:PQMF.analysis`: filterbank conv then decimate)."""
    if x.ndim == 2:
        x = x[:, :, None]
    ana, _ = pqmf_banks(subbands, taps, cutoff_ratio, beta)
    kern = jnp.asarray(ana.T[:, None, :])  # (taps+1, 1, subbands)
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=(subbands,),
        padding=((taps // 2, taps // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y


def pqmf_synthesis(y: jnp.ndarray, subbands: int = 4, taps: int = 62,
                   cutoff_ratio: float = 0.0,
                   beta: float = 9.0) -> jnp.ndarray:
    """(B, T', subbands) -> (B, T' * subbands) — zero-stuff upsample each
    band by `subbands`, filter with the synthesis bank, sum
    (`pqmf.py:PQMF.synthesis`)."""
    b, t, m = y.shape
    assert m == subbands
    # zero-stuffing upsample (gain M to preserve amplitude)
    up = jnp.zeros((b, t * m, m), y.dtype)
    up = up.at[:, ::m].set(y * m)
    _, syn = pqmf_banks(subbands, taps, cutoff_ratio, beta)
    kern = jnp.asarray(syn.T[:, :, None])  # (taps+1, subbands, 1)
    out = jax.lax.conv_general_dilated(
        up, kern, window_strides=(1,),
        padding=((taps // 2, taps // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out[..., 0]
