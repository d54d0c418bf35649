"""Enhancement loss criterions + permutation-invariant training (PIT).

Behavioral spec: reference `espnet2/enh/loss/criterions/time_domain.py`
(`SISNRLoss:219` scale-invariant SNR with optional clamp_db and zero-mean;
`SNRLoss:111`), `tf_domain.py` (masked spectral MSE/L1) and
`espnet2/enh/loss/wrappers/pit_solver.py:10` (PITSolver: evaluate the
criterion for every speaker permutation, pick the best per utterance).

TPU formulation: the (n_ref x n_est) pairwise loss matrix is one vmapped
batched computation; the permutation search is a static `n_spk!`-way
reduction (n_spk is tiny), so the whole PIT step stays inside jit with
fixed shapes. Lengths are honoured with masked moments instead of
variable-length slicing.
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1.0e-8


def _masked(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    if lengths is None:
        return jnp.ones_like(x, dtype=bool)
    n = x.shape[-1]
    return jnp.arange(n)[None, :] < lengths[:, None]


def si_snr_loss(
    ref: jnp.ndarray,            # (B, n)
    est: jnp.ndarray,            # (B, n)
    lengths: Optional[jnp.ndarray] = None,
    zero_mean: bool = True,
    clamp_db: Optional[float] = None,
) -> jnp.ndarray:
    """Negative SI-SNR per utterance, (B,). (`time_domain.py:219`)."""
    mask = _masked(ref, lengths).astype(ref.dtype)
    cnt = jnp.maximum(jnp.sum(mask, -1, keepdims=True), 1.0)
    if zero_mean:
        ref = (ref - jnp.sum(ref * mask, -1, keepdims=True) / cnt) * mask
        est = (est - jnp.sum(est * mask, -1, keepdims=True) / cnt) * mask
    else:
        ref = ref * mask
        est = est * mask
    dot = jnp.sum(ref * est, -1, keepdims=True)
    ref_pow = jnp.sum(ref ** 2, -1, keepdims=True)
    s_target = dot / (ref_pow + EPS) * ref
    e_noise = est - s_target
    ratio = jnp.sum(s_target ** 2, -1) / (jnp.sum(e_noise ** 2, -1) + EPS)
    si_snr = 10.0 * jnp.log10(ratio + EPS)
    if clamp_db is not None:
        si_snr = jnp.clip(si_snr, -clamp_db, clamp_db)
    return -si_snr


def snr_loss(
    ref: jnp.ndarray, est: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Negative plain SNR per utterance (`time_domain.py:111`)."""
    mask = _masked(ref, lengths).astype(ref.dtype)
    ref = ref * mask
    est = est * mask
    noise = ref - est
    ratio = jnp.sum(ref ** 2, -1) / (jnp.sum(noise ** 2, -1) + EPS)
    return -10.0 * jnp.log10(ratio + EPS)


def time_mse_loss(
    ref: jnp.ndarray, est: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    mask = _masked(ref, lengths).astype(ref.dtype)
    cnt = jnp.maximum(jnp.sum(mask, -1), 1.0)
    return jnp.sum(((ref - est) * mask) ** 2, -1) / cnt


def spectral_l1_loss(
    ref: jnp.ndarray,            # (B, T, F) magnitude
    est: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked L1 over TF bins (`tf_domain.py` FrequencyDomainL1)."""
    if lengths is None:
        m = jnp.ones(ref.shape[:2], ref.dtype)
    else:
        m = (jnp.arange(ref.shape[1])[None, :] < lengths[:, None]).astype(ref.dtype)
    cnt = jnp.maximum(jnp.sum(m, -1) * ref.shape[-1], 1.0)
    return jnp.sum(jnp.abs(ref - est) * m[..., None], axis=(1, 2)) / cnt


def pit_solve(
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    refs: jnp.ndarray,           # (B, n_spk, ...)
    ests: jnp.ndarray,           # (B, n_spk, ...)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation-invariant loss (`pit_solver.py:10`).

    loss_fn(ref (B, ...), est (B, ...)) -> (B,). Returns
    (best mean-over-speakers loss per utterance (B,), best permutation
    indices (B, n_spk) mapping est-slot -> ref-slot).
    """
    n_spk = refs.shape[1]
    # pairwise matrix (B, n_ref, n_est)
    pair = jax.vmap(
        lambda r: jax.vmap(lambda e: loss_fn(r, e), in_axes=1, out_axes=1)(ests),
        in_axes=1, out_axes=1,
    )(refs)
    perms = list(itertools.permutations(range(n_spk)))
    perm_arr = jnp.asarray(perms)                      # (P, n_spk)
    # loss of permutation p = mean_j pair[:, p[j], j]
    losses = jnp.stack(
        [jnp.mean(pair[:, jnp.asarray(p), jnp.arange(n_spk)], axis=1)
         for p in perms], axis=1,
    )                                                  # (B, P)
    best = jnp.argmin(losses, axis=1)                  # (B,)
    best_loss = jnp.take_along_axis(losses, best[:, None], 1)[:, 0]
    best_perm = perm_arr[best]                         # (B, n_spk)
    return best_loss, best_perm


def ci_sdr_loss(
    ref: jnp.ndarray,            # (B, n)
    est: jnp.ndarray,            # (B, n)
    lengths: Optional[jnp.ndarray] = None,
    filter_length: int = 512,
) -> jnp.ndarray:
    """Negative CI-SDR per utterance (`time_domain.py:64` CISDRLoss;
    Boeddeker et al. 2021, arXiv:2011.15003): SDR measured against the
    reference passed through the optimal length-L FIR filter, making the
    criterion invariant to short convolutive transfer functions.

    Solved in closed form: h* = R^-1 p with R the (L, L) Toeplitz
    autocorrelation of ref and p the ref/est cross-correlation, both via
    FFT; the filtered reference is the projection of est onto the span of
    the L shifted refs.
    """
    mask = _masked(ref, lengths).astype(ref.dtype)
    ref = ref * mask
    est = est * mask
    n = ref.shape[-1]
    lf = min(filter_length, n)
    n_fft = int(2 ** np.ceil(np.log2(n + lf)))
    rf = jnp.fft.rfft(ref, n_fft)
    ef = jnp.fft.rfft(est, n_fft)
    acorr = jnp.fft.irfft(rf * jnp.conj(rf), n_fft)[:, :lf]     # (B, L)
    xcorr = jnp.fft.irfft(ef * jnp.conj(rf), n_fft)[:, :lf]     # (B, L)
    idx = jnp.abs(jnp.arange(lf)[:, None] - jnp.arange(lf)[None, :])
    r_mat = acorr[:, idx]                                       # (B, L, L)
    r_mat = r_mat + EPS * jnp.eye(lf)[None]
    h = jnp.linalg.solve(r_mat, xcorr[..., None])[..., 0]       # (B, L)
    filt = jnp.fft.irfft(rf * jnp.fft.rfft(h, n_fft), n_fft)[:, :n]
    err = est - filt
    ratio = jnp.sum(filt ** 2, -1) / (jnp.sum(err ** 2, -1) + EPS)
    return -10.0 * jnp.log10(ratio + EPS)


# --- tf-domain mask criterions (`tf_domain.py:17` _create_mask_label) -----


def mask_label(
    mix_real: jnp.ndarray, mix_imag: jnp.ndarray,
    ref_real: jnp.ndarray, ref_imag: jnp.ndarray,
    mask_type: str = "IAM",
) -> jnp.ndarray:
    """Ideal mask targets over TF bins (shapes (B, T, F)).

    IBM: 1 where |ref| dominates |mix - ref|; IRM: |ref|/(|ref|+|noise|);
    IAM: |ref|/|mix| clipped to [0, 1]; PSM: |ref|/|mix| cos(angle diff)
    clipped to [0, 1] (NPSM clips at 0 only below).
    """
    mix_mag = jnp.sqrt(mix_real ** 2 + mix_imag ** 2 + EPS)
    ref_mag = jnp.sqrt(ref_real ** 2 + ref_imag ** 2 + EPS)
    mask_type = mask_type.upper()
    if mask_type == "IBM":
        noise_r = mix_real - ref_real
        noise_i = mix_imag - ref_imag
        noise_mag = jnp.sqrt(noise_r ** 2 + noise_i ** 2 + EPS)
        return (ref_mag >= noise_mag).astype(mix_real.dtype)
    if mask_type == "IRM":
        noise_r = mix_real - ref_real
        noise_i = mix_imag - ref_imag
        noise_mag = jnp.sqrt(noise_r ** 2 + noise_i ** 2 + EPS)
        return ref_mag / (ref_mag + noise_mag + EPS)
    if mask_type == "IAM":
        return jnp.clip(ref_mag / (mix_mag + EPS), 0.0, 1.0)
    if mask_type in ("PSM", "NPSM"):
        # cos(theta_ref - theta_mix) = Re(ref * conj(mix)) / (|ref||mix|)
        cos = (ref_real * mix_real + ref_imag * mix_imag) / (
            ref_mag * mix_mag + EPS
        )
        psm = ref_mag / (mix_mag + EPS) * cos
        lo, hi = (0.0, 1.0) if mask_type == "PSM" else (0.0, jnp.inf)
        return jnp.clip(psm, lo, hi)
    raise ValueError(f"unsupported mask type {mask_type}")


def tf_mse_loss(ref, est, lengths: Optional[jnp.ndarray] = None):
    """Masked MSE over TF bins, (B,) (`tf_domain.py` FrequencyDomainMSE)."""
    if lengths is None:
        m = jnp.ones(ref.shape[:2], ref.dtype)
    else:
        m = (jnp.arange(ref.shape[1])[None, :] < lengths[:, None]).astype(ref.dtype)
    cnt = jnp.maximum(jnp.sum(m, -1) * ref.shape[-1], 1.0)
    return jnp.sum(((ref - est) ** 2) * m[..., None], axis=(1, 2)) / cnt


def dpcl_loss(
    embedding: jnp.ndarray,      # (B, T*F, D) unit-norm embeddings
    ref_masks: jnp.ndarray,      # (B, T*F, n_spk) one-hot dominance labels
) -> jnp.ndarray:
    """Deep-clustering affinity loss (`tf_domain.py` FrequencyDomainDPCL,
    Hershey et al. 2016): || V V^T - Y Y^T ||_F^2 expanded to avoid the
    (TF x TF) Gram matrices."""
    vtv = jnp.einsum("bnd,bne->bde", embedding, embedding)
    vty = jnp.einsum("bnd,bns->bds", embedding, ref_masks)
    yty = jnp.einsum("bns,bnt->bst", ref_masks, ref_masks)
    return (
        jnp.sum(vtv ** 2, axis=(1, 2))
        - 2.0 * jnp.sum(vty ** 2, axis=(1, 2))
        + jnp.sum(yty ** 2, axis=(1, 2))
    )


def mixit_solve(
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    refs: jnp.ndarray,           # (B, n_ref, n) mixtures-of-references
    ests: jnp.ndarray,           # (B, n_est, n) separated estimates
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixture-invariant training (`wrappers/mixit_solver.py:13`): assign
    each estimate to one of the n_ref mixtures, sum assigned estimates,
    score against the mixtures, keep the best assignment. Returns
    (best mean loss (B,), best assignment (B, n_est) -> mixture index)."""
    b, n_ref, n = refs.shape
    n_est = ests.shape[1]
    assignments = list(itertools.product(range(n_ref), repeat=n_est))
    losses = []
    for asm in assignments:
        mat = jnp.asarray(
            np.eye(n_ref, dtype=np.float32)[np.asarray(asm)].T
        )  # (n_ref, n_est)
        mixed = jnp.einsum("ri,bin->brn", mat, ests)
        per_ref = jnp.stack(
            [loss_fn(refs[:, r], mixed[:, r]) for r in range(n_ref)], axis=1
        )
        losses.append(jnp.mean(per_ref, axis=1))
    losses = jnp.stack(losses, axis=1)               # (B, A)
    best = jnp.argmin(losses, axis=1)
    best_loss = jnp.take_along_axis(losses, best[:, None], 1)[:, 0]
    asm_arr = jnp.asarray(assignments)               # (A, n_est)
    return best_loss, asm_arr[best]
