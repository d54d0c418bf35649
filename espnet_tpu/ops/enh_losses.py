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
