"""Classification losses and metrics.

Behavioral spec: reference
`espnet/nets/pytorch_backend/transformer/label_smoothing_loss.py`
(KL-divergence against an eps-smoothed target distribution, ignore-index
masking, normalised by number of valid tokens) and the `th_accuracy`
helper (`espnet/nets/pytorch_backend/nets_utils.py`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    valid_mask: jnp.ndarray,
    smoothing: float = 0.1,
    normalize_length: bool = False,
) -> jnp.ndarray:
    """KL(smoothed one-hot || softmax(logits)), masked mean.

    logits: (B, U, V); targets: (B, U) int; valid_mask: (B, U) bool.
    normalize_length=False divides by batch size (reference default,
    `label_smoothing_loss.py` normalize_length), True by token count.
    """
    v = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    one_hot = jax.nn.one_hot(targets, v, dtype=jnp.float32)
    true_dist = one_hot * confidence + (1.0 - one_hot) * low
    # KL(p||q) = sum p log p - sum p log q; the entropy term is constant wrt
    # params but the reference includes it (torch KLDivLoss) — keep parity.
    plogp = jnp.sum(jnp.where(true_dist > 0, true_dist * jnp.log(true_dist), 0.0),
                    axis=-1)
    ce = -jnp.sum(true_dist * log_probs, axis=-1)
    kl = (plogp + ce) * valid_mask.astype(jnp.float32)
    denom = jnp.sum(valid_mask) if normalize_length else logits.shape[0]
    return jnp.sum(kl) / jnp.maximum(denom, 1)


def token_accuracy(
    logits: jnp.ndarray, targets: jnp.ndarray, valid_mask: jnp.ndarray
) -> jnp.ndarray:
    """Fraction of valid positions where argmax == target (th_accuracy)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == targets) & valid_mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid_mask), 1)
