"""Greedy (best-path) CTC decoding.

Argmax per frame -> collapse repeats -> drop blanks. Device side produces
the framewise argmax (trivially jit/batchable); the collapse runs host-side
per utterance (variable-length output).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def framewise_argmax(log_probs: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(log_probs, axis=-1)


def collapse_ctc(path: np.ndarray, blank_id: int = 0) -> List[int]:
    out: List[int] = []
    prev = -1
    for p in path:
        p = int(p)
        if p != prev and p != blank_id:
            out.append(p)
        prev = p
    return out


def ctc_greedy_decode(
    log_probs, lengths, blank_id: int = 0
) -> List[List[int]]:
    """log_probs: (B, T, V); lengths: (B,). Returns token id lists."""
    paths = np.asarray(framewise_argmax(log_probs))
    lengths = np.asarray(lengths)
    return [
        collapse_ctc(paths[i, : lengths[i]], blank_id)
        for i in range(paths.shape[0])
    ]
