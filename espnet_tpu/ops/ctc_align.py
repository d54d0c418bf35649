"""CTC forced alignment (batched Viterbi over the extended label lattice).

Behavioral spec: reference `espnet/nets/pytorch_backend/ctc.py:163`
(forced_align: numpy Viterbi over blank-interleaved labels, one utterance
at a time) and the CTC-segmentation CLI `espnet2/bin/asr_align.py`.

TPU formulation: the whole batch aligns in one jitted program — a forward
`lax.scan` over time storing per-cell argmax choices, then a reverse scan
backtrack (same device-side DP pattern as the VITS monotonic alignment).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from espnet_tpu.ops.ctc import (
    _extended_labels, _label_log_probs, _transition_mask,
)

NEG = -1.0e30


def ctc_forced_align(
    log_probs: jnp.ndarray,      # (B, T, V) log-softmax CTC outputs
    labels: jnp.ndarray,         # (B, U)
    input_lengths: jnp.ndarray,  # (B,)
    label_lengths: jnp.ndarray,  # (B,)
    blank_id: int = 0,
) -> jnp.ndarray:
    """Returns per-frame token ids (B, T): the Viterbi state's symbol
    (blank_id on blank states and on padded frames)."""
    b, t_max, _ = log_probs.shape
    ext = _extended_labels(labels, blank_id)            # (B, S) S=2U+1
    s_dim = ext.shape[1]
    emit = _label_log_probs(log_probs, ext)             # (T, B, S)
    skip_ok = _transition_mask(ext)                     # (B, S) allow s-2
    s_idx = jnp.arange(s_dim)[None, :]
    valid_s = s_idx < (2 * label_lengths + 1)[:, None]

    def shift1(x):
        return jnp.concatenate([jnp.full((b, 1), NEG), x[:, :-1]], axis=1)

    def shift2(x):
        return jnp.concatenate([jnp.full((b, 2), NEG), x[:, :-2]], axis=1)

    # t = 0: states 0 and 1 only
    delta0 = jnp.where(s_idx <= 1, emit[0], NEG)
    delta0 = jnp.where(valid_s, delta0, NEG)

    def step(delta, inputs):
        emit_t, t = inputs
        stay = delta
        diag = shift1(delta)
        skip = jnp.where(skip_ok, shift2(delta), NEG)
        stacked = jnp.stack([stay, diag, skip], axis=0)   # (3, B, S)
        choice = jnp.argmax(stacked, axis=0)              # (B, S)
        best = jnp.max(stacked, axis=0)
        new = jnp.where(valid_s, best + emit_t, NEG)
        new = jnp.where((t < input_lengths)[:, None], new, delta)
        active = (t < input_lengths)[:, None]
        return new, jnp.where(active, choice, 0)

    ts = jnp.arange(1, t_max)
    last, choices = jax.lax.scan(
        step, delta0, (emit[1:], ts)
    )  # choices: (T-1, B, S)

    # best final state: argmax over {2U, 2U-1}
    bi = jnp.arange(b)
    s_last = 2 * label_lengths
    s_prev = jnp.maximum(s_last - 1, 0)
    end_state = jnp.where(
        last[bi, s_last] >= last[bi, s_prev], s_last, s_prev
    )

    # backtrack over time (reverse scan)
    def back(carry, inputs):
        state = carry
        choice_t, t = inputs                              # choices for step t
        active = t < input_lengths                        # frame t valid
        started = t == (input_lengths - 1)
        state = jnp.where(started, end_state, state)
        out_state = jnp.where(active, state, 0)
        # move to the previous frame's state
        c = choice_t[bi, state]
        prev_state = state - c
        new_state = jnp.where(active & (t > 0), prev_state, state)
        return new_state, out_state

    ts_rev = jnp.arange(t_max - 1, 0, -1)
    state_t0, states_rev = jax.lax.scan(
        back, jnp.zeros((b,), jnp.int32),
        (choices[::-1], ts_rev),
    )
    states = jnp.concatenate(
        [state_t0[None], states_rev[::-1]], axis=0
    ).T  # (B, T)
    frame_ids = jnp.take_along_axis(ext, states, axis=1)
    valid_t = jnp.arange(t_max)[None, :] < input_lengths[:, None]
    return jnp.where(valid_t, frame_ids, blank_id)


def alignment_to_segments(
    frame_ids, labels, label_lengths, frame_shift_s: float
):
    """Host-side: per-frame ids -> [(token_id, start_s, end_s)] per utt
    (asr_align output form). Consecutive frames of the same non-blank
    Viterbi token form one segment."""
    import numpy as np

    frame_ids = np.asarray(frame_ids)
    out = []
    for bi in range(frame_ids.shape[0]):
        segs = []
        cur = None
        for t, tok in enumerate(frame_ids[bi]):
            tok = int(tok)
            if cur is not None and tok == cur[0]:
                cur[2] = t + 1
                continue
            if cur is not None and cur[0] != 0:
                segs.append(tuple(cur))
            cur = [tok, t, t + 1]
        if cur is not None and cur[0] != 0:
            segs.append(tuple(cur))
        out.append([
            (tok, s * frame_shift_s, e * frame_shift_s)
            for tok, s, e in segs
        ])
    return out
