"""v1-style chunk streaming wrappers: window and segment recognisers.

Behavioral spec: reference `espnet/nets/pytorch_backend/streaming/window.py:6`
(WindowStreamingE2E: feed audio windows through the encoder carrying the
RNN state, accumulate encoder states + CTC posteriors, run the attention
decoder offline at the end) and `streaming/segment.py:5`
(SegmentStreamingE2E: CTC-argmax voice-activity gating — start collecting
at the first non-blank, decode a segment once `min_blank_dur` consecutive
blank frames are seen, then reset with an onset-margin tail carried over).

TPU division of labour: each incoming chunk is ONE jitted call
(frontend -> unidirectional VGG-LSTM encoder resuming from the carried
LSTM state -> CTC log-softmax); the endpointing logic is a tiny host loop
over per-chunk argmax vectors (a few bytes per chunk), and each detected
segment is decoded with the same batched device-side beam search program
as offline inference (`Speech2Text._search_from_memory`).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.asr_inference import Speech2Text


class _ChunkEncoder:
    """Shared chunked-encode machinery: one jitted step per chunk shape."""

    def __init__(self, s2t: Speech2Text):
        if s2t.model.config.encoder_type != "vgg_lstm":
            raise ValueError(
                "streaming wrappers need encoder_type=vgg_lstm "
                "(unidirectional, chunk-carryable)"
            )
        self.s2t = s2t
        model, variables = s2t.model, s2t.variables

        def step(speech, lengths, carry):
            enc, elens, new_carry = model.apply(
                variables, speech, lengths, carry,
                method=type(model).encode_chunk,
            )
            lp = model.apply(
                variables, enc, method=type(model).ctc_log_probs
            )
            return enc, elens, lp, new_carry

        self._step = jax.jit(step)
        self._search = jax.jit(s2t._search_from_memory)
        self.carry = jax.tree_util.tree_map(
            jnp.asarray, model.apply(
                variables, 1, method=type(model).encoder_carry
            )
        )

    def encode_chunk(self, samples: np.ndarray):
        """samples: (N,) waveform chunk. Returns (enc (t, D), ctc_lp (t, V))
        as numpy, advancing the carried LSTM state."""
        speech = jnp.asarray(samples, jnp.float32)[None, :]
        lengths = jnp.asarray([samples.shape[0]], jnp.int32)
        enc, elens, lp, self.carry = self._step(speech, lengths, self.carry)
        t = int(elens[0])
        return np.asarray(enc[0, :t]), np.asarray(lp[0, :t])

    def reset_carry(self):
        self.carry = jax.tree_util.tree_map(jnp.zeros_like, self.carry)

    def decode_memory(self, enc: np.ndarray, ctc_lp: np.ndarray):
        """Beam-search one segment of encoder memory; returns the n-best
        lists like Speech2Text.__call__ (host-side conversion)."""
        yseq, ylen, score = self._search(
            jnp.asarray(enc, jnp.float32)[None],
            jnp.asarray([enc.shape[0]], jnp.int32),
            jnp.asarray(ctc_lp, jnp.float32)[None]
            if self.s2t.cfg.ctc_weight > 0 else None,
        )
        yseq, ylen, score = map(np.asarray, (yseq, ylen, score))
        hyps = []
        for wi in range(yseq.shape[1]):
            ids = yseq[0, wi, : ylen[0, wi]].tolist()
            hyps.append((ids, float(score[0, wi])))
        return hyps

    def ids_to_text(self, ids: List[int]) -> str:
        s2t = self.s2t
        tokens = s2t.converter.ids2tokens(ids) if s2t.converter else []
        return s2t.tokenizer.tokens2text(tokens) if s2t.tokenizer else ""


class WindowStreamingASR:
    """Half-streaming recogniser (`window.py:6` WindowStreamingE2E): the
    encoder and CTC run online per window; the attention decode runs
    offline over everything accumulated."""

    def __init__(self, s2t: Speech2Text):
        assert s2t.cfg.ctc_weight > 0.0, (
            "WindowStreamingASR works only with joint CTC/attention"
        )
        self._enc = _ChunkEncoder(s2t)
        self._encoder_states: List[np.ndarray] = []
        self._ctc_posteriors: List[np.ndarray] = []

    def accept_input(self, samples: np.ndarray) -> None:
        """Call once per incoming audio window (`window.py:31`)."""
        enc, lp = self._enc.encode_chunk(samples)
        self._encoder_states.append(enc)
        self._ctc_posteriors.append(lp)

    def decode_with_attention_offline(self):
        """Offline attention decode over all accepted audio
        (`window.py:68`). Returns [(ids, score), ...] n-best."""
        enc = np.concatenate(self._encoder_states, axis=0)
        lp = np.concatenate(self._ctc_posteriors, axis=0)
        return self._enc.decode_memory(enc, lp)

    def hypothesis_text(self) -> str:
        hyps = self.decode_with_attention_offline()
        return self._enc.ids_to_text(hyps[0][0])


class SegmentStreamingASR:
    """Fully-online segment recogniser (`segment.py:5` SegmentStreamingE2E):
    CTC-argmax endpointing emits a decoded hypothesis per detected speech
    segment."""

    def __init__(
        self,
        s2t: Speech2Text,
        min_blank_dur: int = 4,      # streaming_min_blank_dur
        onset_margin: int = 8,       # streaming_onset_margin (enc frames)
        offset_margin: int = 2,      # streaming_offset_margin (enc frames)
        blank_id: int = 0,
    ):
        self._enc = _ChunkEncoder(s2t)
        self.min_blank_dur = min_blank_dur
        self.onset_margin = onset_margin
        self.offset_margin = offset_margin
        self.blank_id = blank_id
        self._activated = False
        self._blank_dur = 0
        self._encoder_states: List[np.ndarray] = []
        self._ctc_posteriors: List[np.ndarray] = []
        self._prev_samples = np.zeros((0,), np.float32)
        # samples per encoder frame: hop * conv subsampling (VGG2L = 4)
        c = s2t.model.config
        self._samples_per_frame = c.hop_length * 4

    def accept_input(self, samples: np.ndarray) -> Optional[list]:
        """Feed a chunk; returns the n-best [(ids, score), ...] when a
        segment endpoint fires, else None (`segment.py:42`)."""
        samples = np.asarray(samples, np.float32)
        self._prev_samples = np.concatenate([self._prev_samples, samples])
        enc, lp = self._enc.encode_chunk(samples)
        z = lp.argmax(axis=-1)

        if not self._activated and (z != self.blank_id).any():
            # onset: re-run the encoder from zero state on the tail so the
            # segment start is not polluted by pre-speech state
            # (`segment.py:54`)
            self._activated = True
            tail = self._samples_per_frame * (self.onset_margin + 1)
            self._enc.reset_carry()
            enc, lp = self._enc.encode_chunk(self._prev_samples[-tail:])
            z = lp.argmax(axis=-1)

        hyp = None
        if self._activated:
            self._encoder_states.append(enc)
            self._ctc_posteriors.append(lp)
            # trailing blank run within everything collected so far
            zcat = np.concatenate(
                [p.argmax(-1) for p in self._ctc_posteriors]
            )
            run = 0
            for v in zcat[::-1]:
                if v != self.blank_id:
                    break
                run += 1
            self._blank_dur = run
            if self._blank_dur >= self.min_blank_dur:
                enc_all = np.concatenate(self._encoder_states, axis=0)
                lp_all = np.concatenate(self._ctc_posteriors, axis=0)
                seg_len = (
                    enc_all.shape[0] - self._blank_dur + self.offset_margin
                )
                if seg_len > 0:
                    hyp = self._enc.decode_memory(
                        enc_all[:seg_len], lp_all[:seg_len]
                    )
                self._activated = False
                self._blank_dur = 0
                self._encoder_states = []
                self._ctc_posteriors = []
                tail = self._samples_per_frame * self.onset_margin
                self._prev_samples = self._prev_samples[-tail:] if tail else \
                    np.zeros((0,), np.float32)
        return hyp

    def ids_to_text(self, ids: List[int]) -> str:
        return self._enc.ids_to_text(ids)
