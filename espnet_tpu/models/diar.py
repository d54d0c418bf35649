"""Speaker diarization model (SA-EEND).

Behavioral spec: reference `espnet2/diar/espnet_model.py:33`
(ESPnetDiarizationModel: frontend -> encoder -> linear decoder ->
per-speaker frame activity logits; PIT binary cross-entropy over speaker
permutations `pit_loss:301`; stats include DER components
`calc_diarization_error`) with the SA-EEND (no attractor) configuration.
The label aggregator (`espnet2/diar/label_processor.py`) maps sample-level
speaker activity to frame-level targets on the encoder grid.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.conformer import ConformerEncoder
from espnet_tpu.models.transformer import TransformerEncoder
from espnet_tpu.ops.masks import make_valid_mask
from espnet_tpu.ops.normalize import utterance_mvn
from espnet_tpu.ops.specaug import specaug
from espnet_tpu.ops.stft import log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class DiarConfig:
    num_spk: int = 2
    input_type: str = "raw"
    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    n_mels: int = 23
    use_specaug: bool = False
    normalize: str = "utterance_mvn"
    encoder_type: str = "transformer"
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    num_encoder_layers: int = 4
    subsampling_factor: int = 4
    conformer_kernel_size: int = 7
    dropout_rate: float = 0.1
    # EDA (encoder-decoder attractor, `espnet2/diar/attractor/
    # rnn_attractor.py` RnnAttractor): attractors replace the fixed linear
    # decoder; attractor-existence BCE is added to the loss
    use_attractor: bool = False
    attractor_loss_weight: float = 1.0
    dtype: Any = jnp.float32


def pit_bce_loss(
    logits: jnp.ndarray,     # (B, T, S)
    labels: jnp.ndarray,     # (B, T, S) 0/1
    lengths: jnp.ndarray,    # (B,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation-invariant frame BCE (`espnet_model.py pit_loss:301`).

    Returns (per-utterance loss (B,), best label permutation applied to the
    LABELS (B, S))."""
    s = labels.shape[-1]
    mask = make_valid_mask(lengths, logits.shape[1])[..., None]

    def perm_loss(perm):
        lab = labels[..., jnp.asarray(perm)]
        bce = optax_sigmoid_bce(logits, lab)
        return jnp.sum(bce * mask, axis=(1, 2)) / (jnp.maximum(lengths, 1) * s)

    perms = list(itertools.permutations(range(s)))
    losses = jnp.stack([perm_loss(p) for p in perms], axis=1)  # (B, P)
    best = jnp.argmin(losses, axis=1)
    best_loss = jnp.take_along_axis(losses, best[:, None], 1)[:, 0]
    return best_loss, jnp.asarray(perms)[best]


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable sigmoid BCE (same form as torch BCEWithLogits)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def diarization_error_stats(
    logits: jnp.ndarray, labels: jnp.ndarray, lengths: jnp.ndarray,
    threshold: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """DER components (`espnet2/diar/espnet_model.py calc_diarization_error`):
    speaker-wise miss/false-alarm/confusion over valid frames."""
    mask = make_valid_mask(lengths, logits.shape[1])[..., None]
    pred = (jax.nn.sigmoid(logits) > threshold) & mask
    ref = (labels > 0.5) & mask
    n_ref = jnp.sum(ref, axis=-1)            # (B, T) speakers active
    n_sys = jnp.sum(pred, axis=-1)
    t_mask = mask[..., 0]
    res = {}
    speech = (n_ref > 0) & t_mask
    res["speech_scored"] = jnp.sum(speech)
    res["miss"] = jnp.sum(jnp.maximum(n_ref - n_sys, 0) * t_mask)
    res["falarm"] = jnp.sum(jnp.maximum(n_sys - n_ref, 0) * t_mask)
    correct = jnp.sum(ref & pred, axis=-1)
    res["confusion"] = jnp.sum(
        (jnp.minimum(n_ref, n_sys) - correct) * t_mask
    )
    total = jnp.maximum(jnp.sum(n_ref * t_mask), 1)
    res["der"] = (res["miss"] + res["falarm"] + res["confusion"]) / total
    frames = jnp.maximum(jnp.sum(t_mask), 1)
    acc = jnp.sum(jnp.all(pred == ref, axis=-1) & t_mask) / frames
    res["frame_acc"] = acc
    return res


class RnnAttractor(nn.Module):
    """Encoder-decoder attractor calculator
    (`espnet2/diar/attractor/rnn_attractor.py:11`): LSTM-encode the frame
    sequence, then unroll a decoder LSTM on zero inputs to emit one
    attractor per (possible) speaker plus a terminator; a linear probe
    scores attractor existence."""

    unit: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc, num_attractors: int):
        # enc: (B, T, D) -> attractors (B, A, D), existence logits (B, A)
        b = enc.shape[0]
        carry, _ = nn.RNN(
            nn.OptimizedLSTMCell(self.unit), return_carry=True,
            name="encoder_rnn",
        )(enc)
        zeros = jnp.zeros((b, num_attractors, enc.shape[-1]), enc.dtype)
        att = nn.RNN(nn.OptimizedLSTMCell(self.unit), name="decoder_rnn")(
            zeros, initial_carry=carry
        )  # (B, A, unit)
        exist = nn.Dense(1, dtype=self.dtype, name="exist")(att)[..., 0]
        return att, exist


class DiarizationModel(nn.Module):
    config: DiarConfig

    def setup(self):
        c = self.config
        enc_kw = dict(
            d_model=c.d_model, num_heads=c.num_heads, d_ff=c.d_ff,
            num_layers=c.num_encoder_layers, dropout_rate=c.dropout_rate,
            subsampling_factor=c.subsampling_factor, dtype=c.dtype,
        )
        if c.encoder_type == "conformer":
            self.encoder = ConformerEncoder(
                kernel_size=c.conformer_kernel_size, **enc_kw
            )
        else:
            self.encoder = TransformerEncoder(**enc_kw)
        if c.use_attractor:
            self.attractor = RnnAttractor(c.d_model, dtype=c.dtype)
        else:
            self.decoder = nn.Dense(c.num_spk, dtype=c.dtype)

    def _frontend(self, speech, speech_lengths, deterministic):
        c = self.config
        if c.input_type == "raw":
            feats, flens = log_mel_spectrogram(
                speech, speech_lengths, c.fs, c.n_fft, c.hop_length, None,
                c.n_mels,
            )
        else:
            feats, flens = speech, speech_lengths
        if c.use_specaug and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, flens)
        if c.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, flens)
        return feats, flens

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        feats, flens = self._frontend(speech, speech_lengths, deterministic)
        return self.encoder(feats, flens, deterministic)

    def activity_logits(self, speech, speech_lengths,
                        deterministic: bool = True):
        enc, elens = self.encode(speech, speech_lengths, deterministic)
        if self.config.use_attractor:
            logits, _ = self._attractor_logits(enc)
            return logits, elens
        return self.decoder(enc), elens

    def _attractor_logits(self, enc):
        """EDA path (`espnet2/diar/espnet_model.py` attractor branch):
        num_spk attractors + 1 terminator; frame activity = enc . att^T."""
        s = self.config.num_spk
        att, exist = self.attractor(enc, s + 1)
        logits = jnp.einsum("btd,bsd->bts", enc, att[:, :s])
        return logits, exist

    def aggregate_labels(self, spk_labels, enc_frames: int):
        """Sample-level (B, N, S) 0/1 activity -> encoder-frame labels
        (B, T, S) by mean-pooling per frame window (> 0.5 = active);
        equivalent of `espnet2/diar/label_processor.py` LabelAggregate."""
        c = self.config
        samples_per_frame = c.hop_length * c.subsampling_factor
        b, n, s = spk_labels.shape
        need = enc_frames * samples_per_frame
        if n < need:
            spk_labels = jnp.pad(spk_labels, ((0, 0), (0, need - n), (0, 0)))
        else:
            spk_labels = spk_labels[:, :need]
        pooled = spk_labels.reshape(b, enc_frames, samples_per_frame, s)
        return (jnp.mean(pooled, axis=2) > 0.5).astype(jnp.float32)

    def __call__(self, speech, speech_lengths, spk_labels,
                 deterministic: bool = True):
        """spk_labels: (B, N_samples, S) sample-level activity."""
        c = self.config
        enc, elens = self.encode(speech, speech_lengths, deterministic)
        attractor_loss = 0.0
        if c.use_attractor:
            logits, exist = self._attractor_logits(enc)
            # existence targets: [1]*num_spk + [0] (terminator)
            tgt = jnp.concatenate([
                jnp.ones((enc.shape[0], c.num_spk)),
                jnp.zeros((enc.shape[0], 1)),
            ], axis=1)
            attractor_loss = jnp.mean(optax_sigmoid_bce(exist, tgt))
        else:
            logits = self.decoder(enc)
        labels = self.aggregate_labels(spk_labels, logits.shape[1])
        loss_b, perm = pit_bce_loss(logits, labels, elens)
        loss = jnp.mean(loss_b) + c.attractor_loss_weight * attractor_loss
        labels_best = jnp.take_along_axis(labels, perm[:, None, :], axis=2)
        stats = {"loss": loss}
        if c.use_attractor:
            stats["attractor_loss"] = attractor_loss
        stats.update(diarization_error_stats(logits, labels_best, elens))
        return loss, stats
