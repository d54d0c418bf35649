"""JETS: jointly-trained FastSpeech2 + HiFiGAN text-to-wave GAN with
learned alignment.

Behavioral spec: reference `espnet2/gan_tts/jets/jets.py:42` (JETS wrapper),
`jets/generator.py` (text encoder -> AlignmentModule -> MAS durations +
forward-sum loss -> variance adaptor -> Gaussian upsampling -> decoder ->
HiFiGAN head, random-segment waveform training), `jets/alignments.py`
(AlignmentModule, ForwardSumLoss, viterbi durations) and
`jets/length_regulator.py` (GaussianUpsampling).

TPU-native: MAS reuses the batched `lax.scan` DP from VITS
(`espnet_tpu/models/tts/vits.py:maximum_path`); the forward-sum loss reuses
the CTC forward kernel (`espnet_tpu/ops/ctc.py:ctc_loss_from_log_probs`) —
the classic "alignment learning as CTC" reduction; Gaussian upsampling is
one masked softmax matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.fastspeech2 import (
    VariancePredictor, _FFTBlockStack,
)
from espnet_tpu.models.tts.hifigan import HiFiGANGenerator
from espnet_tpu.models.tts.vits import _slice_segments, maximum_path
from espnet_tpu.ops.ctc import ctc_loss_from_log_probs
from espnet_tpu.ops.masks import make_valid_mask

_NEG = -1e9


class AlignmentModule(nn.Module):
    """Text/feature alignment energies (`jets/alignments.py`
    AlignmentModule): conv-projected text keys and mel queries, negative
    squared distance -> log_softmax over text."""

    adim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_h, feats, text_mask):
        # text_h (B, U, D); feats (B, T, M); text_mask (B, U)
        k = nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype,
                    name="t_conv1")(text_h)
        k = nn.relu(k)
        k = nn.Conv(self.adim, (1,), dtype=self.dtype, name="t_conv2")(k)
        q = nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype,
                    name="f_conv1")(feats)
        q = nn.relu(q)
        q = nn.Conv(self.adim, (3,), padding="SAME", dtype=self.dtype,
                    name="f_conv2")(q)
        q = nn.relu(q)
        q = nn.Conv(self.adim, (1,), dtype=self.dtype, name="f_conv3")(q)
        # -||q_t - k_u||^2 = -|q|^2 + 2 q.k - |k|^2  (B, T, U)
        score = (
            -jnp.sum(q ** 2, -1)[:, :, None]
            + 2.0 * jnp.einsum("btd,bud->btu", q, k)
            - jnp.sum(k ** 2, -1)[:, None, :]
        )
        score = jnp.where(text_mask[:, None, :], score, _NEG)
        return jax.nn.log_softmax(score, axis=-1)  # log_p_attn (B, T, U)


def forward_sum_loss(log_p_attn, text_lengths, feat_lengths):
    """Alignment forward-sum (`jets/alignments.py` ForwardSumLoss): CTC
    over the monotonic alignment lattice — prepend a blank column, targets
    are the token positions 1..U in order."""
    b, t, u = log_p_attn.shape
    # blank column at index 0; token u lives at column u+1
    pad = jnp.full((b, t, 1), -4.0, log_p_attn.dtype)  # weak blank
    log_probs = jnp.concatenate([pad, log_p_attn], axis=-1)
    log_probs = jax.nn.log_softmax(log_probs, axis=-1)
    labels = jnp.broadcast_to(jnp.arange(1, u + 1)[None, :], (b, u))
    nll = ctc_loss_from_log_probs(
        log_probs, labels, feat_lengths, text_lengths, blank_id=0
    )
    return jnp.mean(nll / jnp.maximum(text_lengths, 1))


def gaussian_upsample(hs, durations, feat_lengths, max_frames: int,
                      text_mask, sigma: float = 1.0):
    """(B, U, D) -> (B, T, D) (`jets/length_regulator.py`
    GaussianUpsampling): frame t attends to token u with weight
    softmax_u(-(t - c_u)^2 / sigma), c_u = cumsum(d) - d/2."""
    cum = jnp.cumsum(durations, axis=1)
    centre = cum - 0.5 * durations  # (B, U)
    t_grid = jnp.arange(max_frames, dtype=jnp.float32)[None, :, None]
    energy = -((t_grid - centre[:, None, :]) ** 2) / sigma
    energy = jnp.where(text_mask[:, None, :], energy, _NEG)
    w = jax.nn.softmax(energy, axis=-1)  # (B, T, U)
    out = jnp.einsum("btu,bud->btd", w, hs)
    fmask = make_valid_mask(feat_lengths, max_frames)[..., None]
    return out * fmask.astype(out.dtype)


def average_by_path(x_frame, path, durations):
    """Frame-level scalar (B, T) -> token means (B, U) using the 0/1
    alignment path (B, T, U) (`jets/generator.py` average_by_duration)."""
    s = jnp.einsum("bt,btu->bu", x_frame, path)
    return s / jnp.maximum(durations, 1.0)


@dataclasses.dataclass(frozen=True)
class JETSConfig:
    vocab_size: int = -1
    n_mels: int = 80
    adim: int = 256
    num_heads: int = 2
    d_ff: int = 1024
    encoder_layers: int = 4
    decoder_layers: int = 4
    predictor_layers: int = 2
    predictor_channels: int = 256
    predictor_kernel: int = 3
    # HiFiGAN head; prod(upsample_scales) must equal the mel hop_length
    decoder_channels: int = 512
    upsample_scales: Tuple[int, ...] = (8, 8, 2, 2)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    segment_frames: int = 32
    max_frames: int = 1000   # inference bound
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32


class JETSGenerator(nn.Module):
    """`jets/generator.py` JETSGenerator."""

    config: JETSConfig

    def setup(self):
        c = self.config
        self.embed = nn.Embed(c.vocab_size, c.adim, dtype=c.dtype)
        self.encoder = _FFTBlockStack(c.adim, c.num_heads, c.d_ff,
                                      c.encoder_layers, c.dropout_rate,
                                      c.dtype, name="encoder")
        self.decoder = _FFTBlockStack(c.adim, c.num_heads, c.d_ff,
                                      c.decoder_layers, c.dropout_rate,
                                      c.dtype, name="decoder")
        self.alignment = AlignmentModule(c.adim, c.dtype, name="alignment")
        pk = dict(channels=c.predictor_channels, layers=c.predictor_layers,
                  kernel=c.predictor_kernel, dropout_rate=0.5, dtype=c.dtype)
        self.duration_predictor = VariancePredictor(**pk, name="duration")
        self.pitch_predictor = VariancePredictor(**pk, name="pitch")
        self.energy_predictor = VariancePredictor(**pk, name="energy")
        self.pitch_embed = nn.Conv(c.adim, (9,), padding="SAME",
                                   dtype=c.dtype, name="pitch_embed")
        self.energy_embed = nn.Conv(c.adim, (9,), padding="SAME",
                                    dtype=c.dtype, name="energy_embed")
        self.wav_decoder = HiFiGANGenerator(
            in_channels=c.adim, channels=c.decoder_channels,
            upsample_scales=c.upsample_scales,
            resblock_kernel_sizes=c.resblock_kernel_sizes, dtype=c.dtype,
        )

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.config.upsample_scales))

    def __call__(self, tokens, text_lengths, feats, feat_lengths,
                 pitch, energy, deterministic: bool = True):
        """Training forward. feats = groundtruth log-mel (B, T, M);
        pitch/energy = frame-level targets (B, T). RNG streams: 'segment',
        'dropout'. Returns the dict the GAN step consumes."""
        c = self.config
        tmask = make_valid_mask(text_lengths, tokens.shape[1])
        hs = self.encoder(self.embed(tokens), text_lengths, deterministic)
        log_p_attn = self.alignment(hs, feats, tmask)
        path = maximum_path(
            jax.lax.stop_gradient(log_p_attn), feat_lengths, text_lengths
        )
        ds = jnp.sum(path, axis=1)  # (B, U)
        # token-level variance targets from the alignment
        p_tgt = average_by_path(pitch, path, ds)
        e_tgt = average_by_path(energy, path, ds)
        d_pred = self.duration_predictor(hs, tmask, deterministic)
        p_pred = self.pitch_predictor(hs, tmask, deterministic)
        e_pred = self.energy_predictor(hs, tmask, deterministic)
        hs = hs + self.pitch_embed(p_tgt[..., None])
        hs = hs + self.energy_embed(e_tgt[..., None])
        t_max = feats.shape[1]
        up = gaussian_upsample(hs, ds, feat_lengths, t_max, tmask)
        hd = self.decoder(up, feat_lengths, deterministic)
        # random segment -> waveform head (as VITS `generator.py`)
        seg = c.segment_frames
        max_start = jnp.maximum(feat_lengths - seg, 0)
        u = jax.random.uniform(self.make_rng("segment"), (hd.shape[0],))
        starts = (u * (max_start + 1)).astype(jnp.int32)
        hd_seg = _slice_segments(hd, starts, seg)
        wav_seg = self.wav_decoder(hd_seg)
        return {
            "wav_seg": wav_seg[..., 0],
            "seg_starts": starts,
            "log_p_attn": log_p_attn,
            "durations": ds,
            "d_pred": d_pred, "p_pred": p_pred, "e_pred": e_pred,
            "p_tgt": p_tgt, "e_tgt": e_tgt,
            "text_mask": tmask.astype(jnp.float32),
        }

    def inference(self, tokens, text_lengths):
        """Text -> waveform with predicted variances
        (`jets/generator.py` inference)."""
        c = self.config
        tmask = make_valid_mask(text_lengths, tokens.shape[1])
        hs = self.encoder(self.embed(tokens), text_lengths, True)
        d_pred = self.duration_predictor(hs, tmask, True)
        p_pred = self.pitch_predictor(hs, tmask, True)
        e_pred = self.energy_predictor(hs, tmask, True)
        dur = jnp.clip(jnp.round(jnp.exp(d_pred) - 1.0), 0, None)
        dur = dur * tmask
        hs = hs + self.pitch_embed(p_pred[..., None])
        hs = hs + self.energy_embed(e_pred[..., None])
        feat_lengths = jnp.minimum(
            jnp.sum(dur, axis=1), c.max_frames
        ).astype(jnp.int32)
        up = gaussian_upsample(hs, dur, feat_lengths, c.max_frames, tmask)
        hd = self.decoder(up, feat_lengths, True)
        wav = self.wav_decoder(hd)[..., 0]
        return wav, feat_lengths * self.upsample_factor
