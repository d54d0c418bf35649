"""VISinger: VITS-based end-to-end singing voice synthesis.

Behavioral spec: reference `espnet2/gan_svs/vits/` (VISinger generator:
score-conditioned text encoder (phone + MIDI + duration embeddings), a
*frame prior network* refining the phone-level prior expanded by the score
durations — no MAS, the score gives the alignment — posterior
encoder/flow/HiFiGAN decoder as in VITS; duration predictor regressed to
the score durations).

TPU-native: shares the VITS building blocks
(`espnet_tpu/models/tts/vits.py`); the score expansion is the same masked
one-hot matmul as the TTS length regulator.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.embedding import add_positional_encoding
from espnet_tpu.models.transformer import TransformerEncoderLayer
from espnet_tpu.models.tts.fastspeech2 import length_regulate
from espnet_tpu.models.tts.hifigan import HiFiGANGenerator
from espnet_tpu.models.tts.vits import (
    DurationPredictor, PosteriorEncoder, ResidualCouplingBlock, VITSConfig,
    _slice_segments,
)
from espnet_tpu.ops.masks import attention_bias, make_valid_mask


@dataclasses.dataclass(frozen=True)
class VISingerConfig:
    vits: VITSConfig = VITSConfig()
    midi_size: int = 129
    frame_prior_layers: int = 3


class ScoreTextEncoder(nn.Module):
    """Phone + MIDI + duration -> hidden + phone-level prior stats
    (`gan_svs/vits/text_encoder.py` with score embeddings)."""

    vocab_size: int
    midi_size: int
    channels: int = 192
    num_heads: int = 2
    d_ff: int = 768
    num_layers: int = 6
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, midi, durations, lengths,
                 deterministic: bool = True):
        x = (nn.Embed(self.vocab_size, self.channels, dtype=self.dtype,
                      name="embed")(tokens)
             + nn.Embed(self.midi_size, self.channels, dtype=self.dtype,
                        name="midi_embed")(midi)
             + nn.Dense(self.channels, dtype=self.dtype, name="dur_embed")(
                 jnp.log1p(durations.astype(jnp.float32))[..., None]))
        x = add_positional_encoding(x)
        bias = attention_bias(
            make_valid_mask(lengths, tokens.shape[1])[:, None, None, :]
        )
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.channels, self.num_heads, self.d_ff, self.dropout_rate,
                dtype=self.dtype, name=f"layer{i}",
            )(x, bias, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        stats = nn.Conv(2 * self.channels, (1,), dtype=self.dtype,
                        name="proj")(x)
        m, logs = jnp.split(stats, 2, axis=-1)
        return x, m, logs


class FramePriorNetwork(nn.Module):
    """Refines the frame-expanded prior (`gan_svs/vits/` frame prior
    net): conv stack over the expanded prior mean/logstd."""

    channels: int
    layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, m, logs, fmask):
        h = jnp.concatenate([m, logs], axis=-1)
        for i in range(self.layers):
            h = nn.Conv(2 * self.channels, (5,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
        h = nn.Conv(2 * self.channels, (1,), dtype=self.dtype,
                    name="proj")(h)
        dm, dlogs = jnp.split(h, 2, axis=-1)
        mask = fmask.astype(m.dtype)
        return (m + dm) * mask, (logs + dlogs) * mask


class VISingerGenerator(nn.Module):
    """`gan_svs/vits/generator.py` equivalent."""

    config: VISingerConfig

    def setup(self):
        c = self.config.vits
        self.text_encoder = ScoreTextEncoder(
            c.vocab_size, self.config.midi_size, c.channels, c.text_heads,
            c.text_d_ff, c.text_layers, c.dropout_rate, c.dtype,
        )
        self.frame_prior = FramePriorNetwork(
            c.channels, self.config.frame_prior_layers, c.dtype,
        )
        self.posterior_encoder = PosteriorEncoder(
            c.spec_dim, c.channels, c.channels, layers=c.posterior_layers,
            dtype=c.dtype,
        )
        self.flow = ResidualCouplingBlock(
            c.channels, c.channels, c.flows, layers=c.flow_layers,
            dtype=c.dtype,
        )
        self.duration_predictor = DurationPredictor(dtype=c.dtype)
        self.decoder = HiFiGANGenerator(
            in_channels=c.channels, channels=c.decoder_channels,
            upsample_scales=c.upsample_scales,
            resblock_kernel_sizes=c.resblock_kernel_sizes, dtype=c.dtype,
        )

    def _prior(self, tokens, midi, durations, text_lengths, t_frames,
               deterministic):
        h_text, m_p, logs_p = self.text_encoder(
            tokens, midi, durations, text_lengths, deterministic
        )
        # score alignment: expand phone-level stats to the frame grid
        m_exp, feat_lengths = length_regulate(m_p, durations, t_frames)
        logs_exp, _ = length_regulate(logs_p, durations, t_frames)
        fmask = make_valid_mask(feat_lengths, t_frames)[..., None]
        m_exp, logs_exp = self.frame_prior(m_exp, logs_exp, fmask)
        return h_text, m_exp, logs_exp, feat_lengths, fmask

    def __call__(self, tokens, midi, durations, text_lengths,
                 spec, spec_lengths, deterministic: bool = True):
        """Training forward; same output contract as VITSGenerator so the
        GAN step only differs in the score inputs."""
        c = self.config.vits
        h_text, m_p_exp, logs_p_exp, _, _ = self._prior(
            tokens, midi, durations, text_lengths, spec.shape[1],
            deterministic,
        )
        z, m_q, logs_q = self.posterior_encoder(
            spec, spec_lengths, self.make_rng("posterior")
        )
        feat_mask = make_valid_mask(spec_lengths, spec.shape[1])[..., None]
        z_p = self.flow(z, feat_mask.astype(z.dtype), reverse=False)

        text_mask = make_valid_mask(text_lengths, tokens.shape[1]).astype(
            z.dtype
        )
        log_dur_pred = self.duration_predictor(
            h_text, text_mask, deterministic
        )
        log_dur_tgt = jnp.log(durations.astype(jnp.float32) + 1e-8) \
            * text_mask

        seg = c.segment_frames
        max_start = jnp.maximum(spec_lengths - seg, 0)
        u = jax.random.uniform(self.make_rng("segment"), (z.shape[0],))
        starts = (u * (max_start + 1)).astype(jnp.int32)
        z_seg = _slice_segments(z, starts, seg)
        wav_seg = self.decoder(z_seg)
        return {
            "wav_seg": wav_seg[..., 0],
            "seg_starts": starts,
            "z_p": z_p, "m_p_exp": m_p_exp, "logs_p_exp": logs_p_exp,
            "m_q": m_q, "logs_q": logs_q,
            "log_dur_pred": log_dur_pred, "log_dur_tgt": log_dur_tgt,
            "durations": durations.astype(jnp.float32),
            "feat_mask": feat_mask, "text_mask": text_mask,
        }

    def inference(self, tokens, midi, durations, text_lengths,
                  max_frames: int = 1000, noise_scale: float = 0.667):
        """Score -> waveform (score durations give the alignment)."""
        c = self.config.vits
        _, m_exp, logs_exp, feat_lengths, fmask = self._prior(
            tokens, midi, durations, text_lengths, max_frames, True
        )
        rng = self.make_rng("posterior")
        z_p = (
            m_exp + jax.random.normal(rng, m_exp.shape)
            * jnp.exp(logs_exp) * noise_scale
        ) * fmask.astype(m_exp.dtype)
        z = self.flow(z_p, fmask.astype(z_p.dtype), reverse=True)
        wav = self.decoder(z)[..., 0]
        up = int(np.prod(c.upsample_scales))
        return wav, feat_lengths * up
