"""Singing voice synthesis: XiaoiceSing-style acoustic model.

Behavioral spec: reference `espnet2/svs/espnet_model.py:85`
(ESPnetSVSModel: on-device feats extract + the svs module over score
inputs) and `espnet2/svs/xiaoice/XiaoiceSing.py` (FastSpeech-style:
phone + midi-pitch + duration embeddings -> FFT encoder -> duration
predictor + length regulator -> FFT decoder -> mel (+postnet), losses =
mel L1 + duration MSE (+vuv/f0 in the full model)).

Score representation: per-phone MIDI note id (`midi`), per-phone target
frames (`durations`) — the muskit-derived layout of
`espnet2/svs/espnet_model.py` (label/midi/duration_phn streams).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import GlobalMVN
from espnet_tpu.models.tts.fastspeech2 import (
    Postnet, VariancePredictor, _FFTBlockStack, length_regulate,
)
from espnet_tpu.ops.masks import make_valid_mask
from espnet_tpu.ops.stft import log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class XiaoiceSingConfig:
    vocab_size: int = -1
    midi_size: int = 129          # MIDI note ids 0..127 + rest
    n_mels: int = 80
    d_model: int = 256
    num_heads: int = 2
    d_ff: int = 1024
    encoder_layers: int = 4
    decoder_layers: int = 4
    predictor_layers: int = 2
    predictor_channels: int = 256
    predictor_kernel: int = 3
    postnet_layers: int = 5
    postnet_channels: int = 256
    dropout_rate: float = 0.1
    max_frames: int = 2048
    dtype: Any = jnp.float32


class XiaoiceSing(nn.Module):
    """`espnet2/svs/xiaoice/XiaoiceSing.py` equivalent."""

    config: XiaoiceSingConfig

    def setup(self):
        c = self.config
        self.phone_embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype)
        self.midi_embed = nn.Embed(c.midi_size, c.d_model, dtype=c.dtype)
        self.dur_embed = nn.Dense(c.d_model, dtype=c.dtype)
        self.encoder = _FFTBlockStack(c.d_model, c.num_heads, c.d_ff,
                                      c.encoder_layers, c.dropout_rate,
                                      c.dtype, name="encoder")
        self.decoder = _FFTBlockStack(c.d_model, c.num_heads, c.d_ff,
                                      c.decoder_layers, c.dropout_rate,
                                      c.dtype, name="decoder")
        self.duration_predictor = VariancePredictor(
            channels=c.predictor_channels, layers=c.predictor_layers,
            kernel=c.predictor_kernel, dropout_rate=0.5, dtype=c.dtype,
            name="duration",
        )
        self.mel_out = nn.Dense(c.n_mels, dtype=c.dtype, name="mel_out")
        self.postnet = Postnet(c.n_mels, c.postnet_channels,
                               c.postnet_layers, c.dtype, name="postnet")

    @staticmethod
    def _fit(x, u):
        """Align the midi/duration streams to the (possibly differently
        padded) text grid."""
        if x.shape[1] < u:
            return jnp.pad(x, ((0, 0), (0, u - x.shape[1])))
        return x[:, :u]

    def _encode(self, text, midi, durations, text_lengths, deterministic):
        h = (self.phone_embed(text)
             + self.midi_embed(midi)
             + self.dur_embed(
                 jnp.log1p(durations.astype(jnp.float32))[..., None]))
        return self.encoder(h, text_lengths, deterministic)

    def __call__(self, text, midi, durations, text_lengths,
                 mel, mel_lengths, deterministic: bool = True):
        c = self.config
        midi = self._fit(midi, text.shape[1])
        durations = self._fit(durations, text.shape[1])
        hs = self._encode(text, midi, durations, text_lengths,
                          deterministic)
        tmask = make_valid_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(hs, tmask, deterministic)
        hs_exp, _ = length_regulate(hs, durations, mel.shape[1])
        hd = self.decoder(hs_exp, mel_lengths, deterministic)
        mel_before = self.mel_out(hd)
        mel_post = mel_before + self.postnet(mel_before, deterministic)
        fmask = make_valid_mask(mel_lengths, mel.shape[1])[..., None].astype(
            jnp.float32)
        n_el = jnp.maximum(jnp.sum(fmask), 1.0) * c.n_mels
        l1 = (jnp.sum(jnp.abs(mel_before - mel) * fmask)
              + jnp.sum(jnp.abs(mel_post - mel) * fmask)) / n_el
        tm = tmask.astype(jnp.float32)
        n_tok = jnp.maximum(jnp.sum(tm), 1.0)
        log_d_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(((d_pred - log_d_tgt) ** 2) * tm) / n_tok
        loss = l1 + dur_loss
        stats = {"loss": loss, "l1_loss": l1, "duration_loss": dur_loss}
        return loss, stats, mel_post

    def inference(self, text, midi, durations, text_lengths,
                  use_score_durations: bool = True):
        """Score -> mel. With use_score_durations the note-aligned frame
        counts from the score are used (the usual SVS setting); otherwise
        predicted durations."""
        c = self.config
        midi = self._fit(midi, text.shape[1])
        durations = self._fit(durations, text.shape[1])
        hs = self._encode(text, midi, durations, text_lengths, True)
        tmask = make_valid_mask(text_lengths, text.shape[1])
        if use_score_durations:
            dur = durations
        else:
            d_pred = self.duration_predictor(hs, tmask, True)
            dur = jnp.clip(jnp.round(jnp.exp(d_pred) - 1.0), 0, None)
            dur = (dur * tmask).astype(jnp.int32)
        hs_exp, out_lens = length_regulate(hs, dur, c.max_frames)
        hd = self.decoder(hs_exp, out_lens, True)
        mel_before = self.mel_out(hd)
        mel_post = mel_before + self.postnet(mel_before, True)
        fmask = make_valid_mask(out_lens, c.max_frames)[..., None]
        return mel_post * fmask.astype(mel_post.dtype), out_lens


@dataclasses.dataclass(frozen=True)
class SVSTaskConfig:
    svs_type: str = "xiaoice"
    vocab_size: int = -1
    fs: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    fmin: float = 80.0
    fmax: Optional[float] = 7600.0
    normalize: str = "global_mvn"
    xiaoice: Optional[XiaoiceSingConfig] = None


class SVSModel(nn.Module):
    """ESPnetSVSModel equivalent (`espnet2/svs/espnet_model.py:85`):
    mel extraction on device + the SVS module."""

    config: SVSTaskConfig

    def setup(self):
        c = self.config
        if c.svs_type != "xiaoice":
            raise ValueError(f"unknown svs_type {c.svs_type}")
        self.svs = XiaoiceSing(c.xiaoice)
        if c.normalize == "global_mvn":
            self.mvn = GlobalMVN(c.n_mels)

    def extract_feats(self, speech, speech_lengths):
        c = self.config
        mel, mel_lengths = log_mel_spectrogram(
            speech, speech_lengths, c.fs, c.n_fft, c.hop_length, None,
            c.n_mels, c.fmin, c.fmax,
        )
        if c.normalize == "global_mvn":
            mel = self.mvn(mel, mel_lengths)
        return mel, mel_lengths

    def __call__(self, text, text_lengths, midi, durations,
                 speech, speech_lengths, deterministic: bool = True):
        mel, mel_lengths = self.extract_feats(speech, speech_lengths)
        loss, stats, _ = self.svs(text, midi, durations, text_lengths,
                                  mel, mel_lengths, deterministic)
        return loss, stats

    def inference(self, text, text_lengths, midi, durations):
        return self.svs.inference(text, midi, durations, text_lengths)
