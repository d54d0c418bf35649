"""TTS task model: feats extraction + normalisation + TTS module.

Behavioral spec: reference `espnet2/tts/espnet_model.py:28` (ESPnetTTSModel
forward:52 — run feats_extract (LogMelFbank) on raw speech, optional
pitch/energy extract, normalize, then the tts module) — so recipes feed raw
wav and the mel target is computed on device, matching the ASR frontend's
numerics (`tts/feats_extract/log_mel_fbank.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import GlobalMVN
from espnet_tpu.models.tts.fastspeech2 import FastSpeech2, FastSpeech2Config
from espnet_tpu.models.tts.tacotron2 import Tacotron2, Tacotron2Config
from espnet_tpu.models.tts.prodiff import ProDiff, ProDiffConfig
from espnet_tpu.models.tts.transformer_tts import (
    TransformerTTS, TransformerTTSConfig,
)
from espnet_tpu.ops.stft import log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class TTSTaskConfig:
    tts_type: str = "tacotron2"  # tacotron2 | fastspeech2 | transformer | prodiff
    vocab_size: int = -1
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: Optional[int] = None
    n_mels: int = 80
    fmin: float = 80.0
    fmax: Optional[float] = 7600.0
    normalize: str = "global_mvn"  # global_mvn | none
    # passthrough dicts are flattened into the sub-configs by the task
    tacotron2: Optional[Tacotron2Config] = None
    fastspeech2: Optional[FastSpeech2Config] = None
    transformer: Optional[TransformerTTSConfig] = None
    prodiff: Optional[ProDiffConfig] = None


class TTSModel(nn.Module):
    config: TTSTaskConfig

    def setup(self):
        c = self.config
        if c.tts_type == "tacotron2":
            self.tts = Tacotron2(c.tacotron2)
        elif c.tts_type == "fastspeech2":
            self.tts = FastSpeech2(c.fastspeech2)
        elif c.tts_type == "transformer":
            self.tts = TransformerTTS(c.transformer)
        elif c.tts_type == "prodiff":
            self.tts = ProDiff(c.prodiff)
        else:
            raise ValueError(f"unknown tts_type {c.tts_type}")
        if c.normalize == "global_mvn":
            self.mvn = GlobalMVN(c.n_mels)

    def extract_feats(self, speech, speech_lengths):
        c = self.config
        mel, mel_lengths = log_mel_spectrogram(
            speech, speech_lengths, c.fs, c.n_fft, c.hop_length,
            c.win_length, c.n_mels, c.fmin, c.fmax,
        )
        if c.normalize == "global_mvn":
            mel = self.mvn(mel, mel_lengths)
        return mel, mel_lengths

    def _fit_reduction(self, mel, mel_lengths):
        c = self.config
        if c.tts_type in ("tacotron2", "transformer"):
            sub = c.tacotron2 if c.tts_type == "tacotron2" else c.transformer
            r = sub.reduction_factor
            if r > 1:
                t = (mel.shape[1] // r) * r
                mel = mel[:, :t]
                mel_lengths = jnp.minimum((mel_lengths // r) * r, t)
        return mel, mel_lengths

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        durations: Optional[jnp.ndarray] = None,
        pitch: Optional[jnp.ndarray] = None,
        energy: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        sids: Optional[jnp.ndarray] = None,
        lids: Optional[jnp.ndarray] = None,
        spembs: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        c = self.config
        mel, mel_lengths = self.extract_feats(speech, speech_lengths)
        mel, mel_lengths = self._fit_reduction(mel, mel_lengths)
        spk = dict(sids=sids, lids=lids, spembs=spembs)
        if c.tts_type == "tacotron2":
            loss, stats, _ = self.tts(text, text_lengths, mel, mel_lengths,
                                      deterministic, **spk)
        elif c.tts_type == "transformer":
            loss, stats, _ = self.tts(text, text_lengths, mel, mel_lengths,
                                      deterministic)
        else:
            if durations is None:
                raise ValueError(
                    f"{c.tts_type} training requires durations")
            b, u = text.shape
            z = jnp.zeros((b, u), jnp.float32)
            extra = spk if c.tts_type == "fastspeech2" else {}
            loss, stats, _ = self.tts(
                text, text_lengths, mel, mel_lengths, durations,
                pitch if pitch is not None else z,
                energy if energy is not None else z,
                deterministic, **extra,
            )
        return loss, stats

    def inference(self, text, text_lengths, max_frames: Optional[int] = None,
                  sids=None, lids=None, spembs=None):
        """Returns (mel, lengths) in the *normalised* domain; callers
        denormalise with the mvn stats before vocoding."""
        if self.config.tts_type == "tacotron2":
            mel, lens, _ = self.tts.inference(text, text_lengths, max_frames,
                                              sids=sids, lids=lids,
                                              spembs=spembs)
            return mel, lens
        if self.config.tts_type == "transformer":
            return self.tts.inference(text, text_lengths, max_frames)
        if self.config.tts_type == "prodiff":
            return self.tts.inference(text, text_lengths, max_frames)
        return self.tts.inference(text, text_lengths, sids=sids, lids=lids,
                                  spembs=spembs)
