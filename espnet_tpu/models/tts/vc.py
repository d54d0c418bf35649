"""Voice conversion model: source mel -> Tacotron2 -> target mel.

Behavioral spec: reference `espnet/nets/pytorch_backend/e2e_vc_tacotron2.py`
(Tacotron2 whose encoder consumes source-speaker acoustic frames; loss and
AR decoding identical to TTS Tacotron2) and the VC trainer
`espnet/vc/pytorch_backend/vc.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.tts.tacotron2 import Tacotron2, Tacotron2Config
from espnet_tpu.models.tts.transformer_tts import (
    TransformerTTS, TransformerTTSConfig,
)
from espnet_tpu.ops.stft import log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class VCTaskConfig:
    fs: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: Optional[int] = None
    n_mels: int = 80
    fmin: float = 80.0
    fmax: Optional[float] = 7600.0
    # "tacotron2" (`e2e_vc_tacotron2.py`) or "transformer" — the Voice
    # Transformer Network (`espnet/nets/pytorch_backend/e2e_vc_transformer.py:1`)
    vc_type: str = "tacotron2"
    tacotron2: Optional[Tacotron2Config] = None
    transformer: Optional[TransformerTTSConfig] = None


class VCModel(nn.Module):
    config: VCTaskConfig

    def setup(self):
        if self.config.vc_type == "transformer":
            tcfg = self.config.transformer or TransformerTTSConfig()
            if tcfg.input_type != "feats":
                import dataclasses as _dc

                tcfg = _dc.replace(tcfg, input_type="feats",
                                   input_dim=self.config.n_mels,
                                   n_mels=self.config.n_mels)
            self.tts = TransformerTTS(tcfg)
        else:
            self.tts = Tacotron2(self.config.tacotron2)

    def extract_feats(self, speech, speech_lengths):
        c = self.config
        return log_mel_spectrogram(
            speech, speech_lengths, c.fs, c.n_fft, c.hop_length,
            c.win_length, c.n_mels, c.fmin, c.fmax,
        )

    def __call__(self, src_speech, src_speech_lengths, speech,
                 speech_lengths, deterministic: bool = True):
        c = self.config
        src_mel, src_lens = self.extract_feats(src_speech, src_speech_lengths)
        tgt_mel, tgt_lens = self.extract_feats(speech, speech_lengths)
        r = self.tts.config.reduction_factor
        if r > 1:
            t = (tgt_mel.shape[1] // r) * r
            tgt_mel = tgt_mel[:, :t]
            tgt_lens = jnp.minimum((tgt_lens // r) * r, t)
        loss, stats, _ = self.tts(src_mel, src_lens, tgt_mel, tgt_lens,
                                  deterministic)
        return loss, stats

    def inference(self, src_speech, src_speech_lengths,
                  max_frames: Optional[int] = None):
        src_mel, src_lens = self.extract_feats(src_speech, src_speech_lengths)
        out = self.tts.inference(src_mel, src_lens, max_frames)
        return out[0], out[1]
