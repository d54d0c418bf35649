"""Joint enhancement + ASR model (enh_s2t).

Behavioral spec: reference `espnet2/enh/espnet_enh_s2t_model.py`
(ESPnetEnhS2TModel: an enhancement front-end chained into a speech task
back-end; loss = total_loss_weight-combined enh loss (when references are
present) + ASR loss on the enhanced signal; `bypass_enh_prob` optionally
skips the front-end during training).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRConfig, ASRModel
from espnet_tpu.models.enh import EnhancementModel, EnhConfig


@dataclasses.dataclass(frozen=True)
class EnhS2TConfig:
    enh: EnhConfig = EnhConfig(num_spk=1)
    asr: Optional[ASRConfig] = None
    enh_weight: float = 0.2      # weight of the enhancement criterion
    bypass_enh_prob: float = 0.0 # train-time prob of feeding the raw mix

    # Speech2Text reads these off model.config — delegate to the ASR side
    @property
    def sos_id(self) -> int:
        return self.asr.sos_id

    @property
    def eos_id(self) -> int:
        return self.asr.eos_id

    @property
    def vocab_size(self) -> int:
        return self.asr.vocab_size

    @property
    def decoder_type(self) -> str:
        return self.asr.decoder_type


class EnhS2TModel(nn.Module):
    config: EnhS2TConfig

    def setup(self):
        self.enh = EnhancementModel(self.config.enh)
        self.asr = ASRModel(self.config.asr)

    def enhance(self, speech_mix, speech_lengths, deterministic: bool = True):
        est, _ = self.enh.forward_enhance(
            speech_mix, speech_lengths, deterministic
        )
        return est[:, 0]  # single target speaker

    def __call__(self, speech_mix, speech_mix_lengths, text, text_lengths,
                 speech_ref=None, deterministic: bool = True):
        c = self.config
        enhanced = self.enhance(speech_mix, speech_mix_lengths, deterministic)
        if not deterministic and c.bypass_enh_prob > 0:
            key = self.make_rng("bypass")
            bypass = jax.random.bernoulli(
                key, c.bypass_enh_prob, (speech_mix.shape[0], 1)
            )
            enhanced = jnp.where(bypass, speech_mix, enhanced)
        loss_asr, stats = self.asr(
            enhanced, speech_mix_lengths, text, text_lengths, deterministic
        )
        stats = {f"asr_{k}": v for k, v in stats.items()}
        loss = loss_asr
        if speech_ref is not None and c.enh_weight > 0:
            if speech_ref.ndim == 2:
                speech_ref = speech_ref[..., None]
            loss_enh, enh_stats = self.enh(
                speech_mix, speech_mix_lengths, speech_ref, deterministic
            )
            stats.update({f"enh_{k}": v for k, v in enh_stats.items()})
            loss = (1.0 - c.enh_weight) * loss + c.enh_weight * loss_enh
        stats["loss"] = loss
        return loss, stats

    def encode(self, speech_mix, speech_lengths, deterministic: bool = True):
        """Enhance + ASR encode — Speech2Text-compatible."""
        enhanced = self.enhance(speech_mix, speech_lengths, deterministic)
        return self.asr.encode(enhanced, speech_lengths, deterministic)

    def ctc_log_probs(self, encoder_out):
        return self.asr.ctc_log_probs(encoder_out)

    def decoder_score_step(self, tokens_step, pos, memory, memory_lengths,
                           cache):
        return self.asr.decoder_score_step(tokens_step, pos, memory,
                                           memory_lengths, cache)

    def decoder_init_cache(self, batch, max_len, memory=None,
                           memory_lengths=None):
        return self.asr.decoder_init_cache(batch, max_len, memory,
                                           memory_lengths)
