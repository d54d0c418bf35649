"""Speech translation (ST) model: speech encoder -> translation decoder
with auxiliary ASR losses on source transcripts.

Behavioral spec: reference `espnet2/st/espnet_model.py` (ESPnetSTModel:
loss = (1 - asr_weight - mt_weight) * st_att
     + asr_weight * (mtlalpha * src_ctc + (1 - mtlalpha) * src_att)
     + mt_weight * mt_att; sos/eos = vocab-1 for both vocabularies) and v1
`espnet/nets/pytorch_backend/e2e_st_transformer.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRConfig, GlobalMVN, add_sos_eos
from espnet_tpu.models.conformer import ConformerEncoder
from espnet_tpu.models.transformer import TransformerDecoder, TransformerEncoder
from espnet_tpu.ops.ctc import ctc_loss
from espnet_tpu.ops.losses import label_smoothing_loss, token_accuracy
from espnet_tpu.ops.normalize import utterance_mvn
from espnet_tpu.ops.specaug import specaug
from espnet_tpu.ops.stft import log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class STConfig(ASRConfig):
    """vocab_size = target (translation) vocab; src_vocab_size = source."""

    src_vocab_size: int = 0
    asr_weight: float = 0.3      # aux ASR multi-task weight
    mtlalpha: float = 1.0        # within-ASR CTC/attention split
    num_asr_decoder_layers: int = 2

    @property
    def src_sos_id(self) -> int:
        return self.src_vocab_size - 1


class STModel(nn.Module):
    config: STConfig

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
        self.decoder = TransformerDecoder(
            vocab_size=c.vocab_size, d_model=c.d_model, num_heads=c.num_heads,
            d_ff=c.decoder_d_ff, num_layers=c.num_decoder_layers,
            dropout_rate=c.dropout_rate, dtype=c.dtype,
        )
        if c.asr_weight > 0 and c.mtlalpha > 0:
            self.ctc_head = nn.Dense(c.src_vocab_size, dtype=c.dtype)
        if c.asr_weight > 0 and c.mtlalpha < 1.0:
            self.asr_decoder = TransformerDecoder(
                vocab_size=c.src_vocab_size, d_model=c.d_model,
                num_heads=c.num_heads, d_ff=c.decoder_d_ff,
                num_layers=c.num_asr_decoder_layers,
                dropout_rate=c.dropout_rate, dtype=c.dtype,
            )
        if c.normalize == "global_mvn":
            self.mvn = GlobalMVN(c.n_mels)

    def _frontend(self, speech, speech_lengths, deterministic):
        c = self.config
        if c.input_type == "raw":
            feats, flens = log_mel_spectrogram(
                speech, speech_lengths, c.fs, c.n_fft, c.hop_length,
                c.win_length, c.n_mels,
            )
        else:
            feats, flens = speech, speech_lengths
        if c.use_specaug and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, flens)
        if c.normalize == "global_mvn":
            feats = self.mvn(feats, flens)
        elif c.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, flens)
        return feats, flens

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        feats, flens = self._frontend(speech, speech_lengths, deterministic)
        return self.encoder(feats, flens, deterministic)

    def ctc_log_probs(self, encoder_out):
        return jax.nn.log_softmax(
            self.ctc_head(encoder_out).astype(jnp.float32), axis=-1
        )

    def decoder_score_step(self, tokens_step, pos, memory, memory_lengths, cache):
        return self.decoder.score_step(tokens_step, pos, memory,
                                       memory_lengths, cache)

    def decoder_init_cache(self, batch, max_len, memory=None,
                           memory_lengths=None):
        return self.decoder.init_cache(batch, max_len)

    def _att_loss(self, decoder, enc, enc_lengths, text, text_lengths,
                  sos, eos, deterministic):
        from espnet_tpu.ops.masks import make_valid_mask

        c = self.config
        ys_in, ys_out, olens = add_sos_eos(text, text_lengths, sos, eos)
        logits = decoder(ys_in, olens, enc, enc_lengths, deterministic)
        valid = make_valid_mask(olens, ys_in.shape[1])
        loss = label_smoothing_loss(logits, ys_out, valid, c.lsm_weight)
        acc = token_accuracy(logits, ys_out, valid)
        return loss, acc

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 src_text=None, src_text_lengths=None,
                 deterministic: bool = True):
        c = self.config
        enc, enc_lengths = self.encode(speech, speech_lengths, deterministic)
        loss_st, acc = self._att_loss(
            self.decoder, enc, enc_lengths, text, text_lengths,
            c.sos_id, c.eos_id, deterministic,
        )
        stats: Dict[str, jnp.ndarray] = {"loss_st": loss_st, "acc": acc}
        loss = (1.0 - c.asr_weight) * loss_st
        if c.asr_weight > 0 and src_text is not None:
            loss_asr = 0.0
            if c.mtlalpha > 0:
                loss_ctc = ctc_loss(
                    self.ctc_head(enc), src_text, enc_lengths,
                    src_text_lengths, c.blank_id,
                )
                stats["loss_asr_ctc"] = loss_ctc
                loss_asr = loss_asr + c.mtlalpha * loss_ctc
            if c.mtlalpha < 1.0:
                loss_att, asr_acc = self._att_loss(
                    self.asr_decoder, enc, enc_lengths, src_text,
                    src_text_lengths, c.src_sos_id, c.src_sos_id,
                    deterministic,
                )
                stats["loss_asr_att"] = loss_att
                stats["asr_acc"] = asr_acc
                loss_asr = loss_asr + (1.0 - c.mtlalpha) * loss_att
            loss = loss + c.asr_weight * loss_asr
        stats["loss"] = loss
        return loss, stats
