"""Multi-speaker (mixture) ASR with permutation-invariant training.

Behavioral spec: reference `espnet/nets/pytorch_backend/e2e_asr_mix.py`
(E2E for 2-speaker mixtures: shared encoder front + per-speaker encoder
branches = `encoder_mix.py`; PIT over speaker permutations decided by the
per-utterance CTC loss (`pit.py` PIT class, min_pit_sample); attention
decoder applied per stream with the CTC-chosen permutation) and
`e2e_asr_mix_transformer.py`.

TPU formulation: all permutations' CTC losses are computed in one batched
program (S! is tiny), argmin picks the permutation, and the attention loss
gathers the permuted targets — no data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import add_sos_eos
from espnet_tpu.models.conformer import ConformerBlock
from espnet_tpu.models.embedding import rel_position_encoding
from espnet_tpu.models.subsampling import Conv2dSubsampling
from espnet_tpu.models.transformer import TransformerDecoder
from espnet_tpu.ops.ctc import ctc_loss_from_log_probs
from espnet_tpu.ops.losses import label_smoothing_loss, token_accuracy
from espnet_tpu.ops.masks import attention_bias, make_valid_mask
from espnet_tpu.ops.normalize import utterance_mvn
from espnet_tpu.ops.specaug import specaug
from espnet_tpu.ops.stft import log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class ASRMixConfig:
    vocab_size: int
    num_spk: int = 2
    input_type: str = "raw"
    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    n_mels: int = 80
    use_specaug: bool = True
    normalize: str = "utterance_mvn"
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    num_shared_layers: int = 4    # encoder_sd in the reference
    num_branch_layers: int = 4    # per-speaker recognition layers
    subsampling_factor: int = 4
    conformer_kernel_size: int = 15
    num_decoder_layers: int = 4
    decoder_d_ff: int = 1024
    ctc_weight: float = 0.5
    lsm_weight: float = 0.1
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @property
    def sos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1


class MixEncoder(nn.Module):
    """Shared conformer front + per-speaker branches
    (`encoder_mix.py` EncoderMix)."""

    config: ASRMixConfig

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True):
        c = self.config
        x, olens = Conv2dSubsampling(
            c.d_model, c.subsampling_factor, dtype=c.dtype, name="embed",
        )(feats, lengths)
        x = x * jnp.asarray(c.d_model ** 0.5, x.dtype)
        t = x.shape[1]
        pos_emb = rel_position_encoding(t, c.d_model, c.dtype)
        pad_mask = make_valid_mask(olens, t)
        bias = attention_bias(pad_mask[:, None, None, :])
        for i in range(c.num_shared_layers):
            x = ConformerBlock(
                c.d_model, c.num_heads, c.d_ff, c.conformer_kernel_size,
                c.dropout_rate, "layer", c.dtype, name=f"shared{i}",
            )(x, pos_emb, bias, pad_mask, deterministic)
        branches = []
        for s in range(c.num_spk):
            h = x
            for i in range(c.num_branch_layers):
                h = ConformerBlock(
                    c.d_model, c.num_heads, c.d_ff,
                    c.conformer_kernel_size, c.dropout_rate, "layer",
                    c.dtype, name=f"spk{s}_layer{i}",
                )(h, pos_emb, bias, pad_mask, deterministic)
            branches.append(h)
        return jnp.stack(branches, axis=1), olens  # (B, S, T', D)


class ASRMixModel(nn.Module):
    """E2E mixture ASR (`e2e_asr_mix.py:64` equivalent)."""

    config: ASRMixConfig

    def setup(self):
        c = self.config
        self.encoder = MixEncoder(c, name="encoder")
        self.ctc_head = nn.Dense(c.vocab_size, dtype=c.dtype,
                                 name="ctc_head")
        if c.ctc_weight < 1.0:
            self.decoder = TransformerDecoder(
                vocab_size=c.vocab_size, d_model=c.d_model,
                num_heads=c.num_heads, d_ff=c.decoder_d_ff,
                num_layers=c.num_decoder_layers,
                dropout_rate=c.dropout_rate, dtype=c.dtype,
            )

    def _frontend(self, speech, speech_lengths, deterministic):
        c = self.config
        feats, flens = log_mel_spectrogram(
            speech, speech_lengths, c.fs, c.n_fft, c.hop_length, None,
            c.n_mels,
        )
        if c.use_specaug and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, flens)
        if c.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, flens)
        return feats, flens

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        feats, flens = self._frontend(speech, speech_lengths, deterministic)
        return self.encoder(feats, flens, deterministic)

    def ctc_log_probs(self, encoder_out):
        return jax.nn.log_softmax(
            self.ctc_head(encoder_out).astype(jnp.float32), axis=-1
        )

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = True):
        """text: (B, S, U) per-speaker transcripts (or the collate layout
        (B, U, S) — detected and transposed); text_lengths (B, S)."""
        c = self.config
        if text.ndim == 3 and text.shape[1] != c.num_spk \
                and text.shape[2] == c.num_spk:
            text = text.transpose(0, 2, 1)
        enc, elens = self.encode(speech, speech_lengths, deterministic)
        b, s_spk, t, _ = enc.shape
        log_probs = self.ctc_log_probs(
            enc.reshape(b * s_spk, t, -1)
        ).reshape(b, s_spk, t, -1)

        # per-(branch, target) CTC loss matrix (B, S, S)
        pair_losses = []
        for i in range(s_spk):
            row = []
            for j in range(s_spk):
                row.append(ctc_loss_from_log_probs(
                    log_probs[:, i], text[:, j], elens,
                    text_lengths[:, j], blank_id=0,
                ))
            pair_losses.append(jnp.stack(row, axis=1))
        pair = jnp.stack(pair_losses, axis=1)  # (B, S, S)

        perms = list(itertools.permutations(range(s_spk)))
        perm_losses = jnp.stack(
            [sum(pair[:, i, p[i]] for i in range(s_spk)) / s_spk
             for p in perms], axis=1,
        )  # (B, P)
        best = jnp.argmin(perm_losses, axis=1)  # (B,)
        loss_ctc = jnp.mean(
            jnp.take_along_axis(perm_losses, best[:, None], 1)[:, 0]
        )
        perm_mat = jnp.asarray(perms)[best]  # (B, S): target for branch i

        stats: Dict[str, jnp.ndarray] = {"loss_ctc": loss_ctc}
        loss_att = 0.0
        if c.ctc_weight < 1.0:
            # gather permuted targets: branch i decodes text[perm[i]]
            text_p = jnp.take_along_axis(
                text, perm_mat[:, :, None], axis=1
            )
            tlen_p = jnp.take_along_axis(text_lengths, perm_mat, axis=1)
            accs = []
            att_losses = []
            for i in range(s_spk):
                ys_in, ys_out, ys_lens = add_sos_eos(
                    text_p[:, i], tlen_p[:, i], c.sos_id, c.eos_id
                )
                logits = self.decoder(
                    ys_in, ys_lens, enc[:, i], elens, deterministic
                )
                valid = make_valid_mask(ys_lens, ys_in.shape[1])
                att_losses.append(
                    label_smoothing_loss(logits, ys_out, valid,
                                         c.lsm_weight)
                )
                accs.append(token_accuracy(logits, ys_out, valid))
            loss_att = sum(att_losses) / s_spk
            stats["loss_att"] = loss_att
            stats["acc"] = sum(accs) / s_spk
        loss = c.ctc_weight * loss_ctc + (1.0 - c.ctc_weight) * loss_att
        stats["loss"] = loss
        return loss, stats
