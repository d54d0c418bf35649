"""HuBERT-style masked-prediction SSL pretraining.

Behavioral spec: reference `espnet2/hubert/espnet_model.py`
(HubertPretrainModel `:266` / TorchAudioHubertPretrainModel `:36`: frame
features -> span masking with a learned mask embedding -> transformer
encoder -> per-frame classification against k-means cluster pseudo-labels;
loss = pred_masked_weight * CE(masked) + pred_nomask_weight * CE(unmasked),
`espnet2/hubert/hubert_loss.py:18`) and the fairseq span-mask policy
(mask_prob spans of mask_length frames).

TPU formulation: span masks are built by a Bernoulli of span *starts*
dilated with a max-pool of width mask_length — fully batched, no python
loops; the k-means quantiser used for pseudo-labels lives in
`espnet_tpu/ops/kmeans.py` (host-side numpy, recipe stage 1 equivalent of
the reference's `egs2/*/ssl1` label generation).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.transformer import TransformerEncoderLayer
from espnet_tpu.models.embedding import add_positional_encoding
from espnet_tpu.ops.masks import attention_bias, make_valid_mask
from espnet_tpu.ops.normalize import utterance_mvn
from espnet_tpu.ops.stft import log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    num_classes: int = 100       # k-means clusters
    input_type: str = "raw"
    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    n_mels: int = 80
    normalize: str = "utterance_mvn"
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    num_encoder_layers: int = 6
    dropout_rate: float = 0.1
    mask_prob: float = 0.08      # probability a frame STARTS a mask span
    mask_length: int = 10
    pred_masked_weight: float = 1.0
    pred_nomask_weight: float = 0.0
    dtype: Any = jnp.float32


class HubertModel(nn.Module):
    config: HubertConfig

    def setup(self):
        c = self.config
        self.in_proj = nn.Dense(c.d_model, dtype=c.dtype)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(1.0), (c.d_model,)
        )
        self.encoder_layers = [
            TransformerEncoderLayer(
                c.d_model, c.num_heads, c.d_ff, c.dropout_rate, dtype=c.dtype,
                name=f"layer{i}",
            )
            for i in range(c.num_encoder_layers)
        ]
        self.after_norm = nn.LayerNorm(dtype=c.dtype)
        self.final_proj = nn.Dense(c.num_classes, dtype=c.dtype)

    def _frontend(self, speech, speech_lengths):
        c = self.config
        if c.input_type == "raw":
            feats, flens = log_mel_spectrogram(
                speech, speech_lengths, c.fs, c.n_fft, c.hop_length, None,
                c.n_mels,
            )
        else:
            feats, flens = speech, speech_lengths
        if c.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, flens)
        return feats, flens

    def _span_mask(self, key, shape, valid):
        """Bernoulli span starts dilated to mask_length-wide spans."""
        c = self.config
        starts = jax.random.uniform(key, shape) < c.mask_prob
        starts = starts & valid
        # dilate: frame t masked iff a start within the last mask_length
        window = c.mask_length
        x = starts.astype(jnp.float32)[:, :, None]
        dil = jax.lax.reduce_window(
            x, 0.0, jax.lax.max, (1, window, 1), (1, 1, 1),
            [(0, 0), (window - 1, 0), (0, 0)],
        )[:, :, 0]
        return (dil > 0) & valid

    def encode(self, speech, speech_lengths, mask=None,
               deterministic: bool = True):
        feats, flens = self._frontend(speech, speech_lengths)
        x = self.in_proj(feats)
        if mask is not None:
            x = jnp.where(mask[:, :, None], self.mask_emb[None, None], x)
        x = add_positional_encoding(x)
        bias = attention_bias(
            make_valid_mask(flens, x.shape[1])[:, None, None, :]
        )
        for layer in self.encoder_layers:
            x = layer(x, bias, deterministic)
        return self.after_norm(x), flens

    def __call__(self, speech, speech_lengths, labels,
                 deterministic: bool = True):
        """labels: (B, T_frames) k-means ids on the frontend frame grid."""
        c = self.config
        feats, flens = self._frontend(speech, speech_lengths)
        valid = make_valid_mask(flens, feats.shape[1])
        key = (self.make_rng("mask") if not deterministic
               else jax.random.PRNGKey(0))
        mask = self._span_mask(key, valid.shape, valid)
        enc, _ = self.encode(speech, speech_lengths, mask, deterministic)
        logits = self.final_proj(enc).astype(jnp.float32)
        t = min(logits.shape[1], labels.shape[1])
        logits, labels_t = logits[:, :t], labels[:, :t]
        mask_t, valid_t = mask[:, :t], valid[:, :t]
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, labels_t[..., None], -1)[..., 0]

        def masked_mean(region):
            w = region.astype(jnp.float32)
            return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss_m = masked_mean(mask_t & valid_t)
        loss_u = masked_mean(~mask_t & valid_t)
        loss = (c.pred_masked_weight * loss_m
                + c.pred_nomask_weight * loss_u)
        pred = jnp.argmax(logits, -1)
        acc_m = jnp.sum((pred == labels_t) & mask_t & valid_t) / jnp.maximum(
            jnp.sum(mask_t & valid_t), 1
        )
        stats = {"loss": loss, "loss_masked": loss_m,
                 "loss_unmasked": loss_u, "acc_masked": acc_m,
                 "mask_ratio": jnp.mean(mask_t.astype(jnp.float32))}
        return loss, stats
