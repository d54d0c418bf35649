"""Transformer-TTS: autoregressive transformer encoder-decoder TTS.

Behavioral spec: reference `espnet/nets/pytorch_backend/e2e_tts_transformer.py`
(Transformer encoder over tokens; mel prenet + causal transformer decoder
with cross attention; feat_out (n_mels*r) + prob_out stop token; postnet
residual; Tacotron2Loss (L1+MSE+weighted BCE)). The reference's optional
guided-attention-on-cross-attention term is not carried over (our MHA does
not expose per-head maps); the loss set is the default configuration.

TPU formulation: teacher-forced training is one batched program; AR
inference runs a `lax.while_loop` over decoder steps with per-layer KV
caches (the same cache machinery as the ASR transformer decoder,
`models/transformer.py` score_step).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.embedding import add_positional_encoding, sinusoidal_table
from espnet_tpu.models.transformer import (
    PositionwiseFeedForward, TransformerDecoderLayer, TransformerEncoderLayer,
)
from espnet_tpu.models.tts.fastspeech2 import Postnet
from espnet_tpu.ops.masks import attention_bias, make_valid_mask, subsequent_mask


@dataclasses.dataclass(frozen=True)
class TransformerTTSConfig:
    vocab_size: int = -1
    # "text" (token ids) or "feats" (continuous frames — the Voice
    # Transformer Network VC use, `espnet/nets/pytorch_backend/
    # e2e_vc_transformer.py:1`, encoder input layer "linear")
    input_type: str = "text"
    input_dim: int = 80
    n_mels: int = 80
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    prenet_units: int = 256
    prenet_layers: int = 2
    prenet_dropout: float = 0.5
    postnet_layers: int = 5
    postnet_channels: int = 256
    reduction_factor: int = 1
    bce_pos_weight: float = 5.0
    dropout_rate: float = 0.1
    max_frames: int = 1000
    stop_threshold: float = 0.5
    dtype: Any = jnp.float32


class MelPrenet(nn.Module):
    """Bottleneck prenet on previous mel frames (`decoder prenet` in
    e2e_tts_transformer; always-on dropout like Tacotron2's prenet)."""

    units: int
    layers: int
    out_dim: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, dropout_rng=None):
        for i in range(self.layers):
            x = nn.relu(nn.Dense(self.units, dtype=self.dtype,
                                 name=f"fc{i}")(x))
            if dropout_rng is not None:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, i), 1.0 - self.dropout,
                    x.shape,
                )
                x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)


class TransformerTTS(nn.Module):
    config: TransformerTTSConfig

    def setup(self):
        c = self.config
        if c.input_type == "feats":
            self.embed = nn.Dense(c.d_model, dtype=c.dtype, name="in_proj")
        else:
            self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype)
        self.enc_layers = [
            TransformerEncoderLayer(c.d_model, c.num_heads, c.d_ff,
                                    c.dropout_rate, dtype=c.dtype,
                                    name=f"enc{i}")
            for i in range(c.num_encoder_layers)
        ]
        self.enc_norm = nn.LayerNorm(dtype=c.dtype)
        self.prenet = MelPrenet(c.prenet_units, c.prenet_layers, c.d_model,
                                c.prenet_dropout, c.dtype)
        self.dec_layers = [
            TransformerDecoderLayer(c.d_model, c.num_heads, c.d_ff,
                                    c.dropout_rate, dtype=c.dtype,
                                    name=f"dec{i}")
            for i in range(c.num_decoder_layers)
        ]
        self.dec_norm = nn.LayerNorm(dtype=c.dtype)
        self.feat_out = nn.Dense(c.n_mels * c.reduction_factor, dtype=c.dtype)
        self.prob_out = nn.Dense(c.reduction_factor, dtype=c.dtype)
        self.postnet = Postnet(c.n_mels, c.postnet_channels,
                               c.postnet_layers, dtype=c.dtype)

    def encoder(self, text, text_lengths, deterministic: bool = True):
        x = add_positional_encoding(self.embed(text))
        bias = attention_bias(
            make_valid_mask(text_lengths, text.shape[1])[:, None, None, :]
        )
        for layer in self.enc_layers:
            x = layer(x, bias, deterministic)
        return self.enc_norm(x)

    def _decode_teacher(self, memory, mem_lengths, dec_in, deterministic,
                        prenet_rng):
        """dec_in (B, n_dec, n_mels): previous-group frames."""
        n_dec = dec_in.shape[1]
        x = add_positional_encoding(self.prenet(dec_in, prenet_rng))
        causal = subsequent_mask(n_dec)
        self_bias = attention_bias(causal[None, None])
        mem_bias = attention_bias(
            make_valid_mask(mem_lengths, memory.shape[1])[:, None, None, :]
        )
        for layer in self.dec_layers:
            x = layer(x, self_bias, memory, mem_bias, deterministic)
        x = self.dec_norm(x)
        return self.feat_out(x), self.prob_out(x)

    def __call__(self, text, text_lengths, mel, mel_lengths,
                 deterministic: bool = True):
        c = self.config
        r = c.reduction_factor
        b, t, _ = mel.shape
        n_dec = t // r
        memory = self.encoder(text, text_lengths, deterministic)
        teacher = mel[:, r - 1::r][:, :-1]
        teacher = jnp.concatenate(
            [jnp.zeros((b, 1, c.n_mels), mel.dtype), teacher], axis=1
        )
        rng = None if deterministic else self.make_rng("prenet")
        feats, probs = self._decode_teacher(
            memory, text_lengths, teacher, deterministic, rng
        )
        mel_before = feats.reshape(b, n_dec * r, c.n_mels)[:, :t]
        mel_post = mel_before + self.postnet(mel_before, deterministic)
        stop_logits = probs.reshape(b, n_dec * r)[:, :t]

        fmask = make_valid_mask(mel_lengths, t).astype(jnp.float32)
        n_el = jnp.maximum(jnp.sum(fmask), 1.0) * c.n_mels
        l1 = (jnp.sum(jnp.abs(mel_before - mel) * fmask[..., None])
              + jnp.sum(jnp.abs(mel_post - mel) * fmask[..., None])) / n_el
        mse = (jnp.sum(((mel_before - mel) ** 2) * fmask[..., None])
               + jnp.sum(((mel_post - mel) ** 2) * fmask[..., None])) / n_el
        stop_target = (
            jnp.arange(t)[None, :] == (mel_lengths - 1)[:, None]
        ).astype(jnp.float32)
        bce_w = jnp.where(stop_target > 0, c.bce_pos_weight, 1.0)
        logp = jax.nn.log_sigmoid(stop_logits)
        log1mp = jax.nn.log_sigmoid(-stop_logits)
        bce = -(stop_target * logp * bce_w + (1 - stop_target) * log1mp)
        bce = jnp.sum(bce * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
        loss = l1 + mse + bce
        stats = {"l1_loss": l1, "mse_loss": mse, "bce_loss": bce,
                 "loss": loss}
        return loss, stats, mel_post

    def inference(self, text, text_lengths,
                  max_frames: Optional[int] = None):
        """AR decode with KV caches under `lax.while_loop`."""
        c = self.config
        r = c.reduction_factor
        n_dec_max = (max_frames or c.max_frames) // r
        b = text.shape[0]
        memory = self.encoder(text, text_lengths, True)
        mem_bias = attention_bias(
            make_valid_mask(text_lengths, memory.shape[1])[:, None, None, :]
        )
        h, dk = c.num_heads, c.d_model // c.num_heads
        z = jnp.zeros((b, h, n_dec_max, dk), c.dtype)
        caches = [{"k": z, "v": z} for _ in range(c.num_decoder_layers)]
        pe = jnp.asarray(sinusoidal_table(n_dec_max, c.d_model))

        def cond(s):
            step, done, *_ = s
            return (step < n_dec_max) & ~jnp.all(done)

        def body(s):
            step, done, prev_frame, caches, frames, lens = s
            x = self.prenet(prev_frame[:, None], None)  # (B, 1, D)
            x = x * jnp.sqrt(jnp.asarray(c.d_model, x.dtype))
            x = x + jax.lax.dynamic_slice(
                pe, (step, 0), (1, c.d_model)
            )[None].astype(x.dtype)
            new_caches = []
            for layer, cache in zip(self.dec_layers, caches):
                x, nc = layer(x, None, memory, mem_bias, True,
                              cache=cache, cache_index=step)
                new_caches.append(nc)
            x = self.dec_norm(x)
            feat = self.feat_out(x)[:, 0].reshape(b, r, c.n_mels)
            prob = jax.nn.sigmoid(self.prob_out(x)[:, 0])  # (B, r)
            stop = jnp.any(prob > c.stop_threshold, axis=-1)
            frames = jax.lax.dynamic_update_slice(
                frames, feat[:, None], (0, step, 0, 0)
            )
            new_done = done | stop
            lens = jnp.where(done, lens, (step + 1) * r)
            return (step + 1, new_done, feat[:, -1], new_caches, frames, lens)

        init = (
            jnp.zeros((), jnp.int32), jnp.zeros((b,), bool),
            jnp.zeros((b, c.n_mels), c.dtype), caches,
            jnp.zeros((b, n_dec_max, r, c.n_mels), c.dtype),
            jnp.zeros((b,), jnp.int32),
        )
        _, done, _, _, frames, lens = jax.lax.while_loop(cond, body, init)
        mel_before = frames.reshape(b, n_dec_max * r, c.n_mels)
        mel_post = mel_before + self.postnet(mel_before, True)
        lens = jnp.where(lens == 0, n_dec_max * r, lens)
        mask = make_valid_mask(lens, n_dec_max * r)[..., None]
        return mel_post * mask.astype(mel_post.dtype), lens
