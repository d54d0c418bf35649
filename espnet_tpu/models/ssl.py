"""Pretrained SSL / Whisper model ingestion (wav2vec2, HuBERT, Whisper).

TPU-native re-design of the reference's external-model integration:

- `espnet2/asr/encoder/wav2vec2_encoder.py` (FairSeqWav2Vec2Encoder) and
  `espnet2/asr/encoder/hubert_encoder.py` — a pretrained convolutional
  feature extractor + transformer used as the ASR encoder.
- `espnet2/asr/frontend/s3prl.py` (S3prlFrontend + Featurizer) — the SSL
  model used as a *frontend*: a learnable softmax-weighted sum over all
  hidden layers feeds a normal downstream encoder.
- `espnet2/asr/encoder/whisper_encoder.py` / `decoder/whisper_decoder.py`
  (OpenAIWhisperEncoder/Decoder) — Whisper's conv-stem transformer encoder
  and its autoregressive decoder.

Instead of wrapping torch hub modules, the architectures are implemented
natively in flax with the exact parameterization of the HuggingFace
`transformers` checkpoints, so any public Wav2Vec2/HuBERT/Whisper torch
checkpoint converts losslessly via `espnet_tpu.train.hf_import` (tested
forward-allclose against `transformers` in tests/test_ssl_import.py).
Everything is static-shape and jit-safe: masks are additive biases, layer
stacks return all hidden states as one stacked array for the featurizer.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from espnet_tpu.ops.masks import make_valid_mask, attention_bias

LN_EPS = 1e-5  # HF torch LayerNorm/GroupNorm default (flax default is 1e-6)


# ---------------------------------------------------------------------------
# wav2vec2 / HuBERT family
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SSLConfig:
    """Matches the HF Wav2Vec2Config/HubertConfig fields we need.

    Defaults are the wav2vec2-base / hubert-base geometry.
    """

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"     # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False   # False=post-LN base, True=large
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    feat_proj_layer_norm: bool = True    # HubertConfig.feat_proj_layer_norm
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32


def ssl_output_lengths(cfg: SSLConfig, input_lengths: jnp.ndarray) -> jnp.ndarray:
    """Frame count after the strided conv extractor (HF `_get_feat_extract_
    output_lengths`): floor((len - kernel) / stride) + 1 per layer."""
    lengths = input_lengths
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    return lengths


class ConvFeatureExtractor(nn.Module):
    """HF Wav2Vec2FeatureEncoder: stack of strided 1-D convs with GELU.

    feat_extract_norm="group": per-channel GroupNorm after the first conv
    only (wav2vec2/hubert base). "layer": LayerNorm after every conv
    (large models).
    """

    cfg: SSLConfig

    @nn.compact
    def __call__(self, wave: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = wave[:, :, None]  # (B, N, 1)
        for i, (dim, k, s) in enumerate(
            zip(c.conv_dim, c.conv_kernel, c.conv_stride)
        ):
            x = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID",
                use_bias=c.conv_bias, dtype=c.dtype, name=f"conv{i}",
            )(x)
            if c.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=LN_EPS, dtype=jnp.float32,
                    name="group_norm",
                )(x.astype(jnp.float32)).astype(x.dtype)
            elif c.feat_extract_norm == "layer":
                x = nn.LayerNorm(
                    epsilon=LN_EPS, dtype=jnp.float32, name=f"norm{i}"
                )(x.astype(jnp.float32)).astype(x.dtype)
            x = jax.nn.gelu(x, approximate=False)
        return x  # (B, T', conv_dim[-1])


class _HFAttention(nn.Module):
    """Standard MHA with the HF (BART-lineage) projection layout: separate
    q/k/v/out Dense layers, per-projection bias flags, q pre-scaled by
    1/sqrt(head_dim)."""

    num_heads: int
    d_model: int
    k_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, bias=None, cache=None, cache_index=None):
        h = self.num_heads
        dk = self.d_model // h

        def proj(x, name, use_bias=True):
            y = nn.Dense(self.d_model, use_bias=use_bias, dtype=self.dtype,
                         name=name)(x)
            b, t = y.shape[0], y.shape[1]
            return y.reshape(b, t, h, dk).transpose(0, 2, 1, 3)

        q = proj(q_in, "q_proj") * (dk ** -0.5)
        k = proj(kv_in, "k_proj", use_bias=self.k_bias)
        v = proj(kv_in, "v_proj")
        new_cache = None
        if cache is not None:
            # incremental decode: write this step's k/v at cache_index
            k = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, 0, cache_index, 0)
            )
            v = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, 0, cache_index, 0)
            )
            new_cache = {"k": k, "v": v}
            t_all = k.shape[2]
            valid = jnp.arange(t_all) <= cache_index
            step_bias = jnp.where(valid, 0.0, -1e9)[None, None, None, :]
            bias = step_bias if bias is None else bias + step_bias
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        if bias is not None:
            scores = scores + bias
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        b, t = o.shape[0], o.shape[2]
        o = o.transpose(0, 2, 1, 3).reshape(b, t, self.d_model)
        o = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(o)
        if cache is not None:
            return o, new_cache
        return o


class _Wav2Vec2Layer(nn.Module):
    cfg: SSLConfig

    @nn.compact
    def __call__(self, x, bias, deterministic: bool = True):
        c = self.cfg
        drop = nn.Dropout(c.dropout_rate)
        if c.do_stable_layer_norm:
            # pre-LN (Wav2Vec2EncoderLayerStableLayerNorm)
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype, name="layer_norm")(x)
            h = _HFAttention(c.num_heads, c.hidden_size, dtype=c.dtype,
                             name="attention")(h, h, bias)
            x = x + drop(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype,
                             name="final_layer_norm")(x)
            h = nn.Dense(c.ffn_size, dtype=c.dtype, name="intermediate_dense")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = drop(h, deterministic=deterministic)
            h = nn.Dense(c.hidden_size, dtype=c.dtype, name="output_dense")(h)
            return x + drop(h, deterministic=deterministic)
        # post-LN (Wav2Vec2EncoderLayer, base models)
        h = _HFAttention(c.num_heads, c.hidden_size, dtype=c.dtype,
                         name="attention")(x, x, bias)
        x = x + drop(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype, name="layer_norm")(x)
        h = nn.Dense(c.ffn_size, dtype=c.dtype, name="intermediate_dense")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = drop(h, deterministic=deterministic)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="output_dense")(h)
        x = x + drop(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype,
                            name="final_layer_norm")(x)


class Wav2Vec2Model(nn.Module):
    """wav2vec2/HuBERT trunk: conv extractor -> projection -> conv-pos
    transformer. Returns all hidden states stacked (num_layers+1, B, T, D)
    plus frame lengths, so callers can use the last layer (encoder use) or
    a learned layer mix (S3PRL-featurizer use)."""

    cfg: SSLConfig

    @nn.compact
    def __call__(self, wave, wave_lengths, deterministic: bool = True):
        c = self.cfg
        feats = ConvFeatureExtractor(c, name="feature_extractor")(wave)
        t = feats.shape[1]
        lengths = jnp.minimum(ssl_output_lengths(c, wave_lengths), t)
        valid = make_valid_mask(lengths, t)  # (B, T)

        # feature_projection
        h = feats
        if c.feat_proj_layer_norm:
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype, name="proj_norm")(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="projection")(h)
        h = h * valid[:, :, None].astype(h.dtype)

        # conv positional embedding (HF Wav2Vec2PositionalConvEmbedding):
        # grouped conv k=num_conv_pos_embeddings pad=k//2 + SamePad trim for
        # even kernels, gelu. The torch weight-norm parametrization is
        # collapsed to a plain kernel at import time (hf_import.py).
        k = c.num_conv_pos_embeddings
        pos = nn.Conv(
            c.hidden_size, (k,), padding=((k // 2, k // 2),),
            feature_group_count=c.num_conv_pos_embedding_groups,
            dtype=c.dtype, name="pos_conv",
        )(h)
        if k % 2 == 0:
            pos = pos[:, :-1]
        h = h + jax.nn.gelu(pos, approximate=False)

        bias = attention_bias(valid[:, None, None, :])
        states = []
        if not c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype, name="norm")(h)
        states.append(h)
        for i in range(c.num_layers):
            h = _Wav2Vec2Layer(c, name=f"layer{i}")(h, bias, deterministic)
            states.append(h)
        if c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype, name="norm")(h)
            states[-1] = h
        return jnp.stack(states), lengths


class SSLFrontend(nn.Module):
    """S3PRL-style frontend: SSL trunk + learnable softmax layer weights
    (`espnet2/asr/frontend/s3prl.py` Featurizer). `freeze` stops gradients
    into the trunk (reference freezes the upstream by default)."""

    cfg: SSLConfig
    freeze: bool = True

    @nn.compact
    def __call__(self, wave, wave_lengths, deterministic: bool = True):
        states, lengths = Wav2Vec2Model(self.cfg, name="upstream")(
            wave, wave_lengths, deterministic
        )
        if self.freeze:
            states = jax.lax.stop_gradient(states)
        w = self.param(
            "layer_weights", nn.initializers.zeros, (states.shape[0],),
            jnp.float32,
        )
        w = jax.nn.softmax(w)
        feats = jnp.einsum("l,lbtd->btd", w.astype(states.dtype), states)
        return feats, lengths


class Wav2Vec2ASREncoder(nn.Module):
    """SSL trunk as the ASR encoder with a Dense to `output_size`
    (`espnet2/asr/encoder/wav2vec2_encoder.py:1` FairSeqWav2Vec2Encoder /
    `hubert_encoder.py` FairseqHubertEncoder)."""

    cfg: SSLConfig
    output_size: int
    freeze: bool = False

    @nn.compact
    def __call__(self, wave, wave_lengths, deterministic: bool = True):
        states, lengths = Wav2Vec2Model(self.cfg, name="upstream")(
            wave, wave_lengths, deterministic
        )
        h = states[-1]
        if self.freeze:
            h = jax.lax.stop_gradient(h)
        if self.output_size != self.cfg.hidden_size:
            h = nn.Dense(self.output_size, dtype=self.cfg.dtype,
                         name="output_layer")(h)
        return h, lengths


# ---------------------------------------------------------------------------
# Whisper
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Matches HF WhisperConfig geometry (defaults: whisper-base-ish)."""

    vocab_size: int = 51865
    n_mels: int = 80
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_size: int = 2048
    max_source_positions: int = 1500
    max_target_positions: int = 448
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's `sinusoids`: [sin | cos] halves with log-spaced timescales
    (openai/whisper model.py)."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


class _WhisperLayer(nn.Module):
    """Pre-LN transformer layer; cross-attention when `cross` is set.
    k_proj carries no bias (Whisper convention)."""

    cfg: WhisperConfig
    cross: bool = False

    @nn.compact
    def __call__(self, x, self_bias, memory=None, memory_bias=None,
                 deterministic: bool = True, cache=None, cache_index=None):
        c = self.cfg
        drop = nn.Dropout(c.dropout_rate)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype,
                         name="self_attn_layer_norm")(x)
        attn = _HFAttention(c.num_heads, c.d_model, k_bias=False,
                            dtype=c.dtype, name="self_attn")
        new_cache = None
        if cache is not None:
            h, new_cache = attn(h, h, self_bias, cache, cache_index)
        else:
            h = attn(h, h, self_bias)
        x = x + drop(h, deterministic=deterministic)
        if self.cross:
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype,
                             name="encoder_attn_layer_norm")(x)
            h = _HFAttention(c.num_heads, c.d_model, k_bias=False,
                             dtype=c.dtype, name="encoder_attn")(
                h, memory, memory_bias)
            x = x + drop(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype,
                         name="final_layer_norm")(x)
        h = nn.Dense(c.ffn_size, dtype=c.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = drop(h, deterministic=deterministic)
        h = nn.Dense(c.d_model, dtype=c.dtype, name="fc2")(h)
        x = x + drop(h, deterministic=deterministic)
        if cache is not None:
            return x, new_cache
        return x


class WhisperEncoder(nn.Module):
    """Whisper audio encoder: two conv1d (k=3; second stride 2) + fixed
    sinusoidal positions + pre-LN transformer + final LN
    (`espnet2/asr/encoder/whisper_encoder.py` OpenAIWhisperEncoder).

    Takes log-mel features (B, T, n_mels) — pair with `whisper_log_mel`
    for raw audio. Positions are a parameter initialized to sinusoids so
    pretrained tables load verbatim.
    """

    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel, mel_lengths, deterministic: bool = True):
        c = self.cfg
        x = nn.Conv(c.d_model, (3,), padding=((1, 1),), dtype=c.dtype,
                    name="conv1")(mel)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c.d_model, (3,), strides=(2,), padding=((1, 1),),
                    dtype=c.dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        t = x.shape[1]
        lengths = jnp.minimum((mel_lengths + 1) // 2, t)
        pos = self.param(
            "positions",
            lambda _key, shape: jnp.asarray(sinusoidal_positions(*shape)),
            (c.max_source_positions, c.d_model),
        )
        x = x + pos[:t].astype(x.dtype)
        bias = attention_bias(make_valid_mask(lengths, t)[:, None, None, :])
        for i in range(c.encoder_layers):
            x = _WhisperLayer(c, name=f"layer{i}")(x, bias, None, None,
                                                   deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype, name="norm")(x)
        return x, lengths


class WhisperDecoder(nn.Module):
    """Whisper text decoder with tied output embedding and a KV-cached
    `score_step` implementing our BatchScorer protocol, so it plugs into
    the label-synchronous beam search unchanged
    (`espnet2/asr/decoder/whisper_decoder.py` OpenAIWhisperDecoder)."""

    cfg: WhisperConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype,
                              name="embed_tokens")
        self.pos = self.param(
            "positions", nn.initializers.normal(0.02),
            (c.max_target_positions, c.d_model),
        )
        self.layers = [
            _WhisperLayer(c, cross=True, name=f"layer{i}")
            for i in range(c.decoder_layers)
        ]
        self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=c.dtype, name="norm")

    def _logits(self, x):
        emb = self.embed.embedding
        return jnp.einsum("btd,vd->btv", x, emb.astype(x.dtype))

    def __call__(self, tokens, token_lengths, memory, memory_lengths,
                 deterministic: bool = True):
        b, u = tokens.shape
        x = self.embed(tokens) + self.pos[:u].astype(self.cfg.dtype)
        tgt_valid = make_valid_mask(token_lengths, u)
        causal = jnp.tril(jnp.ones((u, u), bool))
        self_bias = attention_bias(
            tgt_valid[:, None, None, :] & causal[None, None, :, :]
        )
        mem_bias = attention_bias(
            make_valid_mask(memory_lengths, memory.shape[1])[:, None, None, :]
        )
        for layer in self.layers:
            x = layer(x, self_bias, memory, mem_bias, deterministic)
        return self._logits(self.norm(x))

    def init_cache(self, batch: int, max_len: int) -> list:
        c = self.cfg
        h, dk = c.num_heads, c.d_model // c.num_heads
        z = jnp.zeros((batch, h, max_len, dk), c.dtype)
        return [{"k": z, "v": z} for _ in range(c.decoder_layers)]

    def score_step(self, tokens_step, pos, memory, memory_lengths, cache):
        x = self.embed(tokens_step[:, None])
        x = x + jax.lax.dynamic_slice(
            self.pos, (pos, 0), (1, self.cfg.d_model)
        )[None].astype(x.dtype)
        mem_bias = attention_bias(
            make_valid_mask(memory_lengths, memory.shape[1])[:, None, None, :]
        )
        new_caches = []
        for layer, layer_cache in zip(self.layers, cache):
            x, nc = layer(x, None, memory, mem_bias, True,
                          cache=layer_cache, cache_index=pos)
            new_caches.append(nc)
        logits = self._logits(self.norm(x))[:, 0]
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), new_caches


def whisper_log_mel(speech: jnp.ndarray, speech_lengths: jnp.ndarray,
                    fs: int = 16000, n_mels: int = 80):
    """Whisper's log-mel: n_fft=400 hop=160 Hann, magnitude^2, slaney mel
    (librosa defaults = our ops.stft.mel_filterbank defaults), log10 with
    8-decade dynamic-range clamp, (x + 4) / 4."""
    from espnet_tpu.ops.stft import mel_filterbank, stft, stft_frames_lengths

    n_fft, hop = 400, 160
    real, imag = stft(speech, n_fft, hop, n_fft)
    power = real ** 2 + imag ** 2  # (B, T, F)
    # whisper drops the last frame (mel = stft[..., :-1])
    power = power[:, :-1]
    mel = jnp.einsum(
        "btf,fm->btm", power, jnp.asarray(mel_filterbank(fs, n_fft, n_mels))
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0)
    feats = (log_spec + 4.0) / 4.0
    lengths = jnp.minimum(
        stft_frames_lengths(speech_lengths, n_fft, hop), feats.shape[1]
    )
    return feats, lengths
