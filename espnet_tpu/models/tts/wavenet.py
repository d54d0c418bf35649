"""WaveNet vocoder: mu-law autoregressive waveform model.

Behavioral spec: reference `espnet/nets/pytorch_backend/wavenet.py`
(legacy vocoder: 256-way mu-law classification, causal dilated residual
conv stack with gated tanh/sigmoid units, local conditioning on upsampled
mels, skip connections -> output stack; incremental "fast generation" with
per-layer sample buffers).

TPU formulation: teacher-forced training is a fully-parallel causal-conv
program; generation runs a `lax.scan` over samples carrying per-layer
ring buffers (the reference's generation queues) — entirely on device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def mulaw_encode(x: jnp.ndarray, channels: int = 256) -> jnp.ndarray:
    """[-1,1] float -> int ids (reference `encode_mu_law`)."""
    mu = channels - 1
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)
    return ((y + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mulaw_decode(ids: jnp.ndarray, channels: int = 256) -> jnp.ndarray:
    """int ids -> [-1,1] float (reference `decode_mu_law`)."""
    mu = channels - 1
    y = 2.0 * ids.astype(jnp.float32) / mu - 1.0
    return jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu


@dataclasses.dataclass(frozen=True)
class WaveNetConfig:
    quantize: int = 256
    residual_channels: int = 64
    skip_channels: int = 64
    aux_channels: int = 80       # mel conditioning
    kernel_size: int = 2
    dilation_depth: int = 8      # dilations 1..2^(depth-1)
    dilation_repeat: int = 2
    hop_length: int = 256        # mel upsample factor
    dtype: Any = jnp.float32

    @property
    def dilations(self) -> Tuple[int, ...]:
        return tuple(
            self.kernel_size ** 0 * (2 ** d)
            for _ in range(self.dilation_repeat)
            for d in range(self.dilation_depth)
        )

    @property
    def receptive_field(self) -> int:
        return sum((self.kernel_size - 1) * d for d in self.dilations) + 1


class WaveNet(nn.Module):
    config: WaveNetConfig

    def setup(self):
        c = self.config
        self.input_conv = nn.Conv(c.residual_channels, (1,), dtype=c.dtype)
        self.dil_convs = [
            nn.Conv(2 * c.residual_channels, (c.kernel_size,),
                    kernel_dilation=(d,), padding="VALID", dtype=c.dtype,
                    name=f"dil{i}")
            for i, d in enumerate(c.dilations)
        ]
        self.aux_convs = [
            nn.Conv(2 * c.residual_channels, (1,), dtype=c.dtype,
                    name=f"aux{i}")
            for i in range(len(c.dilations))
        ]
        self.res_convs = [
            nn.Conv(c.residual_channels, (1,), dtype=c.dtype, name=f"res{i}")
            for i in range(len(c.dilations))
        ]
        self.skip_convs = [
            nn.Conv(c.skip_channels, (1,), dtype=c.dtype, name=f"skip{i}")
            for i in range(len(c.dilations))
        ]
        self.out1 = nn.Conv(c.skip_channels, (1,), dtype=c.dtype)
        self.out2 = nn.Conv(c.quantize, (1,), dtype=c.dtype)

    def _upsample(self, mel, n_samples):
        """(B, T_mel, M) -> (B, n, M) nearest-frame conditioning."""
        idx = jnp.minimum(
            jnp.arange(n_samples) // self.config.hop_length,
            mel.shape[1] - 1,
        )
        return mel[:, idx]

    def __call__(self, wav_ids, mel):
        """Teacher-forced logits.

        wav_ids: (B, N) mu-law ids; mel: (B, T_mel, M).
        Returns logits (B, N, Q) predicting wav_ids[t] from ids[<t].
        """
        c = self.config
        b, n = wav_ids.shape
        x_prev = jnp.concatenate(
            [jnp.full((b, 1), c.quantize // 2, wav_ids.dtype),
             wav_ids[:, :-1]], axis=1,
        )
        x = jax.nn.one_hot(x_prev, c.quantize, dtype=c.dtype)
        x = self.input_conv(x)
        aux = self._upsample(mel, n)
        skip_sum = 0.0
        for conv, aconv, rconv, sconv, d in zip(
            self.dil_convs, self.aux_convs, self.res_convs,
            self.skip_convs, c.dilations,
        ):
            pad = (c.kernel_size - 1) * d
            h = conv(jnp.pad(x, ((0, 0), (pad, 0), (0, 0))))
            h = h + aconv(aux)
            a, g = jnp.split(h, 2, axis=-1)
            z = jnp.tanh(a) * nn.sigmoid(g)
            x = x + rconv(z)
            skip_sum = skip_sum + sconv(z)
        h = nn.relu(skip_sum)
        h = nn.relu(self.out1(h))
        return self.out2(h)

    def loss(self, wav, mel, lengths):
        """Masked CE over mu-law targets; wav in [-1, 1]."""
        c = self.config
        ids = mulaw_encode(jnp.clip(wav, -1.0, 1.0), c.quantize)
        logits = self(ids, mel)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, ids[..., None], -1)[..., 0]
        mask = (jnp.arange(wav.shape[1])[None, :]
                < lengths[:, None]).astype(jnp.float32)
        loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        acc = jnp.sum(
            (jnp.argmax(logits, -1) == ids) * mask
        ) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss, {"loss": loss, "acc": acc}

    def generate(self, mel, n_samples: int, rng,
                 temperature: float = 1.0):
        """AR sampling with per-layer ring buffers (fast generation,
        reference `wavenet.py` batch_fast_generate). mel (B, T_mel, M)."""
        c = self.config
        b = mel.shape[0]
        aux_all = self._upsample(mel, n_samples)
        k = c.kernel_size
        # per-layer input buffers of length (k-1)*d
        bufs = [
            jnp.zeros((b, (k - 1) * d, c.residual_channels), c.dtype)
            for d in c.dilations
        ]

        def step(carry, t):
            prev_id, bufs, key = carry
            x = jax.nn.one_hot(prev_id, c.quantize, dtype=c.dtype)[:, None]
            x = self.input_conv(x)
            aux = jax.lax.dynamic_slice(
                aux_all, (0, t, 0), (b, 1, aux_all.shape[2])
            )
            skip_sum = 0.0
            new_bufs = []
            for li, (conv, aconv, rconv, sconv, d) in enumerate(zip(
                self.dil_convs, self.aux_convs, self.res_convs,
                self.skip_convs, c.dilations,
            )):
                buf = bufs[li]
                # contiguous ((k-1)d + 1) window; the layer's own dilation
                # picks the taps at offsets 0, d, ... -> one output sample
                inp = jnp.concatenate([buf, x], axis=1)
                h = conv(inp)
                h = h + aconv(aux)
                a, g = jnp.split(h, 2, axis=-1)
                z = jnp.tanh(a) * nn.sigmoid(g)
                new_bufs.append(
                    jnp.concatenate([buf[:, 1:], x], axis=1)
                    if buf.shape[1] > 0 else buf
                )
                x = x + rconv(z)
                skip_sum = skip_sum + sconv(z)
            h = nn.relu(skip_sum)
            h = nn.relu(self.out1(h))
            logits = self.out2(h)[:, 0].astype(jnp.float32)
            key, sub = jax.random.split(key)
            sample = jax.random.categorical(sub, logits / temperature, -1)
            return (sample.astype(jnp.int32), new_bufs, key), sample

        init = (jnp.full((b,), c.quantize // 2, jnp.int32), bufs, rng)
        _, samples = jax.lax.scan(step, init, jnp.arange(n_samples))
        return mulaw_decode(samples.T, c.quantize)
