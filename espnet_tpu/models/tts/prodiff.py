"""ProDiff: progressive fast diffusion TTS (few-step x0-prediction).

Behavioral spec: reference `espnet2/tts/prodiff/` (ESPnet ProDiff:
FastSpeech2-style encoder + variance adaptor produces the condition;
`denoiser.py` SpectrogramDenoiser — WaveNet-like gated residual stack with
diffusion-step embedding — predicts the clean mel x0 directly; a
few-timestep (default 4) DDPM schedule is run at inference;
`loss.py` adds L1 + SSIM-style spectral losses on the denoised mel).

TPU-native: the denoising loop at inference is a `lax.fori_loop`-free
static unroll over `timesteps` (tiny, e.g. 4) — every step is the same
fused conv program; training draws ONE random timestep per utterance
(standard DDPM estimator) so the train step stays a single static program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.fastspeech2 import (
    VariancePredictor, _FFTBlockStack, length_regulate,
)
from espnet_tpu.ops.masks import make_valid_mask


def _mish(x):
    return x * jnp.tanh(nn.softplus(x))


class DiffusionStepEmbedding(nn.Module):
    """Sinusoidal step embedding + 2-layer mish MLP
    (`prodiff/denoiser.py` step embedding)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t):  # t: (B,) int
        half = self.dim // 2
        freqs = jnp.exp(
            -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        )
        arg = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)
        emb = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(emb)
        emb = _mish(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(emb)
        return emb  # (B, dim)


class DenoiserResBlock(nn.Module):
    """Gated dilated conv block with condition + step injection
    (`prodiff/denoiser.py` ResidualBlock)."""

    channels: int
    cond_dim: int
    kernel: int = 3
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, step_emb):
        # x (B, T, C); cond (B, T, D); step_emb (B, C)
        h = x + nn.Dense(self.channels, dtype=self.dtype,
                         name="step_proj")(step_emb)[:, None, :]
        h = nn.Conv(2 * self.channels, (self.kernel,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    dtype=self.dtype, name="conv")(h)
        h = h + nn.Conv(2 * self.channels, (1,), dtype=self.dtype,
                        name="cond_proj")(cond)
        a, b = jnp.split(h, 2, axis=-1)
        h = jnp.tanh(a) * nn.sigmoid(b)
        res = nn.Conv(self.channels, (1,), dtype=self.dtype, name="res")(h)
        skip = nn.Conv(self.channels, (1,), dtype=self.dtype, name="skip")(h)
        return (x + res) * (0.5 ** 0.5), skip


class SpectrogramDenoiser(nn.Module):
    """x_t + condition + step -> x0 prediction
    (`prodiff/denoiser.py` SpectrogramDenoiser)."""

    n_mels: int
    cond_dim: int
    channels: int = 256
    layers: int = 20
    cycle: int = 4           # dilation cycle length
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_t, cond, t):
        # x_t (B, T, M); cond (B, T, D); t (B,)
        emb = DiffusionStepEmbedding(self.channels, self.dtype,
                                     name="step_emb")(t)
        h = nn.Conv(self.channels, (1,), dtype=self.dtype, name="in_proj")(
            x_t
        )
        h = nn.relu(h)
        skips = 0.0
        for i in range(self.layers):
            h, skip = DenoiserResBlock(
                self.channels, self.cond_dim, 3, 2 ** (i % self.cycle),
                self.dtype, name=f"block{i}",
            )(h, cond, emb)
            skips = skips + skip
        h = skips * (1.0 / self.layers ** 0.5)
        h = nn.relu(nn.Conv(self.channels, (1,), dtype=self.dtype,
                            name="post1")(h))
        return nn.Conv(self.n_mels, (1,), dtype=self.dtype, name="post2")(h)


def diffusion_schedule(timesteps: int, beta_min: float = 1e-4,
                       beta_max: float = 0.06):
    """Linear beta schedule (DDPM); returns numpy constants."""
    betas = np.linspace(beta_min, beta_max, timesteps, dtype=np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    return {
        "betas": betas.astype(np.float32),
        "alphas_cumprod": ac.astype(np.float32),
        "alphas_cumprod_prev": ac_prev.astype(np.float32),
        "posterior_variance": post_var.astype(np.float32),
    }


@dataclasses.dataclass(frozen=True)
class ProDiffConfig:
    vocab_size: int = -1
    n_mels: int = 80
    d_model: int = 256
    num_heads: int = 2
    d_ff: int = 1024
    encoder_layers: int = 4
    predictor_layers: int = 2
    predictor_channels: int = 256
    predictor_kernel: int = 3
    denoiser_channels: int = 256
    denoiser_layers: int = 20
    timesteps: int = 4
    dropout_rate: float = 0.1
    max_frames: int = 2048
    dtype: Any = jnp.float32


class ProDiff(nn.Module):
    """ESPnet ProDiff model (`espnet2/tts/prodiff/__init__` family).

    Same training interface as FastSpeech2 (teacher durations +
    token-level pitch/energy targets): __call__(text, text_lengths, mel,
    mel_lengths, durations, pitch, energy) -> (loss, stats, mel_hat).
    RNG stream 'diffusion' supplies the timestep draw and noise.
    """

    config: ProDiffConfig

    def setup(self):
        c = self.config
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype)
        self.encoder = _FFTBlockStack(c.d_model, c.num_heads, c.d_ff,
                                      c.encoder_layers, c.dropout_rate,
                                      c.dtype, name="encoder")
        pk = dict(channels=c.predictor_channels, layers=c.predictor_layers,
                  kernel=c.predictor_kernel, dropout_rate=0.5, dtype=c.dtype)
        self.duration_predictor = VariancePredictor(**pk, name="duration")
        self.pitch_predictor = VariancePredictor(**pk, name="pitch")
        self.energy_predictor = VariancePredictor(**pk, name="energy")
        self.pitch_embed = nn.Conv(c.d_model, (9,), padding="SAME",
                                   dtype=c.dtype, name="pitch_embed")
        self.energy_embed = nn.Conv(c.d_model, (9,), padding="SAME",
                                    dtype=c.dtype, name="energy_embed")
        self.denoiser = SpectrogramDenoiser(
            c.n_mels, c.d_model, c.denoiser_channels, c.denoiser_layers,
            dtype=c.dtype, name="denoiser",
        )
        self.sched = diffusion_schedule(c.timesteps)

    def _condition(self, text, text_lengths, deterministic):
        hs = self.encoder(self.embed(text), text_lengths, deterministic)
        tmask = make_valid_mask(text_lengths, hs.shape[1])
        d_pred = self.duration_predictor(hs, tmask, deterministic)
        p_pred = self.pitch_predictor(hs, tmask, deterministic)
        e_pred = self.energy_predictor(hs, tmask, deterministic)
        return hs, d_pred, p_pred, e_pred, tmask

    def __call__(self, text, text_lengths, mel, mel_lengths, durations,
                 pitch, energy, deterministic: bool = True):
        c = self.config
        hs, d_pred, p_pred, e_pred, tmask = self._condition(
            text, text_lengths, deterministic
        )
        hs = hs + self.pitch_embed(pitch[..., None])
        hs = hs + self.energy_embed(energy[..., None])
        t_max = mel.shape[1]
        cond, _ = length_regulate(hs, durations, t_max)

        # one random diffusion step per utterance
        rng = self.make_rng("diffusion")
        r_t, r_n = jax.random.split(rng)
        b = mel.shape[0]
        t = jax.random.randint(r_t, (b,), 0, c.timesteps)
        ac = jnp.asarray(self.sched["alphas_cumprod"])[t]  # (B,)
        noise = jax.random.normal(r_n, mel.shape, mel.dtype)
        x_t = (jnp.sqrt(ac)[:, None, None] * mel
               + jnp.sqrt(1.0 - ac)[:, None, None] * noise)
        x0_hat = self.denoiser(x_t, cond, t)

        fmask = make_valid_mask(mel_lengths, t_max)[..., None].astype(
            jnp.float32)
        n_el = jnp.maximum(jnp.sum(fmask), 1.0) * c.n_mels
        l1 = jnp.sum(jnp.abs(x0_hat - mel) * fmask) / n_el
        tm = tmask.astype(jnp.float32)
        n_tok = jnp.maximum(jnp.sum(tm), 1.0)
        log_dur_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(((d_pred - log_dur_tgt) ** 2) * tm) / n_tok
        pitch_loss = jnp.sum(((p_pred - pitch) ** 2) * tm) / n_tok
        energy_loss = jnp.sum(((e_pred - energy) ** 2) * tm) / n_tok
        loss = l1 + dur_loss + pitch_loss + energy_loss
        stats = {
            "loss": loss, "l1_loss": l1, "duration_loss": dur_loss,
            "pitch_loss": pitch_loss, "energy_loss": energy_loss,
        }
        return loss, stats, x0_hat

    def inference(self, text, text_lengths,
                  max_frames: Optional[int] = None):
        """DDPM sampling with x0 re-parameterisation over `timesteps`
        steps (static unroll)."""
        c = self.config
        max_frames = max_frames or c.max_frames
        hs, d_pred, p_pred, e_pred, tmask = self._condition(
            text, text_lengths, True
        )
        dur = jnp.clip(jnp.round(jnp.exp(d_pred) - 1.0), 0, None)
        dur = (dur * tmask).astype(jnp.int32)
        hs = hs + self.pitch_embed(p_pred[..., None])
        hs = hs + self.energy_embed(e_pred[..., None])
        cond, out_lens = length_regulate(hs, dur, max_frames)

        s = self.sched
        rng = self.make_rng("diffusion")
        b = text.shape[0]
        x = jax.random.normal(rng, (b, max_frames, c.n_mels), jnp.float32)
        for step in range(c.timesteps - 1, -1, -1):
            t = jnp.full((b,), step, jnp.int32)
            x0_hat = self.denoiser(x, cond, t)
            ac = s["alphas_cumprod"][step]
            ac_prev = s["alphas_cumprod_prev"][step]
            beta = s["betas"][step]
            # DDPM posterior mean with predicted x0
            coef0 = beta * np.sqrt(ac_prev) / (1.0 - ac)
            coeft = (1.0 - ac_prev) * np.sqrt(1.0 - beta) / (1.0 - ac)
            mean = coef0 * x0_hat + coeft * x
            if step > 0:
                rng, sub = jax.random.split(rng)
                z = jax.random.normal(sub, x.shape, x.dtype)
                x = mean + np.sqrt(s["posterior_variance"][step]) * z
            else:
                x = mean
        fmask = make_valid_mask(out_lens, max_frames)[..., None]
        return x * fmask.astype(x.dtype), out_lens
