"""HiFiGAN vocoder: generator, multi-scale + multi-period discriminators,
GAN losses.

Behavioral spec: reference `espnet2/gan_tts/hifigan/hifigan.py`
(`HiFiGANGenerator:21` input conv -> upsample ConvTranspose stack with
multi-receptive-field residual blocks -> tanh output;
`HiFiGANPeriodDiscriminator:220`, `HiFiGANScaleDiscriminator:410`,
multi variants `:357,576,658`) and `hifigan/loss.py`
(`GeneratorAdversarialLoss:18` least-squares, discriminator `:78`,
`FeatureMatchLoss:156`, `MelSpectrogramLoss:217`).

TPU notes: all convs are NWC `lax.conv` forms; the period discriminator's
(T/p, p) folding is a static reshape; weight-norm is dropped (XLA + Adam
make it unnecessary; the reference itself removes it at inference,
`hifigan.py remove_weight_norm`).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU = 0.1


class ResidualBlock(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    use_additional_convs: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}_1")(h)
            if self.use_additional_convs:
                h = nn.leaky_relu(h, LRELU)
                h = nn.Conv(self.channels, (self.kernel_size,),
                            padding="SAME", dtype=self.dtype,
                            name=f"conv{i}_2")(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    in_channels: int = 80
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    dtype: Any = jnp.float32

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_scales))

    @nn.compact
    def __call__(self, mel, g=None):
        # (B, T_mel, n_mels) [+ global cond g (B, Cg)] -> (B, T_mel*prod, 1)
        x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="input_conv")(mel)
        if g is not None:
            # reference HiFiGAN adds conv1x1(g) right after the input conv
            # (`gan_tts/hifigan/hifigan.py` global_channels path)
            x = x + nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                             name="global_conv")(g)[:, None]
        for i, scale in enumerate(self.upsample_scales):
            x = nn.leaky_relu(x, LRELU)
            ch = self.channels // (2 ** (i + 1))
            x = nn.ConvTranspose(
                ch, (2 * scale,), strides=(scale,), padding="SAME",
                dtype=self.dtype, name=f"upsample{i}",
            )(x)
            # multi-receptive-field fusion: mean of parallel resblocks
            acc = 0.0
            for j, (k, ds) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                acc = acc + ResidualBlock(
                    ch, k, tuple(ds), dtype=self.dtype,
                    name=f"block{i}_{j}",
                )(x)
            x = acc / len(self.resblock_kernel_sizes)
        # reference output_conv uses torch.nn.LeakyReLU() with the DEFAULT
        # slope 0.01, unlike the 0.1 used everywhere else (hifigan.py:116)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(1, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="output_conv")(x)
        return nn.tanh(x)


class PeriodDiscriminator(nn.Module):
    period: int
    kernel_size: int = 5
    channels: int = 32
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)
    max_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):  # (B, T, 1) -> (score, [feature maps])
        b, t, _ = wav.shape
        p = self.period
        pad = (p - t % p) % p
        x = jnp.pad(wav, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        x = x.reshape(b, -1, p, 1)  # (B, T/p, p, 1) — conv over the T/p axis
        feats = []
        ch = self.channels
        for i, s in enumerate(self.downsample_scales):
            x = nn.Conv(ch, (self.kernel_size, 1), strides=(s, 1),
                        padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, LRELU)
            feats.append(x)
            ch = min(ch * 4, self.max_channels)
        x = nn.Conv(1, (3, 1), padding="SAME", dtype=self.dtype,
                    name="out_conv")(x)
        feats.append(x)
        return x.reshape(b, -1), feats


class ScaleDiscriminator(nn.Module):
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    channels: int = 128
    max_channels: int = 1024
    max_groups: int = 16
    downsample_scales: Sequence[int] = (2, 2, 4, 4, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):  # (B, T, 1)
        feats = []
        x = nn.Conv(self.channels, (self.kernel_sizes[0],), padding="SAME",
                    dtype=self.dtype, name="conv0")(wav)
        x = nn.leaky_relu(x, LRELU)
        feats.append(x)
        ch = self.channels
        groups = 4
        for i, s in enumerate(self.downsample_scales):
            out_ch = min(ch * 2, self.max_channels)
            x = nn.Conv(out_ch, (self.kernel_sizes[1],), strides=(s,),
                        padding="SAME", feature_group_count=groups,
                        dtype=self.dtype, name=f"down{i}")(x)
            x = nn.leaky_relu(x, LRELU)
            feats.append(x)
            ch = out_ch
            groups = min(groups * 4, self.max_groups)
        x = nn.Conv(ch, (self.kernel_sizes[2],), padding="SAME",
                    dtype=self.dtype, name="conv_post1")(x)
        x = nn.leaky_relu(x, LRELU)
        feats.append(x)
        x = nn.Conv(1, (self.kernel_sizes[3],), padding="SAME",
                    dtype=self.dtype, name="conv_post2")(x)
        feats.append(x)
        b = x.shape[0]
        return x.reshape(b, -1), feats


class HiFiGANMultiDiscriminator(nn.Module):
    """Multi-scale (3 avg-pooled scales) + multi-period discriminators
    (`hifigan.py:658` HiFiGANMultiScaleMultiPeriodDiscriminator)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    scales: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):  # (B, T, 1) -> list of (score, feats)
        outs = []
        x = wav
        for i in range(self.scales):
            if i > 0:
                x = nn.avg_pool(x, (4,), strides=(2,), padding="SAME")
            outs.append(
                ScaleDiscriminator(dtype=self.dtype, name=f"msd{i}")(x)
            )
        for p in self.periods:
            outs.append(
                PeriodDiscriminator(p, dtype=self.dtype, name=f"mpd{p}")(wav)
            )
        return outs


# --- losses (`hifigan/loss.py`) --------------------------------------------

def generator_adversarial_loss(disc_outs) -> jnp.ndarray:
    """Least-squares: mean over discriminators of mean((1 - D(fake))^2)."""
    losses = [jnp.mean((1.0 - s) ** 2) for s, _ in disc_outs]
    return sum(losses) / len(losses)


def discriminator_adversarial_loss(real_outs, fake_outs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    real = [jnp.mean((1.0 - s) ** 2) for s, _ in real_outs]
    fake = [jnp.mean(s ** 2) for s, _ in fake_outs]
    return sum(real) / len(real), sum(fake) / len(fake)


def feature_match_loss(real_outs, fake_outs) -> jnp.ndarray:
    total = 0.0
    count = 0
    for (_, rf), (_, ff) in zip(real_outs, fake_outs):
        for r, f in zip(rf, ff):
            total = total + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
            count += 1
    return total / max(count, 1)


def mel_spectrogram_loss(
    real_wav: jnp.ndarray,   # (B, T)
    fake_wav: jnp.ndarray,
    fs: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
) -> jnp.ndarray:
    """L1 between log-mels of real/fake (`loss.py:217` MelSpectrogramLoss)."""
    from espnet_tpu.ops.stft import log_mel_spectrogram

    lens = jnp.full((real_wav.shape[0],), real_wav.shape[1], jnp.int32)
    mr, _ = log_mel_spectrogram(real_wav, lens, fs, n_fft, hop_length, None,
                                n_mels)
    mf, _ = log_mel_spectrogram(fake_wav, lens, fs, n_fft, hop_length, None,
                                n_mels)
    return jnp.mean(jnp.abs(mr - mf))
