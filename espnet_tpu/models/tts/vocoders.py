"""GAN vocoder zoo: MelGAN / Multi-band MelGAN, Parallel WaveGAN,
StyleMelGAN.

Behavioral spec: reference `espnet2/gan_tts/melgan/melgan.py`
(MelGANGenerator: reflect-pad conv -> per-scale ConvTranspose + residual
stacks -> tanh; MelGANMultiScaleDiscriminator),
`espnet2/gan_tts/parallel_wavegan/parallel_wavegan.py`
(ParallelWaveGANGenerator: noise-driven non-causal WaveNet with upsampled
mel conditioning; ParallelWaveGANDiscriminator: dilated conv stack), and
`espnet2/gan_tts/style_melgan/style_melgan.py` (StyleMelGANGenerator: noise
upsample + TADE residual blocks modulated by the mel; discriminator =
PQMF multi-band analysis + base discriminators over windows).

All generators share the vocoder-task interface: `apply(params, mel)` ->
(B, T_mel * upsample_factor, 1); noise-driven ones draw their latent from
the "noise" rng collection so the jitted GAN step stays pure.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU = 0.2


# ---------------------------------------------------------------- MelGAN --

class MelGANResidualStack(nn.Module):
    """leaky_relu -> dilated conv(k) -> leaky_relu -> 1x1, residual 1x1
    (`melgan.py` ResidualStack)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, LRELU)
        h = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    dtype=self.dtype, name="conv1")(h)
        h = nn.leaky_relu(h, LRELU)
        h = nn.Conv(self.channels, (1,), dtype=self.dtype, name="conv2")(h)
        skip = nn.Conv(self.channels, (1,), dtype=self.dtype,
                       name="skip")(x)
        return h + skip


class MelGANGenerator(nn.Module):
    """(B, T_mel, n_mels) -> (B, T_mel * prod(scales), out_channels)
    (`melgan.py:MelGANGenerator`). out_channels=4 + PQMF synthesis gives
    multi-band MelGAN."""

    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stacks: int = 3
    dtype: Any = jnp.float32

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_scales)) * (
            self.out_channels if self.out_channels > 1 else 1
        )

    @nn.compact
    def __call__(self, mel):
        x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="input_conv")(mel)
        ch = self.channels
        for i, scale in enumerate(self.upsample_scales):
            ch = ch // 2
            x = nn.leaky_relu(x, LRELU)
            x = nn.ConvTranspose(ch, (2 * scale,), strides=(scale,),
                                 padding="SAME", dtype=self.dtype,
                                 name=f"upsample{i}")(x)
            for j in range(self.stacks):
                x = MelGANResidualStack(
                    ch, 3, 3 ** j, self.dtype, name=f"stack{i}_{j}",
                )(x)
        x = nn.leaky_relu(x, LRELU)
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="output_conv")(x)
        x = nn.tanh(x)
        if self.out_channels > 1:
            from espnet_tpu.ops.pqmf import pqmf_synthesis

            x = pqmf_synthesis(x, self.out_channels)[:, :, None]
        return x


class MelGANDiscriminator(nn.Module):
    """One scale of `melgan.py:MelGANDiscriminator`."""

    channels: int = 16
    max_channels: int = 1024
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):  # (B, T, 1) -> (score, feats)
        feats = []
        x = nn.Conv(self.channels, (15,), padding="SAME", dtype=self.dtype,
                    name="conv0")(wav)
        x = nn.leaky_relu(x, LRELU)
        feats.append(x)
        ch = self.channels
        groups = 4
        for i, s in enumerate(self.downsample_scales):
            out_ch = min(ch * s, self.max_channels)
            x = nn.Conv(out_ch, (s * 10 + 1,), strides=(s,), padding="SAME",
                        feature_group_count=groups, dtype=self.dtype,
                        name=f"down{i}")(x)
            x = nn.leaky_relu(x, LRELU)
            feats.append(x)
            ch = out_ch
            groups = min(groups * 4, 256)
        x = nn.Conv(min(ch * 2, self.max_channels), (5,), padding="SAME",
                    dtype=self.dtype, name="post1")(x)
        x = nn.leaky_relu(x, LRELU)
        feats.append(x)
        x = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype,
                    name="post2")(x)
        feats.append(x)
        return x.reshape(x.shape[0], -1), feats


class MelGANMultiScaleDiscriminator(nn.Module):
    """3 avg-pooled scales (`melgan.py:MelGANMultiScaleDiscriminator`)."""

    scales: int = 3
    channels: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):
        outs = []
        x = wav
        for i in range(self.scales):
            if i > 0:
                x = nn.avg_pool(x, (4,), strides=(2,), padding="SAME")
            outs.append(MelGANDiscriminator(
                self.channels, dtype=self.dtype, name=f"disc{i}")(x))
        return outs


# ------------------------------------------------------- ParallelWaveGAN --

class _UpsampleNet(nn.Module):
    """Mel (B, T_mel, M) -> (B, T_mel * prod(scales), M) via per-scale
    ConvTranspose (conv-in-upsample network of `parallel_wavegan.py`)."""

    scales: Sequence[int]
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        for i, s in enumerate(self.scales):
            c = nn.ConvTranspose(self.channels, (2 * s,), strides=(s,),
                                 padding="SAME", dtype=self.dtype,
                                 name=f"up{i}")(c)
            c = nn.leaky_relu(c, LRELU)
        return c


class ParallelWaveGANGenerator(nn.Module):
    """Noise-driven non-causal WaveNet
    (`parallel_wavegan.py:ParallelWaveGANGenerator`): z ~ N(0,1) at sample
    rate, gated dilated residual conv stack conditioned on upsampled mel,
    skip-sum head."""

    in_channels: int = 80
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    dtype: Any = jnp.float32

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_scales))

    @nn.compact
    def __call__(self, mel):
        b, t_mel, _ = mel.shape
        n = t_mel * self.upsample_factor
        z = jax.random.normal(self.make_rng("noise"), (b, n, 1), self.dtype)
        c = _UpsampleNet(self.upsample_scales, self.in_channels, self.dtype,
                         name="upsample_net")(mel)  # (B, N, M)
        x = nn.Conv(self.residual_channels, (1,), dtype=self.dtype,
                    name="first_conv")(z)
        skips = 0.0
        layers_per_stack = self.layers // self.stacks
        half = self.gate_channels // 2
        for i in range(self.layers):
            dil = 2 ** (i % layers_per_stack)
            h = nn.Conv(self.gate_channels, (self.kernel_size,),
                        kernel_dilation=(dil,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            hc = nn.Conv(self.gate_channels, (1,), use_bias=False,
                         dtype=self.dtype, name=f"cond{i}")(c)
            h = h + hc
            gated = jnp.tanh(h[..., :half]) * nn.sigmoid(h[..., half:])
            res = nn.Conv(self.residual_channels, (1,), dtype=self.dtype,
                          name=f"res{i}")(gated)
            skip = nn.Conv(self.skip_channels, (1,), dtype=self.dtype,
                           name=f"skip{i}")(gated)
            x = (x + res) * (0.5 ** 0.5)
            skips = skips + skip
        x = skips * (1.0 / len(range(self.layers)) ** 0.5)
        x = nn.relu(x)
        x = nn.Conv(self.skip_channels, (1,), dtype=self.dtype,
                    name="post1")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1,), dtype=self.dtype, name="post2")(x)
        return jnp.tanh(x)


class ParallelWaveGANDiscriminator(nn.Module):
    """Dilated conv stack -> per-sample score
    (`parallel_wavegan.py:ParallelWaveGANDiscriminator`)."""

    layers: int = 10
    channels: int = 64
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):  # (B, T, 1) -> [(score, feats)]
        feats = []
        x = wav
        for i in range(self.layers - 1):
            dil = max(1, i)
            x = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(dil,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, LRELU)
            feats.append(x)
        x = nn.Conv(1, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="out")(x)
        feats.append(x)
        return [(x.reshape(x.shape[0], -1), feats)]


# ----------------------------------------------------------- StyleMelGAN --

class TADELayer(nn.Module):
    """Temporal adaptive de-normalisation
    (`style_melgan.py`/`tade.py` TADE): instance-norm x, then modulate with
    (gamma, beta) convs of the (resized) mel condition."""

    channels: int
    aux_channels: int = 80
    kernel_size: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):  # x (B, T, C); c (B, T_c, M)
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        # nearest-neighbour resize of the condition to x's length
        t = x.shape[1]
        idx = (jnp.arange(t) * c.shape[1] // t).astype(jnp.int32)
        cr = c[:, idx]
        cr = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                     dtype=self.dtype, name="cond_conv")(cr)
        gamma = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name="gamma")(cr)
        beta = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                       dtype=self.dtype, name="beta")(cr)
        return xn * gamma + beta, cr


class TADEResBlock(nn.Module):
    """TADE -> gated conv -> TADE -> dilated gated conv, residual; optional
    x2 upsample (`style_melgan.py` TADEResBlock)."""

    channels: int
    aux_channels: int = 80
    kernel_size: int = 9
    dilation: int = 2
    upsample: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        h, _ = TADELayer(self.channels, self.aux_channels, self.kernel_size,
                         self.dtype, name="tade1")(x, c)
        a = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="gated1a")(h)
        b = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="gated1b")(h)
        h = jnp.tanh(a) * nn.sigmoid(b)
        if self.upsample > 1:
            h = jnp.repeat(h, self.upsample, axis=1)
            x = jnp.repeat(x, self.upsample, axis=1)
        h2, _ = TADELayer(self.channels, self.aux_channels,
                          self.kernel_size, self.dtype, name="tade2")(h, c)
        a = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    dtype=self.dtype, name="gated2a")(h2)
        b = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    dtype=self.dtype, name="gated2b")(h2)
        h2 = jnp.tanh(a) * nn.sigmoid(b)
        return x + h2


class StyleMelGANGenerator(nn.Module):
    """Noise-seeded TADE generator
    (`style_melgan.py:StyleMelGANGenerator`): a short latent is upsampled,
    then TADE residual blocks (each x2) modulate it with the mel until the
    audio rate is reached. Geometry constraint: prod(block upsamples) *
    noise_total == hop (mel frames -> samples)."""

    aux_channels: int = 80
    channels: int = 64
    noise_dim: int = 128
    kernel_size: int = 9
    # 2*2*2*2*2*2*2*2 = 256 = default hop
    block_upsamples: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    dtype: Any = jnp.float32

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.block_upsamples))

    @nn.compact
    def __call__(self, mel):
        b, t_mel, _ = mel.shape
        z = jax.random.normal(self.make_rng("noise"),
                              (b, t_mel, self.noise_dim), self.dtype)
        x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="in_conv")(z)
        for i, up in enumerate(self.block_upsamples):
            x = TADEResBlock(self.channels, self.aux_channels,
                             self.kernel_size, 2, up, self.dtype,
                             name=f"block{i}")(x, mel)
        x = nn.leaky_relu(x, LRELU)
        x = nn.Conv(1, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="out_conv")(x)
        return jnp.tanh(x)


class StyleMelGANDiscriminator(nn.Module):
    """Multi-band windowed discriminator
    (`style_melgan.py:StyleMelGANDiscriminator`): fixed analysis windows
    (the reference samples them randomly; here evenly spaced for a pure
    jitted step), PQMF multi-band analysis per window, shared base
    discriminators."""

    repeats: int = 2
    window_sizes: Sequence[int] = (512, 1024, 2048, 4096)
    pqmf_bands: Sequence[int] = (1, 2, 4, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav):  # (B, T, 1)
        from espnet_tpu.ops.pqmf import pqmf_analysis

        t = wav.shape[1]
        # one shared base discriminator per window size, reused across
        # repeats (the reference shares them across random windows too)
        discs = [
            MelGANDiscriminator(16, downsample_scales=(4, 4, 4),
                                dtype=self.dtype, name=f"disc{wi}")
            for wi in range(len(self.window_sizes))
        ]
        outs = []
        for r in range(self.repeats):
            for wi, (win, bands) in enumerate(
                zip(self.window_sizes, self.pqmf_bands)
            ):
                if win > t:
                    win = t
                start = (r * max(t - win, 0)) // max(self.repeats - 1, 1)
                x = jax.lax.dynamic_slice_in_dim(wav, start, win, axis=1)
                if bands > 1:
                    x = pqmf_analysis(x[..., 0], bands, taps=62)
                outs.append(discs[wi](x))
        return outs


# ------------------------------------------------ multi-resolution STFT --

def stft_loss(x: jnp.ndarray, y: jnp.ndarray, n_fft: int, hop: int,
              win: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spectral convergence + log-magnitude L1 at one resolution
    (`parallel_wavegan` STFTLoss)."""
    from espnet_tpu.ops.stft import stft

    def mag(w):
        r, i = stft(w, n_fft, hop, win)
        return jnp.sqrt(jnp.clip(r * r + i * i, 1e-7))

    mx, my = mag(x), mag(y)
    sc = jnp.linalg.norm(my - mx) / jnp.maximum(jnp.linalg.norm(my), 1e-7)
    lm = jnp.mean(jnp.abs(jnp.log(my) - jnp.log(mx)))
    return sc, lm


def multi_resolution_stft_loss(
    x: jnp.ndarray, y: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int, int]] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240),
    ),
) -> jnp.ndarray:
    """Mean over resolutions (`parallel_wavegan` MultiResolutionSTFTLoss).
    x = generated, y = groundtruth, both (B, N)."""
    total = 0.0
    for n_fft, hop, win in resolutions:
        sc, lm = stft_loss(x, y, n_fft, hop, win)
        total = total + sc + lm
    return total / len(resolutions)
