"""iNeuBe: iterative neural/beamforming enhancement (L3DAS22 submission).

Behavioral spec: reference `espnet2/enh/separator/ineube_separator.py:16`
(iNeuBe) + `espnet2/enh/layers/tcndenseunet.py` (Conv2DActNorm :10,
FreqWiseBlock :41, DenseBlock :70, TCNResBlock :170, TCNDenseUNet :212):
DNN1 (TCNDenseUNet) predicts per-source complex STFTs from the
multichannel mixture; an optional multi-frame multi-channel Wiener filter
(mfMCWF) beamforms the mixture towards each DNN1 estimate; DNN2 refines
from [mixture, DNN1, mfMCWF]. `output_from` selects dnn1 | mfmcwf | dnn2.

TPU-first notes: channels-last (B, T, F, C) so every conv is an XLA NHWC
convolution; complex STFTs are complex64 only at the mfMCWF boundary (the
networks consume stacked real/imag channels); the Wiener solve uses
complex64 with Tikhonov loading (the reference promotes to float64 — TPUs
have no f64, the regularized complex64 solve is the native equivalent);
frequency U-Net sizes are computed statically from n_fft.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _act(name):
    return {"elu": nn.elu, "relu": nn.relu, "swish": nn.swish,
            "prelu": nn.elu}[name]


class Conv2DActNorm(nn.Module):
    """Conv (or freq-upsampling deconv) + activation + per-channel instance
    norm (`tcndenseunet.py:10`; GroupNorm(C, C) == InstanceNorm)."""

    features: int
    ksz: Tuple[int, int] = (3, 3)
    freq_stride: int = 2
    freq_pad: int = 0
    time_pad: int = 1
    upsample: bool = False
    activation: str = "elu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kf = self.ksz
        if self.upsample:
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (kt, kf, x.shape[-1], self.features), self.dtype)
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.dtype)
            # torch ConvTranspose2d(stride (1,s), padding (1,0)):
            # dilated conv with pads (k-1-p) per dim
            h = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w, (1, 1),
                padding=((kt - 2, kt - 2), (kf - 1, kf - 1)),
                lhs_dilation=(1, self.freq_stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
        else:
            # reflect-pad time, valid (or given) freq pad
            h = jnp.pad(x, ((0, 0), (self.time_pad, self.time_pad),
                            (self.freq_pad, self.freq_pad), (0, 0)),
                        mode="reflect")
            h = nn.Conv(self.features, self.ksz,
                        strides=(1, self.freq_stride), padding="VALID",
                        dtype=self.dtype)(h)
        h = _act(self.activation)(h)
        # instance norm: per channel over (T, F)
        mean = jnp.mean(h, axis=(1, 2), keepdims=True)
        var = jnp.var(h, axis=(1, 2), keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-8)
        scale = self.param("norm_scale", nn.initializers.ones,
                           (self.features,), self.dtype)
        bias = self.param("norm_bias", nn.initializers.zeros,
                          (self.features,), self.dtype)
        return h * scale + bias


class FreqWiseBlock(nn.Module):
    """Pointwise bottleneck + pointwise conv over the FREQ axis
    (`tcndenseunet.py:41`)."""

    features: int
    num_freqs: int
    activation: str = "elu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2DActNorm(self.features, (1, 1), 1, 0, 0,
                          activation=self.activation, dtype=self.dtype,
                          name="bottleneck")(x)
        # treat freq as channels: (B, T, F, C) -> (B, T, C, F)
        h = h.transpose(0, 1, 3, 2)
        h = Conv2DActNorm(self.num_freqs, (1, 1), 1, 0, 0,
                          activation=self.activation, dtype=self.dtype,
                          name="freq_proc")(h)
        return h.transpose(0, 1, 3, 2)


class DenseBlock(nn.Module):
    """DenseNet block: 2 pre convs, 1 freq-wise block, 2 post convs, all
    densely concatenated (`tcndenseunet.py:70`)."""

    features: int
    num_freqs: int
    hid_chans: int = 32
    ksz: Tuple[int, int] = (3, 3)
    activation: str = "elu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = [x]
        kf = self.ksz[1]
        for i in range(2):
            h = Conv2DActNorm(self.hid_chans, self.ksz, 1, kf // 2, 1,
                              activation=self.activation, dtype=self.dtype,
                              name=f"pre{i}")(
                jnp.concatenate(outs, axis=-1))
            outs.append(h)
        h = FreqWiseBlock(self.hid_chans, self.num_freqs, self.activation,
                          self.dtype, name="freqwise")(
            jnp.concatenate(outs, axis=-1))
        outs.append(h)
        h = Conv2DActNorm(self.hid_chans, self.ksz, 1, kf // 2, 1,
                          activation=self.activation, dtype=self.dtype,
                          name="post0")(jnp.concatenate(outs, axis=-1))
        outs.append(h)
        return Conv2DActNorm(self.features, self.ksz, 1, kf // 2, 1,
                             activation=self.activation, dtype=self.dtype,
                             name="post1")(jnp.concatenate(outs, axis=-1))


class TCNResBlock(nn.Module):
    """Depthwise-separable dilated 1D conv residual block
    (`tcndenseunet.py:170`), over (B, T, C)."""

    features: int
    ksz: int = 3
    dilation: int = 1
    activation: str = "elu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # GroupNorm(C, C) = instance norm per channel over time
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + 1e-8)
        scale = self.param("norm_scale", nn.initializers.ones, (c,),
                           self.dtype)
        bias = self.param("norm_bias", nn.initializers.zeros, (c,),
                          self.dtype)
        h = h * scale + bias
        h = _act(self.activation)(h)
        pad = self.dilation * (self.ksz - 1) // 2
        h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        h = nn.Conv(c, (self.ksz,), padding="VALID",
                    kernel_dilation=(self.dilation,), feature_group_count=c,
                    dtype=self.dtype, name="dconv")(h)
        h = nn.Conv(self.features, (1,), dtype=self.dtype,
                    name="pconv")(h)
        return h + x


def _freq_depth(num_freq: int):
    freqs = []
    while num_freq > 15:
        num_freq = int(num_freq / 2)
        freqs.append(num_freq)
    return freqs


class TCNDenseUNet(nn.Module):
    """TCNDenseUNet (`tcndenseunet.py:212`): freq U-Net of dense blocks
    around a dilated-TCN bottleneck. Input (B, T, F, 2*C_in) stacked
    real/imag channels; output (B, n_spk, T, F) complex64."""

    n_spk: int = 1
    in_freqs: int = 257
    mic_channels: int = 1
    hid_chans: int = 32
    hid_chans_dense: int = 32
    ksz_dense: Tuple[int, int] = (3, 3)
    ksz_tcn: int = 3
    tcn_repeats: int = 4
    tcn_blocks: int = 7
    tcn_channels: int = 384
    activation: str = "elu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t = x.shape[0], x.shape[1]
        hc, act, dt = self.hid_chans, self.activation, self.dtype
        num_freqs = self.in_freqs - 2
        depths = _freq_depth(num_freqs)

        enc_out = []
        # first: conv (freq valid -> F-2) + dense block
        h = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
        h = nn.Conv(hc, (3, 3), padding="VALID", dtype=dt, name="first")(h)
        h = DenseBlock(hc, num_freqs, self.hid_chans_dense, self.ksz_dense,
                       act, dt, name="first_dense")(h)
        enc_out.append(h)
        for li, nf in enumerate(depths):
            h = Conv2DActNorm(hc, (3, 3), 2, 0, 1, activation=act, dtype=dt,
                              name=f"down{li}")(h)
            h = DenseBlock(hc, nf, self.hid_chans_dense, self.ksz_dense,
                           act, dt, name=f"enc_dense{li}")(h)
            enc_out.append(h)
        h = Conv2DActNorm(hc * 2, (3, 3), 2, 0, 1, activation=act, dtype=dt,
                          name="down_a")(h)
        enc_out.append(h)
        h = Conv2DActNorm(hc * 4, (3, 3), 2, 0, 1, activation=act, dtype=dt,
                          name="down_b")(h)
        enc_out.append(h)
        h = Conv2DActNorm(self.tcn_channels, (3, 3), 1, 0, 1, activation=act,
                          dtype=dt, name="down_c")(h)
        enc_out.append(h)
        assert h.shape[2] == 1, h.shape

        # TCN bottleneck over time
        z = h[:, :, 0, :]
        for r in range(self.tcn_repeats):
            for x_ in range(self.tcn_blocks):
                z = TCNResBlock(self.tcn_channels, self.ksz_tcn, 2 ** x_,
                                act, dt, name=f"tcn{r}_{x_}")(z)
        h = z[:, :, None, :]

        # decoder with skip concats (reverse of encoder)
        h = Conv2DActNorm(hc * 4, (3, 3), 1, 0, 1, upsample=True,
                          activation=act, dtype=dt, name="up_c")(
            jnp.concatenate([h, enc_out[-1]], axis=-1))
        h = Conv2DActNorm(hc * 2, (3, 3), 2, 0, 1, upsample=True,
                          activation=act, dtype=dt, name="up_b")(
            jnp.concatenate([h, enc_out[-2]], axis=-1))
        h = Conv2DActNorm(hc, (3, 3), 2, 0, 1, upsample=True,
                          activation=act, dtype=dt, name="up_a")(
            jnp.concatenate([h, enc_out[-3]], axis=-1))
        for di in range(len(depths)):
            nf = depths[len(depths) - di - 1]
            h = jnp.concatenate([h, enc_out[-4 - di]], axis=-1)
            h = DenseBlock(hc * 2, nf, self.hid_chans_dense, self.ksz_dense,
                           act, dt, name=f"dec_dense{di}")(h)
            h = Conv2DActNorm(hc, (3, 3), 2, 0, 1, upsample=True,
                              activation=act, dtype=dt, name=f"up{di}")(h)
        h = jnp.concatenate([h, enc_out[0]], axis=-1)
        h = DenseBlock(hc * 2, num_freqs, self.hid_chans_dense,
                       self.ksz_dense, act, dt, name="last_dense")(h)
        # final transposed conv: F-2 -> F, 2*n_spk channels, no act/norm
        w = self.param("last_kernel", nn.initializers.lecun_normal(),
                       (3, 3, h.shape[-1], 2 * self.n_spk), dt)
        bb = self.param("last_bias", nn.initializers.zeros,
                        (2 * self.n_spk,), dt)
        h = jax.lax.conv_general_dilated(
            h.astype(dt), w, (1, 1), padding=((1, 1), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bb  # (B, T, F, 2*n_spk)
        h = h.reshape(b, t, self.in_freqs, 2, self.n_spk)
        out = jax.lax.complex(h[..., 0, :], h[..., 1, :])
        return out.transpose(0, 3, 1, 2)  # (B, n_spk, T, F)


def mfmcwf(mix: jnp.ndarray, est: jnp.ndarray, n_chunks: int,
           tik_eps: float) -> jnp.ndarray:
    """Multi-frame multi-channel Wiener filter
    (`ineube_separator.py:156`).

    mix: complex (B, T, C, F) multichannel mixture STFT;
    est: complex (B', T, F) monaural target estimates (B' = B * n_spk);
    returns complex (B', T, F) beamformed estimates.
    """
    b, t, c, f = mix.shape
    spk = est.shape[0] // b
    # unfold +-n_chunks context frames into the channel axis
    ctx = 2 * n_chunks + 1
    if n_chunks > 0:
        pad = jnp.pad(mix, ((0, 0), (n_chunks, n_chunks), (0, 0), (0, 0)))
        mix_unf = jnp.stack(
            [pad[:, i : i + t] for i in range(ctx)], axis=2
        ).reshape(b, t, c * ctx, f)
    else:
        mix_unf = mix
    m = mix_unf.shape[2]
    # per target source
    mix_r = jnp.repeat(mix_unf, spk, axis=0)  # (B', T, M, F)
    zeta = jnp.einsum("btmf,btf->bmf", mix_r, jnp.conj(est))
    scm = jnp.einsum("btmf,btnf->bmnf", mix_r, jnp.conj(mix_r))
    scm = scm.transpose(0, 3, 1, 2)  # (B', F, M, M)
    # Tikhonov loading scaled by the trace (`beamformer.py:1142` tik_reg),
    # detached from the graph like the reference's no_grad block
    tr = jax.lax.stop_gradient(
        jnp.trace(scm, axis1=-2, axis2=-1).real[..., None, None]
    )
    scm = scm + (tr * tik_eps + 1e-8) * jnp.eye(m, dtype=scm.dtype)[None, None]
    w = jnp.linalg.solve(scm, zeta.transpose(0, 2, 1)[..., None])[..., 0]
    # beamform: w^H · mix
    return jnp.einsum("bfm,btmf->btf", jnp.conj(w), mix_r)


class iNeuBeSeparator(nn.Module):
    """iNeuBe (`ineube_separator.py:16`): waveform-domain, multichannel.

    Input: mixture (B, N) or (B, N, C). Output: (est (B, n_spk, N), lens,
    {"dnn1"/"beam": intermediate estimates when output_from != dnn1}).
    """

    n_spk: int = 1
    n_fft: int = 512
    stride: int = 128
    mic_channels: int = 1
    hid_chans: int = 32
    hid_chans_dense: int = 32
    ksz_dense: Tuple[int, int] = (3, 3)
    ksz_tcn: int = 3
    tcn_repeats: int = 4
    tcn_blocks: int = 7
    tcn_channels: int = 384
    activation: str = "elu"
    output_from: str = "dnn1"  # dnn1 | mfmcwf | dnn2
    n_chunks: int = 3
    freeze_dnn1: bool = False
    tik_eps: float = 1e-8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav, lengths, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
        from espnet_tpu.ops.stft import istft, stft

        if wav.ndim == 2:
            wav = wav[..., None]
        b, n_mix, c = wav.shape
        assert c == self.mic_channels, (c, self.mic_channels)
        flat = wav.transpose(0, 2, 1).reshape(b * c, n_mix)
        re, im = stft(flat, self.n_fft, self.stride, self.n_fft)
        t, f = re.shape[1], re.shape[2]
        mix = jax.lax.complex(re, im).reshape(b, c, t, f).transpose(0, 2, 1, 3)

        feats = jnp.concatenate(
            [re.reshape(b, c, t, f), im.reshape(b, c, t, f)], axis=1
        ).transpose(0, 2, 3, 1)  # (B, T, F, 2C)

        unet_kw = dict(
            in_freqs=f, hid_chans=self.hid_chans,
            hid_chans_dense=self.hid_chans_dense, ksz_dense=self.ksz_dense,
            ksz_tcn=self.ksz_tcn, tcn_repeats=self.tcn_repeats,
            tcn_blocks=self.tcn_blocks, tcn_channels=self.tcn_channels,
            activation=self.activation, dtype=self.dtype,
        )
        est1 = TCNDenseUNet(n_spk=self.n_spk, mic_channels=c, name="dnn1",
                            **unet_kw)(feats)  # (B, spk, T, F) complex
        if self.freeze_dnn1:
            est1 = jax.lax.stop_gradient(est1)

        def to_wav(cplx):  # (B, spk, T, F) complex -> (B, spk, N)
            flat_ = cplx.reshape(b * self.n_spk, t, f)
            w_ = istft(jnp.real(flat_), jnp.imag(flat_), self.n_fft,
                       self.stride)
            nn_ = w_.shape[1]
            if nn_ < n_mix:
                w_ = jnp.pad(w_, ((0, 0), (0, n_mix - nn_)))
            return w_[:, :n_mix].reshape(b, self.n_spk, n_mix)

        others: Dict[str, jnp.ndarray] = {}
        out1 = to_wav(est1)
        if self.output_from == "dnn1":
            return out1, lengths, others
        others["dnn1"] = out1
        est_bf = mfmcwf(
            mix, est1.reshape(b * self.n_spk, t, f), self.n_chunks,
            self.tik_eps,
        ).reshape(b, self.n_spk, t, f)
        out_bf = to_wav(est_bf)
        if self.output_from == "mfmcwf":
            return out_bf, lengths, others
        others["beam"] = out_bf
        # DNN2 input: [mixture (C), dnn1 (1), mfmcwf (1)] per source
        mix_rep = jnp.repeat(feats, self.n_spk, axis=0)  # (B*spk, T, F, 2C)
        e1 = est1.reshape(b * self.n_spk, t, f)
        eb = est_bf.reshape(b * self.n_spk, t, f)
        cat = jnp.concatenate(
            [mix_rep[..., :c], jnp.real(e1)[..., None],
             jnp.real(eb)[..., None], mix_rep[..., c:],
             jnp.imag(e1)[..., None], jnp.imag(eb)[..., None]],
            axis=-1,
        )  # (B*spk, T, F, 2*(C+2))
        est2 = TCNDenseUNet(n_spk=1, mic_channels=c + 2, name="dnn2",
                            **unet_kw)(cat)  # (B*spk, 1, T, F)
        out2 = to_wav(est2[:, 0].reshape(b, self.n_spk, t, f))
        return out2, lengths, others
