"""VITS: end-to-end adversarial text-to-wave (generator side).

Behavioral spec: reference `espnet2/gan_tts/vits/` —
`generator.py` (VITSGenerator: text encoder -> (m_p, logs_p); posterior
encoder on linear spectrogram -> z; residual-coupling flow z -> z_p;
monotonic alignment search ties z_p to the text prior; HiFiGAN decoder on
random z slices), `posterior_encoder.py:19` (WaveNet conv stack),
`residual_coupling.py:18` (affine coupling with WaveNet transforms),
`text_encoder.py` (transformer + stats projection),
`monotonic_align/core.pyx:14` (maximum-path DP), `loss.py`
(KLDivergenceLoss between posterior and aligned prior).

Deviation (documented): the stochastic duration predictor
(`duration_predictor.py` StochasticDurationPredictor, a flow over
durations) is replaced by a convolutional log-duration predictor
(Glow-TTS style, same role: train MSE on MAS durations, predict at
inference). The rest of the architecture follows the reference.

TPU formulation: MAS runs as two `lax.scan`s (forward DP + backtrack)
entirely on device — the reference needs a Cython/numba kernel on CPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.embedding import add_positional_encoding
from espnet_tpu.models.transformer import TransformerEncoderLayer
from espnet_tpu.models.tts.hifigan import HiFiGANGenerator
from espnet_tpu.ops.masks import attention_bias, make_valid_mask

NEG = -1.0e9


# ---------------------------------------------------------------------------
# monotonic alignment search (device-side lax.scan DP)
# ---------------------------------------------------------------------------

def maximum_path(
    neg_x_ent: jnp.ndarray,     # (B, T_feats, T_text) log N(z_p; m_p, s_p)
    feat_lengths: jnp.ndarray,  # (B,)
    text_lengths: jnp.ndarray,  # (B,)
) -> jnp.ndarray:
    """Monotonic max-path (`monotonic_align/core.pyx:14`). Returns a 0/1
    alignment (B, T_feats, T_text)."""
    b, t_y, t_x = neg_x_ent.shape
    x_idx = jnp.arange(t_x)

    def fwd(carry, inputs):
        prev_row, _ = carry, None
        v_row, y = inputs                     # (B, T_x), scalar
        v_prev = jnp.concatenate(
            [jnp.where(y == 0, 0.0, NEG) * jnp.ones((b, 1)),
             prev_row[:, :-1]], axis=1,
        )
        v_cur = jnp.where(x_idx[None, :] == y, NEG, prev_row)
        row = v_row + jnp.maximum(v_prev, v_cur)
        # cells above the diagonal or beyond the text length are unreachable
        row = jnp.where(x_idx[None, :] > y, NEG, row)
        row = jnp.where(x_idx[None, :] >= text_lengths[:, None], NEG, row)
        return row, row

    init = jnp.full((b, t_x), NEG)
    _, rows = jax.lax.scan(
        fwd, init, (neg_x_ent.transpose(1, 0, 2), jnp.arange(t_y))
    )  # rows: (T_y, B, T_x) accumulated values

    # backtrack from (feat_len-1, text_len-1)
    def bwd(carry, inputs):
        index = carry                          # (B,)
        row_prev, y = inputs                   # rows[y-1] (B, T_x), scalar
        active = y <= (feat_lengths - 1)
        started = y == (feat_lengths - 1)
        index = jnp.where(started, text_lengths - 1, index)
        onehot = (
            (x_idx[None, :] == index[:, None]) & active[:, None]
        )
        bi = jnp.arange(b)
        v_here = row_prev[bi, index]
        v_diag = row_prev[bi, jnp.maximum(index - 1, 0)]
        move = (index != 0) & ((index == y) | (v_here < v_diag)) & active
        return jnp.where(move, index - 1, index), onehot

    rows_prev = jnp.concatenate([jnp.full((1, b, t_x), NEG), rows[:-1]], 0)
    _, path_rev = jax.lax.scan(
        bwd, jnp.zeros((b,), jnp.int32),
        (rows_prev[::-1], jnp.arange(t_y - 1, -1, -1)),
    )
    return path_rev[::-1].transpose(1, 0, 2).astype(jnp.float32)


# ---------------------------------------------------------------------------
# WaveNet residual stack (shared by posterior encoder and coupling layers)
# ---------------------------------------------------------------------------

class WaveNetStack(nn.Module):
    """Non-causal WaveNet residual/skip stack with optional conditioning
    (`espnet2/gan_tts/wavenet/residual_block.py` as used by
    `posterior_encoder.py:19`)."""

    channels: int
    kernel_size: int = 5
    layers: int = 4
    dilation_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, g=None):  # (B, T, C), (B, T, 1), (B, Cg)
        skip_sum = 0.0
        for i in range(self.layers):
            dil = self.dilation_rate ** i if self.dilation_rate > 1 else 1
            h = nn.Conv(2 * self.channels, (self.kernel_size,),
                        kernel_dilation=(dil,), padding="SAME",
                        dtype=self.dtype, name=f"in_conv{i}")(x * mask)
            if g is not None:
                # per-layer 1x1 conditioning of the gate pre-activations
                # (`gan_tts/wavenet/residual_block.py` aux conv role)
                h = h + nn.Dense(2 * self.channels, use_bias=False,
                                 dtype=self.dtype,
                                 name=f"cond{i}")(g)[:, None, :]
            a, g_ = jnp.split(h, 2, axis=-1)
            h = jnp.tanh(a) * nn.sigmoid(g_)
            out = nn.Conv(2 * self.channels, (1,), dtype=self.dtype,
                          name=f"res_skip{i}")(h)
            res, skip = jnp.split(out, 2, axis=-1)
            x = (x + res) * mask
            skip_sum = skip_sum + skip
        return skip_sum * mask


class PosteriorEncoder(nn.Module):
    """Linear spectrogram -> (z, m_q, logs_q) (`posterior_encoder.py:19`)."""

    in_dim: int
    out_channels: int = 192
    hidden: int = 192
    kernel_size: int = 5
    layers: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spec, lengths, rng, g=None):
        mask = make_valid_mask(lengths, spec.shape[1])[:, :, None].astype(
            spec.dtype
        )
        x = nn.Conv(self.hidden, (1,), dtype=self.dtype, name="pre")(spec)
        x = WaveNetStack(self.hidden, self.kernel_size, self.layers,
                         dtype=self.dtype, name="wavenet")(x, mask, g)
        stats = nn.Conv(2 * self.out_channels, (1,), dtype=self.dtype,
                        name="proj")(x) * mask
        m, logs = jnp.split(stats, 2, axis=-1)
        z = (m + jax.random.normal(rng, m.shape) * jnp.exp(logs)) * mask
        return z, m, logs


class ResidualCouplingLayer(nn.Module):
    """Affine coupling (mean-only, like the reference default
    `residual_coupling.py:110`)."""

    channels: int
    hidden: int = 192
    kernel_size: int = 5
    layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, reverse: bool = False, g=None):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden, (1,), dtype=self.dtype, name="pre")(x0)
        h = WaveNetStack(self.hidden, self.kernel_size, self.layers,
                         dtype=self.dtype, name="wavenet")(h, mask, g)
        m = nn.Conv(half, (1,), dtype=self.dtype, name="post",
                    kernel_init=nn.initializers.zeros)(h) * mask
        if not reverse:
            x1 = (x1 + m) * mask
        else:
            x1 = (x1 - m) * mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """Flow: [coupling + flip] x n (`residual_coupling.py:18`)."""

    channels: int
    hidden: int = 192
    flows: int = 4
    kernel_size: int = 5
    layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, reverse: bool = False, g=None):
        couplings = [
            ResidualCouplingLayer(self.channels, self.hidden,
                                  self.kernel_size, self.layers, self.dtype,
                                  name=f"flow{i}")
            for i in range(self.flows)
        ]
        order = reversed(couplings) if reverse else couplings
        for c in order:
            if not reverse:
                x = c(x, mask, reverse=False, g=g)
                x = x[..., ::-1]  # flip
            else:
                x = x[..., ::-1]
                x = c(x, mask, reverse=True, g=g)
        return x


class TextEncoder(nn.Module):
    """Tokens -> hidden + prior stats (`text_encoder.py`)."""

    vocab_size: int
    channels: int = 192
    num_heads: int = 2
    d_ff: int = 768
    num_layers: int = 6
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, lengths, deterministic: bool = True):
        x = nn.Embed(self.vocab_size, self.channels, dtype=self.dtype,
                     name="embed")(tokens)
        x = add_positional_encoding(x)
        bias = attention_bias(
            make_valid_mask(lengths, tokens.shape[1])[:, None, None, :]
        )
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.channels, self.num_heads, self.d_ff, self.dropout_rate,
                dtype=self.dtype, name=f"layer{i}",
            )(x, bias, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        stats = nn.Conv(2 * self.channels, (1,), dtype=self.dtype,
                        name="proj")(x)
        m, logs = jnp.split(stats, 2, axis=-1)
        return x, m, logs


class DurationPredictor(nn.Module):
    """Conv log-duration predictor (Glow-TTS style; replaces the
    reference's StochasticDurationPredictor, `duration_predictor.py`)."""

    hidden: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True, g=None):
        # stop-gradient into the text encoder like the reference SDP input
        h = jax.lax.stop_gradient(x)
        if g is not None:
            # reference SDP conditions on g via a 1x1 conv
            # (`duration_predictor.py` global_channels path)
            h = h + nn.Dense(h.shape[-1], use_bias=False, dtype=self.dtype,
                             name="cond")(jax.lax.stop_gradient(g))[:, None]
        for i in range(2):
            h = nn.Conv(self.hidden, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(1, dtype=self.dtype, name="proj")(h)[..., 0] * mask


@dataclasses.dataclass(frozen=True)
class VITSConfig:
    vocab_size: int = -1
    channels: int = 192
    # text encoder
    text_heads: int = 2
    text_d_ff: int = 768
    text_layers: int = 6
    # posterior encoder
    spec_dim: int = 513          # n_fft//2 + 1
    posterior_layers: int = 16
    # flow
    flows: int = 4
    flow_layers: int = 4
    # decoder (HiFiGAN)
    decoder_channels: int = 512
    upsample_scales: Tuple[int, ...] = (8, 8, 2, 2)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    # audio geometry
    n_fft: int = 1024
    hop_length: int = 256
    segment_frames: int = 32     # z slice length fed to the decoder
    # multi-speaker / multi-lingual global conditioning
    # (`gan_tts/vits/generator.py:238-247`: sid/lid embeddings and a
    # projected spk embedding summed into one g vector threaded through
    # posterior encoder, flow, duration predictor and decoder)
    spks: int = 0
    langs: int = 0
    spk_embed_dim: int = 0
    global_channels: int = 0     # required > 0 when any of the above set
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32


class VITSGenerator(nn.Module):
    """`generator.py` VITSGenerator."""

    config: VITSConfig

    def setup(self):
        c = self.config
        self.text_encoder = TextEncoder(
            c.vocab_size, c.channels, c.text_heads, c.text_d_ff,
            c.text_layers, c.dropout_rate, c.dtype,
        )
        self.posterior_encoder = PosteriorEncoder(
            c.spec_dim, c.channels, c.channels, layers=c.posterior_layers,
            dtype=c.dtype,
        )
        self.flow = ResidualCouplingBlock(
            c.channels, c.channels, c.flows, layers=c.flow_layers,
            dtype=c.dtype,
        )
        self.duration_predictor = DurationPredictor(dtype=c.dtype)
        self.decoder = HiFiGANGenerator(
            in_channels=c.channels, channels=c.decoder_channels,
            upsample_scales=c.upsample_scales,
            resblock_kernel_sizes=c.resblock_kernel_sizes, dtype=c.dtype,
        )
        multi = c.spks > 1 or c.langs > 1 or c.spk_embed_dim > 0
        if multi and c.global_channels <= 0:
            raise ValueError("multi-speaker VITS needs global_channels > 0")
        self.global_emb = (nn.Embed(c.spks, c.global_channels,
                                    dtype=c.dtype, name="global_emb")
                           if c.spks > 1 else None)
        self.lang_emb = (nn.Embed(c.langs, c.global_channels, dtype=c.dtype,
                                  name="lang_emb")
                         if c.langs > 1 else None)
        self.spemb_proj = (nn.Dense(c.global_channels, dtype=c.dtype,
                                    name="spemb_proj")
                           if c.spk_embed_dim > 0 else None)

    def _global_cond(self, sids, lids, spembs):
        """(B, global_channels) conditioning vector or None
        (generator.py forward: g = global_emb(sid) [+ spemb_proj(spemb)]
        [+ lang_emb(lid)])."""
        g = None
        if self.global_emb is not None:
            if sids is None:
                raise ValueError("spks > 1 but sids not provided")
            g = self.global_emb(sids.reshape(-1))
        if self.spemb_proj is not None:
            if spembs is None:
                raise ValueError("spk_embed_dim > 0 but spembs missing")
            from espnet_tpu.models.tts.spk_embed import l2_normalize

            e = self.spemb_proj(
                l2_normalize(spembs.astype(jnp.float32)).astype(spembs.dtype))
            g = e if g is None else g + e
        if self.lang_emb is not None:
            if lids is None:
                raise ValueError("langs > 1 but lids not provided")
            e = self.lang_emb(lids.reshape(-1))
            g = e if g is None else g + e
        return g

    def align_prior(self, z_p, m_p, logs_p, feat_lengths, text_lengths):
        """MAS between the flowed posterior and the text prior
        (`generator.py` forward, search part)."""
        # log N(z_p; m_p, exp(logs_p)) accumulated over channels:
        # (B, T_feats, T_text)
        s_sq_inv = jnp.exp(-2.0 * logs_p)                     # (B, Tx, C)
        neg = (
            -0.5 * jnp.einsum("byc,bxc->byx", z_p ** 2, s_sq_inv)
            + jnp.einsum("byc,bxc->byx", z_p, m_p * s_sq_inv)
            - 0.5 * jnp.sum(m_p ** 2 * s_sq_inv + 2.0 * logs_p
                            + np.log(2.0 * np.pi), axis=-1)[:, None, :]
        )
        path = maximum_path(neg, feat_lengths, text_lengths)
        return path  # (B, T_feats, T_text)

    def __call__(self, tokens, text_lengths, spec, spec_lengths,
                 deterministic: bool = True, sids=None, lids=None,
                 spembs=None):
        """Training forward. Returns dict with z slices, priors, durations.
        RNG streams: 'posterior' (sampling), 'segment' (slice choice)."""
        c = self.config
        g = self._global_cond(sids, lids, spembs)
        h_text, m_p, logs_p = self.text_encoder(
            tokens, text_lengths, deterministic
        )
        z, m_q, logs_q = self.posterior_encoder(
            spec, spec_lengths, self.make_rng("posterior"), g=g
        )
        feat_mask = make_valid_mask(spec_lengths, spec.shape[1])[..., None]
        z_p = self.flow(z, feat_mask.astype(z.dtype), reverse=False, g=g)
        path = self.align_prior(
            jax.lax.stop_gradient(z_p), jax.lax.stop_gradient(m_p),
            jax.lax.stop_gradient(logs_p), spec_lengths, text_lengths,
        )
        durations = jnp.sum(path, axis=1)                     # (B, T_text)
        # expand prior stats to the frame grid
        m_p_exp = jnp.einsum("byx,bxc->byc", path, m_p)
        logs_p_exp = jnp.einsum("byx,bxc->byc", path, logs_p)

        # duration predictor loss target: log(d + 1e-8) on valid tokens
        text_mask = make_valid_mask(text_lengths, tokens.shape[1]).astype(
            z.dtype
        )
        log_dur_pred = self.duration_predictor(
            h_text, text_mask, deterministic, g=g
        )
        log_dur_tgt = jnp.log(durations + 1.0e-8) * text_mask

        # random segment of z for the waveform decoder
        seg = c.segment_frames
        max_start = jnp.maximum(spec_lengths - seg, 0)
        u = jax.random.uniform(self.make_rng("segment"), (z.shape[0],))
        starts = (u * (max_start + 1)).astype(jnp.int32)
        z_seg = _slice_segments(z, starts, seg)
        wav_seg = self.decoder(z_seg, g=g)                    # (B, seg*up, 1)

        return {
            "wav_seg": wav_seg[..., 0],
            "seg_starts": starts,
            "z_p": z_p, "m_p_exp": m_p_exp, "logs_p_exp": logs_p_exp,
            "m_q": m_q, "logs_q": logs_q,
            "log_dur_pred": log_dur_pred, "log_dur_tgt": log_dur_tgt,
            "durations": durations, "feat_mask": feat_mask,
            "text_mask": text_mask,
        }

    def inference(self, tokens, text_lengths, max_frames: int = 1000,
                  noise_scale: float = 0.667,
                  length_scale: float = 1.0, sids=None, lids=None,
                  spembs=None):
        """Text -> waveform (`vits.py inference:541`)."""
        c = self.config
        g = self._global_cond(sids, lids, spembs)
        h_text, m_p, logs_p = self.text_encoder(tokens, text_lengths, True)
        text_mask = make_valid_mask(text_lengths, tokens.shape[1]).astype(
            m_p.dtype
        )
        log_dur = self.duration_predictor(h_text, text_mask, True, g=g)
        durations = jnp.ceil(jnp.exp(log_dur) * length_scale) * text_mask
        durations = jnp.maximum(durations, text_mask)  # >=1 frame per token
        feat_lengths = jnp.minimum(
            jnp.sum(durations, axis=1), max_frames
        ).astype(jnp.int32)
        # expand tokens -> frames (length regulator, static max_frames)
        ends = jnp.cumsum(durations, axis=1)
        starts = ends - durations
        frame_idx = jnp.arange(max_frames)[None, :, None]
        expand = (
            (frame_idx >= starts[:, None, :]) & (frame_idx < ends[:, None, :])
        ).astype(m_p.dtype)                                  # (B, Tf, Tx)
        m_p_exp = jnp.einsum("byx,bxc->byc", expand, m_p)
        logs_p_exp = jnp.einsum("byx,bxc->byc", expand, logs_p)
        feat_mask = make_valid_mask(feat_lengths, max_frames)[..., None]
        rng = self.make_rng("posterior")
        z_p = (
            m_p_exp
            + jax.random.normal(rng, m_p_exp.shape)
            * jnp.exp(logs_p_exp) * noise_scale
        ) * feat_mask
        z = self.flow(z_p, feat_mask.astype(z_p.dtype), reverse=True, g=g)
        wav = self.decoder(z, g=g)[..., 0]
        n_per_frame = int(np.prod(c.upsample_scales))
        return wav, feat_lengths * n_per_frame


def _slice_segments(x, starts, seg):
    """x (B, T, C), starts (B,) -> (B, seg, C) dynamic slices."""
    def one(xb, s):
        return jax.lax.dynamic_slice(xb, (s, 0), (seg, xb.shape[1]))

    return jax.vmap(one)(x, starts)


def slice_wav_segments(wav, starts, seg_samples, hop):
    """Matching raw-audio slices for the discriminator/mel loss."""
    def one(wb, s):
        return jax.lax.dynamic_slice(wb, (s * hop,), (seg_samples,))

    return jax.vmap(one)(wav, starts)


def vits_kl_loss(z_p, m_p_exp, logs_p_exp, logs_q, feat_mask):
    """KL(q||p) with the sampled z_p (`loss.py` KLDivergenceLoss: the
    (z_p - m_p)^2 term stands in for sigma_q^2 + (mu_q - mu_p)^2)."""
    kl = (
        logs_p_exp - logs_q - 0.5
        + 0.5 * (z_p - m_p_exp) ** 2 * jnp.exp(-2.0 * logs_p_exp)
    )
    mask = feat_mask.astype(kl.dtype)
    return jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1.0)
