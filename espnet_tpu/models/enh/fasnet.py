"""FaSNet-TAC: filter-and-sum network with transform-average-concatenate.

Behavioral spec: reference `espnet2/enh/separator/fasnet_separator.py:14`
built from `espnet2/enh/layers/fasnet.py` (FaSNet_TAC :296, BF_module :18,
seg_signal_context :172, seq_cos_sim :240) and `layers/dprnn.py`
(DPRNN_TAC :174 — dual-path RNN with a cross-channel TAC block per layer).
Luo et al. 2019/2020: each mic's context window is scored against the
reference mic's center frame (cosine similarity over all lags), a DPRNN+TAC
stack predicts one time-domain beamforming filter per (mic, speaker, frame),
filters are convolved with the context and the filtered mics are summed.

TPU-first notes: the reference's per-lag python loops and grouped-conv
tricks become static gather-matrices + einsums (one batched matmul per
stage); channel-count variability is a static channel mask instead of
per-sample python branching; segmentation reuses the shared 50%-overlap
segment/merge helpers.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.enh.layers import merge_segments, segment_sequence


class _GlobLN(nn.Module):
    """GroupNorm(1, N): normalize over every non-batch axis, per-feature
    scale/bias on the last axis."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True)
        var = jnp.var(x, axis=tuple(range(1, x.ndim)), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.dtype)
        return h * scale + bias


class _BiLSTMProj(nn.Module):
    """SingleRNN (`dprnn.py:18`): (B)LSTM + linear projection back to N."""

    features: int
    hidden: int
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B', L, N)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")(x)
        if self.bidirectional:
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                         keep_order=True, name="bwd")(x)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            h = fwd
        return nn.Dense(self.features, dtype=self.dtype, name="proj")(h)


class DPRNNTACBlock(nn.Module):
    """One DPRNN_TAC layer (`dprnn.py:174`): intra-segment BLSTM,
    inter-segment (B)LSTM, then TAC across channels — each with global
    layer norm and a residual connection."""

    features: int            # N
    hidden: int              # H
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ch_mask=None):
        """x: (B, C, S, K, N); ch_mask: (B, C) validity or None."""
        b, c, s, k, n = x.shape
        # intra-segment (over K)
        h = _BiLSTMProj(n, self.hidden, True, self.dtype,
                        name="row_rnn")(x.reshape(b * c * s, k, n))
        h = _GlobLN(n, self.dtype, name="row_norm")(
            h.reshape(b * c, s, k, n))
        x = x + h.reshape(b, c, s, k, n)
        # inter-segment (over S)
        h = (x.transpose(0, 1, 3, 2, 4).reshape(b * c * k, s, n))
        h = _BiLSTMProj(n, self.hidden, True, self.dtype, name="col_rnn")(h)
        h = (h.reshape(b * c, k, s, n).transpose(0, 2, 1, 3))
        h = _GlobLN(n, self.dtype, name="col_norm")(h)
        x = x + h.reshape(b, c, s, k, n)
        # TAC (over C)
        t = nn.Dense(3 * self.hidden, dtype=self.dtype,
                     name="ch_transform")(x)
        t = nn.PReLU()(t)                               # (B, C, S, K, 3H)
        if ch_mask is None:
            avg = jnp.mean(t, axis=1, keepdims=True)
        else:
            m = ch_mask[:, :, None, None, None].astype(t.dtype)
            avg = jnp.sum(t * m, axis=1, keepdims=True) / jnp.maximum(
                jnp.sum(m, axis=1, keepdims=True), 1.0)
        avg = nn.PReLU()(nn.Dense(3 * self.hidden, dtype=self.dtype,
                                  name="ch_average")(avg))
        avg = jnp.broadcast_to(avg, t.shape)
        h = nn.PReLU()(nn.Dense(n, dtype=self.dtype, name="ch_concat")(
            jnp.concatenate([t, avg], axis=-1)))
        h = _GlobLN(n, self.dtype, name="ch_norm")(
            h.reshape(b * c, s, k, n)).reshape(b, c, s, k, n)
        return x + h


class FaSNetTAC(nn.Module):
    """Single-stage FaSNet + TAC (`fasnet.py:296`).

    __call__(wav (B, n, C), lengths, ch_mask) -> (B, num_spk, n).
    """

    enc_dim: int = 64
    feature_dim: int = 64
    hidden_dim: int = 128
    layers: int = 4
    segment_size: int = 50
    num_spk: int = 2
    win_ms: int = 4
    context_ms: int = 16
    sr: int = 16000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav, lengths, ch_mask=None,
                 deterministic: bool = True):
        b, n_samples, c = wav.shape
        x = wav.transpose(0, 2, 1)                      # (B, C, T)
        window = max(int(self.sr * self.win_ms / 1000), 2)
        stride = window // 2
        context = int(self.sr * self.context_ms / 1000)
        filter_dim = 2 * context + 1

        # --- frame into center windows + context (`fasnet.py:172`) -------
        rest = window - (stride + n_samples % window) % window
        x = jnp.pad(x, ((0, 0), (0, 0), (stride, rest + stride)))
        padded = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 0), (context, context)))
        n_chunks = 2 * padded // window - 1
        idx = (np.arange(n_chunks) * stride)[:, None] + np.arange(
            2 * context + window)[None, :]
        chunks = x[:, :, idx]                           # (B, C, L, 2c+w)
        center = chunks[:, :, :, context:context + window]  # (B, C, L, w)

        # --- per-chunk waveform encoder (one matmul) ----------------------
        enc = nn.Dense(self.enc_dim, use_bias=False, dtype=self.dtype,
                       name="encoder")(chunks)          # (B, C, L, N)
        enc = _GlobLN(self.enc_dim, self.dtype, name="enc_ln")(
            enc.reshape(b * c, n_chunks, self.enc_dim)
        ).reshape(b, c, n_chunks, self.enc_dim)

        # --- cosine similarity vs ref-mic center frame (`:240`) ----------
        ref = center[:, 0]                              # (B, L, w)
        lag_idx = (np.arange(filter_dim)[:, None]
                   + np.arange(window)[None, :])        # (2c+1, w)
        ctx_win = chunks[:, :, :, lag_idx]              # (B, C, L, 2c+1, w)
        num = jnp.einsum("bclkw,blw->bclk", ctx_win, ref)
        ref_n = jnp.linalg.norm(ref, axis=-1)[:, None, :, None]
        win_n = jnp.linalg.norm(ctx_win, axis=-1)
        cos = num / (win_n * ref_n + 1e-8)              # (B, C, L, 2c+1)

        feat = jnp.concatenate([enc, cos], axis=-1)     # (B,C,L,N+2c+1)

        # --- BF module (`fasnet.py:18`): 1x1 BN conv, segment, DPRNN+TAC -
        h = nn.Dense(self.feature_dim, use_bias=False, dtype=self.dtype,
                     name="bn")(feat)
        seg, t_orig = segment_sequence(
            h.reshape(b * c, n_chunks, self.feature_dim), self.segment_size)
        s_chunks = seg.shape[1]
        seg = seg.reshape(b, c, s_chunks, self.segment_size,
                          self.feature_dim)
        for i in range(self.layers):
            seg = DPRNNTACBlock(self.feature_dim, self.hidden_dim,
                                self.dtype, name=f"dprnn_tac{i}")(
                seg, ch_mask)
        seg = nn.PReLU()(seg)
        seg = nn.Dense(self.feature_dim * self.num_spk, dtype=self.dtype,
                       name="dprnn_out")(seg)
        seg = seg.reshape(b, c, s_chunks, self.segment_size, self.num_spk,
                          self.feature_dim)
        seg = seg.transpose(0, 1, 4, 2, 3, 5).reshape(
            b * c * self.num_spk, s_chunks, self.segment_size,
            self.feature_dim)
        h = merge_segments(seg, t_orig)   # (B*C*nspk, L, feat)
        # gated output -> per-frame filters (`fasnet.py:63-70`)
        flt = (jnp.tanh(nn.Dense(filter_dim, dtype=self.dtype,
                                 name="output")(h))
               * nn.sigmoid(nn.Dense(filter_dim, dtype=self.dtype,
                                     name="output_gate")(h)))
        flt = flt.reshape(b, c, self.num_spk, n_chunks, filter_dim)

        # --- convolve filters with each mic's context (`:373`) -----------
        # out[..., t] = sum_k filter[k] * context[t + k]
        conv_idx = (np.arange(window)[:, None]
                    + np.arange(filter_dim)[None, :])   # (w, 2c+1)
        ctx2 = chunks[:, :, :, conv_idx]                # (B, C, L, w, 2c+1)
        bf = jnp.einsum("bclwk,bcnlk->bcnlw", ctx2, flt)

        # --- overlap-add windows back to a waveform -----------------------
        oa_idx = ((np.arange(n_chunks) * stride)[:, None]
                  + np.arange(window)[None, :]).reshape(-1)
        sig = jnp.zeros((b, c, self.num_spk, padded), self.dtype)
        sig = sig.at[:, :, :, oa_idx].add(
            bf.reshape(b, c, self.num_spk, n_chunks * window))
        sig = sig[:, :, :, stride:padded - rest - stride]  # (B,C,nspk,n)

        # --- filter-and-sum across valid channels -------------------------
        if ch_mask is None:
            return jnp.mean(sig, axis=1)
        m = ch_mask[:, :, None, None].astype(sig.dtype)
        return jnp.sum(sig * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class FaSNetSeparator(nn.Module):
    """Waveform-to-waveform FaSNet separator
    (`espnet2/enh/separator/fasnet_separator.py:14`) — plugs into the
    enhancement model's direct waveform path like the neural beamformer."""

    enc_dim: int = 64
    feature_dim: int = 64
    hidden_dim: int = 128
    layers: int = 4
    segment_size: int = 50
    num_spk: int = 2
    predict_noise: bool = False
    win_ms: int = 4
    context_ms: int = 16
    sr: int = 16000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, speech_mix, lengths, deterministic: bool = True,
                 ch_mask: Optional[jnp.ndarray] = None):
        """speech_mix (B, n, C) -> ((B, num_spk, n), lengths, others)."""
        n_out = self.num_spk + 1 if self.predict_noise else self.num_spk
        wavs = FaSNetTAC(
            self.enc_dim, self.feature_dim, self.hidden_dim, self.layers,
            self.segment_size, n_out, self.win_ms, self.context_ms,
            self.sr, self.dtype, name="fasnet",
        )(speech_mix, lengths, ch_mask, deterministic)
        others = {}
        if self.predict_noise:
            others["noise1"] = wavs[:, -1]
            wavs = wavs[:, :self.num_spk]
        return wavs, lengths, others
