"""SVoice separator (Voice Separation with an Unknown Number of Speakers).

Behavioral spec: reference `espnet2/enh/separator/svoice_separator.py:95`
(SVoiceSeparator) + `espnet2/enh/layers/dpmulcat.py` (MulCatBlock :5,
DPMulCat :89): raw waveform -> 50%-overlap conv encoder -> dual-path
MulCat (multiply-and-concat gated BLSTM) blocks over (intra-segment,
inter-segment) axes -> per-speaker features -> average-pool decoder with
overlap-add. The reference emits a waveform estimate after EVERY MulCat
block during training (deep supervision); here the final block's output is
the primary estimate and the earlier blocks' are exposed under
`others["layer<i>"]` for a multi-scale loss.

TPU-first notes: waveform-domain separator (bypasses the task's
encoder/decoder pair, like FaSNet); segmentation is the static 50%-overlap
reshape shared with DPRNN; LSTMs ride `nn.RNN` scans over static shapes;
the decoder's average-pool + overlap-add is a reshape + strided add.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.enh.layers import merge_segments, segment_sequence


class MulCatBlock(nn.Module):
    """Gated (Bi)LSTM: rnn_proj(rnn(x)) * gate_proj(gate_rnn(x)), then
    projection of [gated, x] back to input size (`dpmulcat.py:5`)."""

    input_size: int
    hidden: int
    bidirectional: bool = True
    dtype: Any = jnp.float32

    def _lstm(self, x, name):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                     name=f"{name}_fwd")(x)
        if not self.bidirectional:
            return fwd
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                     reverse=True, keep_order=True, name=f"{name}_bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)

    @nn.compact
    def __call__(self, x):
        rnn_out = nn.Dense(self.input_size, dtype=self.dtype,
                           name="rnn_proj")(self._lstm(x, "rnn"))
        gate_out = nn.Dense(self.input_size, dtype=self.dtype,
                            name="gate_proj")(self._lstm(x, "gate"))
        gated = rnn_out * gate_out
        return nn.Dense(self.input_size, dtype=self.dtype,
                        name="block_proj")(
            jnp.concatenate([gated, x], axis=-1))


class SVoiceSeparator(nn.Module):
    """SVoice waveform separator (`svoice_separator.py:95`).

    Input: mixture waveform (B, N). Output: (est (B, num_spk, N), lens,
    {"layer<i>": (B, num_spk, N)} intermediate estimates).
    """

    enc_dim: int = 128
    kernel_size: int = 8
    hidden_size: int = 128
    num_spk: int = 2
    num_layers: int = 4
    segment_size: int = 20
    bidirectional: bool = True
    input_normalize: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav, lengths, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
        b, n_mix = wav.shape
        k, hop = self.kernel_size, self.kernel_size // 2
        # ---- encoder: 50%-overlap Conv1d + ReLU (`svoice_separator.py:62`)
        frames = 1 + (n_mix - k) // hop
        x = wav[:, : (frames - 1) * hop + k, None]
        feat = nn.relu(nn.Conv(
            self.enc_dim, (k,), strides=(hop,), padding="VALID",
            use_bias=False, dtype=self.dtype, name="encoder",
        )(x))  # (B, T, N)
        t = feat.shape[1]

        # ---- dual-path MulCat over (intra-segment, inter-segment) ----
        seg, _ = segment_sequence(feat, self.segment_size)  # (B, S, K, N)
        s_cnt = seg.shape[1]
        outputs = []
        out = seg
        for li in range(self.num_layers):
            # rows: within-segment (time) axis
            row_in = out.reshape(b * s_cnt, self.segment_size, self.enc_dim)
            row_out = MulCatBlock(
                self.enc_dim, self.hidden_size, self.bidirectional,
                self.dtype, name=f"row{li}",
            )(row_in).reshape(b, s_cnt, self.segment_size, self.enc_dim)
            if self.input_normalize:
                row_out = nn.LayerNorm(epsilon=1e-8, dtype=self.dtype,
                                       name=f"row_norm{li}",
                                       reduction_axes=(1, 2, 3))(row_out)
            out = out + row_out
            # cols: across-segment axis
            col_in = out.transpose(0, 2, 1, 3).reshape(
                b * self.segment_size, s_cnt, self.enc_dim)
            col_out = MulCatBlock(
                self.enc_dim, self.hidden_size, self.bidirectional,
                self.dtype, name=f"col{li}",
            )(col_in).reshape(b, self.segment_size, s_cnt, self.enc_dim)
            col_out = col_out.transpose(0, 2, 1, 3)
            if self.input_normalize:
                col_out = nn.LayerNorm(epsilon=1e-8, dtype=self.dtype,
                                       name=f"col_norm{li}",
                                       reduction_axes=(1, 2, 3))(col_out)
            out = out + col_out
            outputs.append(out)

        # shared per-speaker output head (`dpmulcat.py:142` self.output)
        prelu = nn.PReLU(name="out_prelu")
        head = nn.Dense(self.enc_dim * self.num_spk, dtype=self.dtype,
                        name="out_proj")

        def to_wav(seg_feat):
            h = head(prelu(seg_feat))  # (B, S, K, spk*N)
            h = h.reshape(b, s_cnt, self.segment_size, self.num_spk,
                          self.enc_dim)
            h = h.transpose(0, 3, 1, 2, 4).reshape(
                b * self.num_spk, s_cnt, self.segment_size, self.enc_dim)
            feat_spk = merge_segments(h, t)  # (B*spk, T, N)
            # decoder (`svoice_separator.py:83`): avg-pool groups of k
            # along the feature axis, then overlap-add with hop k//2
            sub = feat_spk.reshape(
                b * self.num_spk, t, self.enc_dim // k, k
            ).mean(axis=-1)  # (B*spk, T, N/k) frames of length N/k
            # reference Decoder: overlap-add the length-(N/k) frames with
            # hop kernel_size // 2 (`svoice_separator.py:90`)
            wav_est = _overlap_add(sub, hop=hop)
            pad = n_mix - wav_est.shape[-1]
            if pad > 0:
                wav_est = jnp.pad(wav_est, ((0, 0), (0, pad)))
            else:
                wav_est = wav_est[:, :n_mix]
            return wav_est.reshape(b, self.num_spk, n_mix)

        others: Dict[str, jnp.ndarray] = {}
        for li, seg_feat in enumerate(outputs[:-1]):
            others[f"layer{li + 1}"] = to_wav(seg_feat)
        est = to_wav(outputs[-1])
        return est, lengths, others


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """(B, F, L) frames -> (B, (F-1)*hop + L) via strided accumulation
    (`svoice_separator.py:14` overlap_and_add)."""
    b, f, ln = frames.shape
    out_len = (f - 1) * hop + ln
    idx = (np.arange(f) * hop)[:, None] + np.arange(ln)[None, :]
    out = jnp.zeros((b, out_len), frames.dtype)
    return out.at[:, idx.reshape(-1)].add(frames.reshape(b, f * ln))
