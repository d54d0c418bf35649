"""FastSpeech2: non-autoregressive TTS with a variance adaptor.

Behavioral spec: reference `espnet2/tts/fastspeech2/fastspeech2.py:33`
(transformer encoder over phone ids -> variance adaptor {duration, pitch,
energy predictors + length regulator} -> transformer decoder -> mel +
postnet refinement; losses = L1(mel before+after postnet) + MSE(log-dur) +
MSE(pitch) + MSE(energy), masked; `inference:694` uses predicted variances).
`variance_predictor.py`, `length_regulator.py`, `duration_predictor.py`
define the submodules.

TPU formulation: the length regulator is a static-shape gather — output
frame t takes token index sum(cumsum(dur) <= t) — so expansion is one
comparison matrix + gather instead of per-utterance python repeats.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.embedding import add_positional_encoding
from espnet_tpu.models.transformer import TransformerEncoderLayer
from espnet_tpu.ops.masks import attention_bias, make_valid_mask


@dataclasses.dataclass(frozen=True)
class FastSpeech2Config:
    vocab_size: int = -1
    n_mels: int = 80
    d_model: int = 384
    num_heads: int = 2
    d_ff: int = 1536
    encoder_layers: int = 4
    decoder_layers: int = 4
    predictor_layers: int = 2
    predictor_channels: int = 256
    predictor_kernel: int = 3
    postnet_layers: int = 5
    postnet_channels: int = 512
    use_scaled_pos_enc: bool = True  # reference default (`fastspeech2.py:65`)
    # multi-speaker / multi-lingual conditioning
    # (`espnet2/tts/fastspeech2/fastspeech2.py:67-69`; integration applied
    # to encoder output before the variance adaptor, default "add")
    spks: int = 0
    langs: int = 0
    spk_embed_dim: int = 0
    spk_embed_integration_type: str = "add"
    dropout_rate: float = 0.1
    max_frames: int = 2048  # static upper bound for expanded length
    dtype: object = jnp.float32


class VariancePredictor(nn.Module):
    """Conv stack -> scalar per token (`fastspeech2/variance_predictor.py`)."""

    channels: int
    layers: int
    kernel: int
    dropout_rate: float
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        h = x
        for i in range(self.layers):
            h = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        out = nn.Dense(1, dtype=self.dtype, name="out")(h)[..., 0]
        return out * mask.astype(out.dtype)


def length_regulate(
    hs: jnp.ndarray,        # (B, U, D)
    durations: jnp.ndarray, # (B, U) int frames per token
    max_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand token reps by durations. Returns (B, max_frames, D), (B,) lens."""
    cum = jnp.cumsum(durations, axis=1)  # (B, U)
    total = cum[:, -1]
    t = jnp.arange(max_frames)[None, :, None]  # (1, T, 1)
    idx = jnp.sum(cum[:, None, :] <= t, axis=-1)  # (B, T) token index per frame
    idx = jnp.minimum(idx, hs.shape[1] - 1)
    out = jnp.take_along_axis(hs, idx[..., None], axis=1)
    valid = (jnp.arange(max_frames)[None, :] < total[:, None])[..., None]
    return out * valid.astype(out.dtype), jnp.minimum(total, max_frames)


class Postnet(nn.Module):
    """5x conv1d refinement (`espnet/nets/pytorch_backend/tacotron2/decoder.py`
    Postnet:150, shared by FastSpeech2/Tacotron2/TransformerTTS/SVS):
    conv(bias=False) -> BatchNorm -> tanh (all but last) -> dropout, with
    BatchNorm+dropout on the final projection too. BatchNorm running stats
    live in the 'batch_stats' collection (threaded by train/steps.py);
    eval uses the running averages like torch eval mode."""

    n_mels: int
    channels: int
    layers: int
    dtype: object = jnp.float32
    use_batch_norm: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x
        for i in range(self.layers):
            last = i == self.layers - 1
            h = nn.Conv(self.n_mels if last else self.channels, (5,),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(h)
            if self.use_batch_norm:
                h = nn.BatchNorm(
                    use_running_average=deterministic, momentum=0.9,
                    epsilon=1e-5, dtype=jnp.float32, name=f"norm{i}",
                )(h.astype(jnp.float32)).astype(h.dtype)
            if not last:
                h = nn.tanh(h)
            h = nn.Dropout(0.5)(h, deterministic=deterministic)
        return h


class _FFTBlockStack(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    layers: int
    dropout_rate: float
    dtype: object
    # reference FS2 default use_scaled_pos_enc=True (`fastspeech2.py:65`,
    # ScaledPositionalEncoding): x + alpha*pe with a trainable alpha and NO
    # sqrt(d) input scaling, vs the vanilla x*sqrt(d)+pe
    scaled_pos: bool = False

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        mask = make_valid_mask(lengths, x.shape[1])
        bias = attention_bias(mask[:, None, None, :])
        if self.scaled_pos:
            from espnet_tpu.models.embedding import sinusoidal_table

            alpha = self.param("pos_alpha", nn.initializers.ones, (1,),
                               jnp.float32)
            pe = jnp.asarray(sinusoidal_table(x.shape[1], self.d_model))
            x = x + alpha.astype(x.dtype) * pe.astype(x.dtype)
        else:
            x = add_positional_encoding(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        for i in range(self.layers):
            x = TransformerEncoderLayer(
                self.d_model, self.num_heads, self.d_ff, self.dropout_rate,
                dtype=self.dtype, name=f"layer{i}",
            )(x, bias, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return x * mask[..., None].astype(x.dtype)


class FastSpeech2(nn.Module):
    config: FastSpeech2Config

    def setup(self):
        c = self.config
        self.embed = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype)
        self.encoder = _FFTBlockStack(c.d_model, c.num_heads, c.d_ff,
                                      c.encoder_layers, c.dropout_rate,
                                      c.dtype, scaled_pos=c.use_scaled_pos_enc,
                                      name="encoder")
        self.decoder = _FFTBlockStack(c.d_model, c.num_heads, c.d_ff,
                                      c.decoder_layers, c.dropout_rate,
                                      c.dtype, scaled_pos=c.use_scaled_pos_enc,
                                      name="decoder")
        pk = dict(channels=c.predictor_channels, layers=c.predictor_layers,
                  kernel=c.predictor_kernel, dropout_rate=0.5, dtype=c.dtype)
        self.duration_predictor = VariancePredictor(**pk, name="duration")
        self.pitch_predictor = VariancePredictor(**pk, name="pitch")
        self.energy_predictor = VariancePredictor(**pk, name="energy")
        self.pitch_embed = nn.Conv(c.d_model, (9,), padding="SAME",
                                   dtype=c.dtype, name="pitch_embed")
        self.energy_embed = nn.Conv(c.d_model, (9,), padding="SAME",
                                    dtype=c.dtype, name="energy_embed")
        if c.spks > 1 or c.langs > 1 or c.spk_embed_dim > 0:
            from espnet_tpu.models.tts.spk_embed import SpeakerConditioner

            self.spk_cond = SpeakerConditioner(
                spks=c.spks, langs=c.langs, spk_embed_dim=c.spk_embed_dim,
                integration_type=c.spk_embed_integration_type,
                units=c.d_model, dtype=c.dtype,
            )
            if c.spk_embed_dim > 0 and \
                    c.spk_embed_integration_type == "concat":
                # fold the concatenated width back to d_model so the
                # variance adaptor / decoder geometry is unchanged
                # (reference keeps adim by conditioning pre-adaptor)
                self.spk_cond_proj = nn.Dense(c.d_model, dtype=c.dtype,
                                              name="spk_cond_proj")
            else:
                self.spk_cond_proj = None
        else:
            self.spk_cond = None
            self.spk_cond_proj = None
        self.mel_out = nn.Dense(c.n_mels, dtype=c.dtype, name="mel_out")
        self.postnet = Postnet(c.n_mels, c.postnet_channels, c.postnet_layers,
                               c.dtype, name="postnet")

    def _encode(self, text, text_lengths, deterministic,
                sids=None, lids=None, spembs=None):
        hs = self.encoder(self.embed(text), text_lengths, deterministic)
        if self.spk_cond is not None:
            hs = self.spk_cond(hs, sids, lids, spembs)
            if self.spk_cond_proj is not None:
                hs = self.spk_cond_proj(hs)
        return hs

    def _variance(self, hs, text_lengths, deterministic):
        tmask = make_valid_mask(text_lengths, hs.shape[1])
        d_pred = self.duration_predictor(hs, tmask, deterministic)  # log-dur
        p_pred = self.pitch_predictor(hs, tmask, deterministic)
        e_pred = self.energy_predictor(hs, tmask, deterministic)
        return d_pred, p_pred, e_pred, tmask

    def __call__(
        self,
        text: jnp.ndarray,          # (B, U)
        text_lengths: jnp.ndarray,
        mel: jnp.ndarray,           # (B, T, n_mels) target
        mel_lengths: jnp.ndarray,
        durations: jnp.ndarray,     # (B, U) int ground-truth frames
        pitch: jnp.ndarray,         # (B, U) token-averaged pitch targets
        energy: jnp.ndarray,        # (B, U)
        deterministic: bool = True,
        sids: Optional[jnp.ndarray] = None,
        lids: Optional[jnp.ndarray] = None,
        spembs: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        """Teacher-forced training forward. Returns (loss, stats, mel_post)."""
        c = self.config
        hs = self._encode(text, text_lengths, deterministic,
                          sids=sids, lids=lids, spembs=spembs)
        d_pred, p_pred, e_pred, tmask = self._variance(hs, text_lengths,
                                                       deterministic)
        # embed ground-truth variances (teacher forcing, fastspeech2.py:33)
        hs = hs + self.pitch_embed(pitch[..., None])
        hs = hs + self.energy_embed(energy[..., None])
        t_max = mel.shape[1]
        hs_exp, out_lens = length_regulate(hs, durations, t_max)
        hd = self.decoder(hs_exp, mel_lengths, deterministic)
        mel_before = self.mel_out(hd)
        mel_post = mel_before + self.postnet(mel_before, deterministic)

        fmask = make_valid_mask(mel_lengths, t_max)[..., None].astype(jnp.float32)
        n_el = jnp.maximum(jnp.sum(fmask), 1.0) * c.n_mels
        # reference FastSpeech2Loss: masked-mean L1 of before- and after-
        # postnet outputs, summed
        l1 = (jnp.sum(jnp.abs(mel_before - mel) * fmask)
              + jnp.sum(jnp.abs(mel_post - mel) * fmask)) / n_el
        tm = tmask.astype(jnp.float32)
        n_tok = jnp.maximum(jnp.sum(tm), 1.0)
        log_dur_target = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(((d_pred - log_dur_target) ** 2) * tm) / n_tok
        pitch_loss = jnp.sum(((p_pred - pitch) ** 2) * tm) / n_tok
        energy_loss = jnp.sum(((e_pred - energy) ** 2) * tm) / n_tok
        loss = l1 + dur_loss + pitch_loss + energy_loss
        stats = {
            "loss": loss, "l1_loss": l1, "duration_loss": dur_loss,
            "pitch_loss": pitch_loss, "energy_loss": energy_loss,
        }
        return loss, stats, mel_post

    def inference(
        self, text: jnp.ndarray, text_lengths: jnp.ndarray,
        speed: float = 1.0,
        sids=None, lids=None, spembs=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Non-AR synthesis with predicted variances
        (`fastspeech2.py:694`). Returns (mel (B, max_frames, n_mels), lens)."""
        c = self.config
        hs = self._encode(text, text_lengths, True,
                          sids=sids, lids=lids, spembs=spembs)
        d_pred, p_pred, e_pred, tmask = self._variance(hs, text_lengths, True)
        dur = jnp.clip(
            jnp.round((jnp.exp(d_pred) - 1.0) / speed), 0, None
        ).astype(jnp.int32) * tmask.astype(jnp.int32)
        hs = hs + self.pitch_embed(p_pred[..., None])
        hs = hs + self.energy_embed(e_pred[..., None])
        hs_exp, out_lens = length_regulate(hs, dur, c.max_frames)
        hd = self.decoder(hs_exp, out_lens, True)
        mel_before = self.mel_out(hd)
        mel_post = mel_before + self.postnet(mel_before, True)
        mask = make_valid_mask(out_lens, c.max_frames)[..., None]
        return mel_post * mask.astype(mel_post.dtype), out_lens
