"""Tacotron2: autoregressive attention-based TTS.

Behavioral spec: reference `espnet2/tts/tacotron2/tacotron2.py:26` +
`espnet/nets/pytorch_backend/tacotron2/{encoder.py:20,decoder.py:269}` +
`e2e_tts_tacotron2.py` (`Tacotron2Loss:163`, `GuidedAttentionLoss:22`):
embedding -> 3x conv(norm,relu) -> BLSTM encoder; decoder = prenet (dropout
always on) -> 2x LSTM -> location-sensitive attention -> frame projection
(reduction factor r) + stop-token logit -> postnet residual. Losses:
L1 + MSE on before/after-postnet mels, BCE(stop) with positive weighting,
guided-attention loss.

TPU formulation: ONE `nn.scan`-wrapped decoder step serves both training
(teacher frames fed via a per-step flag) and inference (free-running with
stop tracking in the carry) — the whole AR loop compiles to a fused scan,
no per-step host dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.fastspeech2 import Postnet
from espnet_tpu.ops.masks import make_valid_mask

NEG_INF = -1.0e30


@dataclasses.dataclass(frozen=True)
class Tacotron2Config:
    vocab_size: int = -1
    n_mels: int = 80
    # "text" (token ids) or "feats" (continuous frames, e.g. source-speaker
    # mel for voice conversion, `espnet/nets/pytorch_backend/e2e_vc_tacotron2.py`)
    input_type: str = "text"
    input_dim: int = 80          # used when input_type == "feats"
    embed_dim: int = 512
    encoder_conv_layers: int = 3
    encoder_conv_channels: int = 512
    encoder_conv_kernel: int = 5
    encoder_lstm_units: int = 512  # total (both directions)
    prenet_layers: int = 2
    prenet_units: int = 256
    decoder_lstm_units: int = 1024
    decoder_lstm_layers: int = 2
    att_dim: int = 128
    att_conv_channels: int = 32
    att_conv_kernel: int = 15
    postnet_layers: int = 5
    postnet_channels: int = 512
    reduction_factor: int = 1
    dropout_rate: float = 0.5
    # ZoneOutCell (`rnn_decoders... tacotron2/decoder.py:24`): train keeps
    # previous h/c elementwise w.p. rate ('zoneout' rng collection); eval
    # uses the expectation rate*prev + (1-rate)*new like torch eval mode
    zoneout_rate: float = 0.1
    # accumulate attention weights as the AttLoc conv input
    # (`e2e_tts_tacotron2.py` cumulate_att_w default True)
    cumulate_att_w: bool = True
    use_batch_norm: bool = True  # encoder convs (tacotron2/encoder.py)
    use_gst: bool = False        # global style tokens (`espnet2/tts/gst`)
    gst_tokens: int = 10
    gst_heads: int = 4
    # multi-speaker / multi-lingual conditioning
    # (`espnet2/tts/tacotron2/tacotron2.py:67-70,203-222`)
    spks: int = 0                # > 1 enables sid embedding table
    langs: int = 0               # > 1 enables lid embedding table
    spk_embed_dim: int = 0       # > 0 expects spembs inputs
    spk_embed_integration_type: str = "concat"  # reference taco2 default
    use_guided_attn: bool = True
    guided_attn_sigma: float = 0.4
    guided_attn_lambda: float = 1.0
    bce_pos_weight: float = 5.0
    max_frames: int = 2048
    stop_threshold: float = 0.5
    dtype: object = jnp.float32


class Tacotron2Encoder(nn.Module):
    cfg: Tacotron2Config

    @nn.compact
    def __call__(self, text, text_lengths, deterministic: bool = True):
        c = self.cfg
        if c.input_type == "feats":
            x = nn.Dense(c.embed_dim, dtype=c.dtype, name="in_proj")(text)
        else:
            x = nn.Embed(c.vocab_size, c.embed_dim, dtype=c.dtype,
                         name="embed")(text)
        mask = make_valid_mask(text_lengths, text.shape[1])
        for i in range(c.encoder_conv_layers):
            x = nn.Conv(c.encoder_conv_channels, (c.encoder_conv_kernel,),
                        padding="SAME", use_bias=not c.use_batch_norm,
                        dtype=c.dtype, name=f"conv{i}")(
                x * mask[..., None].astype(x.dtype))
            if c.use_batch_norm:
                # reference encoder.py: Conv1d(bias=False) -> BatchNorm1d
                x = nn.BatchNorm(
                    use_running_average=deterministic, momentum=0.9,
                    epsilon=1e-5, dtype=jnp.float32, name=f"norm{i}",
                )(x.astype(jnp.float32)).astype(c.dtype)
                x = nn.relu(x)
            else:
                x = nn.relu(nn.LayerNorm(dtype=c.dtype, name=f"norm{i}")(x))
            x = nn.Dropout(c.dropout_rate)(x, deterministic=deterministic)
        h = c.encoder_lstm_units // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(h, dtype=c.dtype), name="lstm_fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(h, dtype=c.dtype), name="lstm_bwd",
                     reverse=True, keep_order=True)
        xf = fwd(x, seq_lengths=text_lengths)
        xb = bwd(x, seq_lengths=text_lengths)
        out = jnp.concatenate([xf, xb], axis=-1)
        return out * mask[..., None].astype(out.dtype)


class _DecoderStep(nn.Module):
    """One AR decoder step; wrapped by nn.scan.

    carry: (lstm_states, att_w, prev_out, stopped, n_steps,
            memory, processed_mem, mem_mask)
    x_t:   (teacher_frame (B, n_mels), use_teacher (B,) bool)
    out:   (frames (B, r*n_mels), stop_logits (B, r), att_w (B, T_enc))
    """

    cfg: Tacotron2Config

    @nn.compact
    def __call__(self, carry, x_t):
        """Reference dataflow (`tacotron2/decoder.py` Decoder.forward):
        attention (query = previous step's first-layer hidden, AttLoc input
        = cumulative weights) -> prenet -> LSTM stack with zoneout ->
        project concat(z_last, att_c)."""
        c = self.cfg
        (lstm_states, att_w, att_cum, step_t, prev_out, stopped, n_steps,
         memory, processed_mem, mem_mask) = carry
        teacher_frame, use_teacher = x_t
        prev_frame = jnp.where(use_teacher[:, None], teacher_frame, prev_out)

        # location-sensitive attention (AttLoc, rnn/attentions.py:316):
        # conv input is the cumulated weights after step 0 (cumulate_att_w),
        # uniform weights at step 0 (att_prev None in the reference)
        att_input = jnp.where(step_t == 0, att_w,
                              att_cum if c.cumulate_att_w else att_w)
        query = lstm_states[0][1]  # previous z_list[0]
        f = nn.Conv(c.att_conv_channels, (c.att_conv_kernel,), padding="SAME",
                    dtype=c.dtype, name="att_conv")(att_input[..., None])
        e = nn.Dense(1, use_bias=False, dtype=c.dtype, name="att_v")(
            nn.tanh(
                processed_mem
                + nn.Dense(c.att_dim, use_bias=False, dtype=c.dtype,
                           name="att_q")(query)[:, None]
                + nn.Dense(c.att_dim, use_bias=False, dtype=c.dtype,
                           name="att_f")(f)
            )
        )[..., 0]
        e = jnp.where(mem_mask, e, NEG_INF)
        # AttLoc softmax scaling=2.0 default (rnn/attentions.py:124,161)
        new_att_w = jax.nn.softmax(2.0 * e, axis=-1)
        context = jnp.einsum("bt,btd->bd", new_att_w, memory)
        new_cum = (att_cum + new_att_w) if c.cumulate_att_w else new_att_w

        # prenet: dropout ALWAYS on (tacotron2/decoder.py Prenet:74)
        h = prev_frame
        for i in range(c.prenet_layers):
            h = nn.relu(nn.Dense(c.prenet_units, dtype=c.dtype,
                                 name=f"prenet{i}")(h))
            h = nn.Dropout(c.dropout_rate, deterministic=False)(h)

        def zoneout(prev, new):
            if c.zoneout_rate == 0.0:
                return new
            if self.has_rng("zoneout"):
                keep = jax.random.bernoulli(
                    self.make_rng("zoneout"), c.zoneout_rate, new.shape)
                return jnp.where(keep, prev, new)
            # eval: expectation (ZoneOutCell._zoneout eval branch)
            return c.zoneout_rate * prev + (1.0 - c.zoneout_rate) * new

        x = jnp.concatenate([context, h], axis=-1)
        new_states = []
        for i in range(c.decoder_lstm_layers):
            cell = nn.OptimizedLSTMCell(c.decoder_lstm_units, dtype=c.dtype,
                                        name=f"lstm{i}")
            (new_c, new_h), _ = cell(lstm_states[i], x)
            new_c = zoneout(lstm_states[i][0], new_c)
            new_h = zoneout(lstm_states[i][1], new_h)
            new_states.append((new_c, new_h))
            x = new_h

        proj_in = jnp.concatenate([x, context], axis=-1)
        frames = nn.Dense(c.n_mels * c.reduction_factor, dtype=c.dtype,
                          name="feat_out")(proj_in)
        stop_logits = nn.Dense(c.reduction_factor, dtype=c.dtype,
                               name="prob_out")(proj_in)

        last_frame = frames.reshape(-1, c.reduction_factor, c.n_mels)[:, -1]
        stop_now = jax.nn.sigmoid(stop_logits[:, -1]) > c.stop_threshold
        new_stopped = stopped | stop_now
        new_n_steps = n_steps + (~stopped).astype(jnp.int32)
        new_carry = (tuple(new_states), new_att_w, new_cum, step_t + 1,
                     last_frame, new_stopped, new_n_steps, memory,
                     processed_mem, mem_mask)
        return new_carry, (frames, stop_logits, new_att_w)


class Tacotron2(nn.Module):
    config: Tacotron2Config

    def setup(self):
        c = self.config
        self.encoder = Tacotron2Encoder(c, name="encoder")
        # AttLoc mlp_enc carries a bias (rnn/attentions.py:330) — unlike the
        # query/f projections it does not cancel in the softmax
        self.att_mem_proj = nn.Dense(c.att_dim, dtype=c.dtype,
                                     name="att_mem_proj")
        self.decoder = nn.scan(
            _DecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True, "zoneout": True},
            in_axes=1, out_axes=1,
        )(c, name="decoder")
        self.postnet = Postnet(c.n_mels, c.postnet_channels, c.postnet_layers,
                               c.dtype, name="postnet")
        if self.config.use_gst:
            from espnet_tpu.models.tts.gst import StyleEncoder

            self.gst = StyleEncoder(
                num_tokens=self.config.gst_tokens,
                token_dim=self.config.encoder_lstm_units,
                num_heads=self.config.gst_heads,
                dtype=self.config.dtype,
            )
        if c.spks > 1 or c.langs > 1 or c.spk_embed_dim > 0:
            from espnet_tpu.models.tts.spk_embed import SpeakerConditioner

            self.spk_cond = SpeakerConditioner(
                spks=c.spks, langs=c.langs, spk_embed_dim=c.spk_embed_dim,
                integration_type=c.spk_embed_integration_type,
                units=c.encoder_lstm_units, dtype=c.dtype,
            )
        else:
            self.spk_cond = None

    def _init_carry(self, memory, text_lengths):
        c = self.config
        b, t_enc, _ = memory.shape
        z = jnp.zeros((b, c.decoder_lstm_units), c.dtype)
        lstm_states = tuple((z, z) for _ in range(c.decoder_lstm_layers))
        mask = make_valid_mask(text_lengths, t_enc)
        att_w = (
            mask.astype(jnp.float32)
            / jnp.maximum(text_lengths, 1)[:, None].astype(jnp.float32)
        )
        processed = self.att_mem_proj(memory)
        return (
            lstm_states, att_w, jnp.zeros_like(att_w),
            jnp.zeros((), jnp.int32), jnp.zeros((b, c.n_mels), c.dtype),
            jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32),
            memory, processed, mask,
        )

    def _teacher_forward(self, text, text_lengths, mel, mel_lengths,
                         deterministic, sids=None, lids=None, spembs=None):
        c = self.config
        r = c.reduction_factor
        b, t, _ = mel.shape
        assert t % r == 0, f"mel length {t} not a multiple of reduction {r}"
        n_dec = t // r
        memory = self.encoder(text, text_lengths, deterministic)
        if c.use_gst:
            # style embedding from the target reference mel, broadcast-added
            # to the encoder states (Tacotron2-GST integration)
            memory = memory + self.gst(mel)[:, None]
        if self.spk_cond is not None:
            memory = self.spk_cond(memory, sids, lids, spembs)
        carry = self._init_carry(memory, text_lengths)
        # teacher inputs: previous group's last frame; zeros for step 0
        teacher = mel[:, r - 1 :: r][:, :-1]
        teacher = jnp.concatenate(
            [jnp.zeros((b, 1, c.n_mels), mel.dtype), teacher], axis=1
        )
        use_teacher = jnp.ones((b, n_dec), bool)
        _, (frames, stop_logits, att_ws) = self.decoder(
            carry, (teacher, use_teacher)
        )
        return frames, stop_logits, att_ws

    def teacher_attention(self, text, text_lengths, mel, mel_lengths):
        """(B, T_dec, T_enc) teacher-forced attention for the
        DurationCalculator flow (`fastspeech/duration_calculator.py`)."""
        _, _, att_ws = self._teacher_forward(text, text_lengths, mel,
                                             mel_lengths, True)
        return att_ws

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        mel: jnp.ndarray,            # (B, T, n_mels)
        mel_lengths: jnp.ndarray,
        deterministic: bool = True,
        sids: Optional[jnp.ndarray] = None,
        lids: Optional[jnp.ndarray] = None,
        spembs: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        c = self.config
        r = c.reduction_factor
        b, t, _ = mel.shape
        frames, stop_logits, att_ws = self._teacher_forward(
            text, text_lengths, mel, mel_lengths, deterministic,
            sids=sids, lids=lids, spembs=spembs,
        )
        mel_before = frames.reshape(b, t, c.n_mels)
        mel_post = mel_before + self.postnet(mel_before, deterministic)
        stop_logits = stop_logits.reshape(b, t)

        fmask = make_valid_mask(mel_lengths, t).astype(jnp.float32)
        n_el = jnp.maximum(jnp.sum(fmask), 1.0) * c.n_mels
        l1 = (jnp.sum(jnp.abs(mel_before - mel) * fmask[..., None])
              + jnp.sum(jnp.abs(mel_post - mel) * fmask[..., None])) / n_el
        mse = (jnp.sum(((mel_before - mel) ** 2) * fmask[..., None])
               + jnp.sum(((mel_post - mel) ** 2) * fmask[..., None])) / n_el
        stop_target = (
            jnp.arange(t)[None, :] == (mel_lengths - 1)[:, None]
        ).astype(jnp.float32)
        bce_w = jnp.where(stop_target > 0, c.bce_pos_weight, 1.0)
        logp = jax.nn.log_sigmoid(stop_logits)
        log1mp = jax.nn.log_sigmoid(-stop_logits)
        bce = -(stop_target * logp * bce_w + (1 - stop_target) * log1mp)
        bce = jnp.sum(bce * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)

        loss = l1 + mse + bce
        stats = {"l1_loss": l1, "mse_loss": mse, "bce_loss": bce}
        if c.use_guided_attn:
            ga = guided_attention_loss(
                att_ws, text_lengths, mel_lengths // r, c.guided_attn_sigma
            )
            loss = loss + c.guided_attn_lambda * ga
            stats["attn_loss"] = ga
        stats["loss"] = loss
        return loss, stats, mel_post

    def inference(
        self, text: jnp.ndarray, text_lengths: jnp.ndarray,
        max_frames: Optional[int] = None,
        ref_mel: Optional[jnp.ndarray] = None,
        sids=None, lids=None, spembs=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Free-running AR synthesis (decoder.py `inference`).

        Returns (mel (B, T_max, n_mels), lengths, att_ws (B, T_dec, T_enc)).
        """
        c = self.config
        r = c.reduction_factor
        n_dec = (max_frames or c.max_frames) // r
        memory = self.encoder(text, text_lengths, True)
        if c.use_gst:
            if ref_mel is None:
                raise ValueError("use_gst inference needs a ref_mel")
            memory = memory + self.gst(ref_mel)[:, None]
        if self.spk_cond is not None:
            memory = self.spk_cond(memory, sids, lids, spembs)
        carry = self._init_carry(memory, text_lengths)
        b = text.shape[0]
        dummy = jnp.zeros((b, n_dec, c.n_mels), c.dtype)
        use_teacher = jnp.zeros((b, n_dec), bool)
        final, (frames, stop_logits, att_ws) = self.decoder(
            carry, (dummy, use_teacher)
        )
        n_steps = final[6]
        mel_before = frames.reshape(b, n_dec * r, c.n_mels)
        mel_post = mel_before + self.postnet(mel_before, True)
        out_lens = n_steps * r
        mask = make_valid_mask(out_lens, n_dec * r)[..., None]
        return mel_post * mask.astype(mel_post.dtype), out_lens, att_ws


def guided_attention_loss(att_ws, text_lengths, dec_lengths, sigma=0.4):
    """Diagonal-prior attention loss (`GuidedAttentionLoss:22`).

    att_ws: (B, T_dec, T_enc).
    """
    b, t_dec, t_enc = att_ws.shape
    u = jnp.arange(t_enc)[None, None, :] / jnp.maximum(
        text_lengths, 1
    )[:, None, None]
    t = jnp.arange(t_dec)[None, :, None] / jnp.maximum(
        dec_lengths, 1
    )[:, None, None]
    w = 1.0 - jnp.exp(-((u - t) ** 2) / (2 * sigma ** 2))
    mask = (
        make_valid_mask(dec_lengths, t_dec)[:, :, None]
        & make_valid_mask(text_lengths, t_enc)[:, None, :]
    ).astype(jnp.float32)
    return jnp.sum(att_ws * w * mask) / jnp.maximum(jnp.sum(mask), 1.0)
