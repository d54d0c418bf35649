"""Transducer (RNN-T) ASR model: encoder + prediction net + joint network.

Behavioral spec: reference `espnet2/asr_transducer/` (standalone RNN-T task:
`espnet_transducer_model.py` loss = RNNT + aux CTC/LM weights;
`decoder/rnn_decoder.py` LSTM prediction network;
`joint_network.py` JointNetwork: tanh(W_enc h_enc + W_dec h_dec) -> vocab)
and v1 `espnet/nets/pytorch_backend/transducer/`.

Greedy search follows `beam_search_transducer.py` greedy_search: per frame
emit labels while the joint argmax is non-blank (bounded by
max_symbols_per_frame), expressed as one `lax.while_loop` over (t, emitted)
with fixed bounds so a whole batch decodes in one compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.conformer import ConformerEncoder
from espnet_tpu.models.transformer import TransformerEncoder
from espnet_tpu.ops.ctc import ctc_loss
from espnet_tpu.ops.transducer import transducer_loss


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    vocab_size: int
    input_type: str = "raw"
    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    n_mels: int = 80
    use_specaug: bool = True
    normalize: str = "utterance_mvn"
    encoder_type: str = "conformer"
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_encoder_layers: int = 12
    subsampling_factor: int = 4
    conformer_kernel_size: int = 31
    # prediction network
    decoder_embed_dim: int = 256
    decoder_hidden: int = 256
    decoder_layers: int = 1
    joint_dim: int = 320
    dropout_rate: float = 0.1
    ctc_weight: float = 0.0  # aux CTC on encoder
    # auxiliary task losses (`transducer/transducer_tasks.py:1`):
    # aux transducer loss on intermediate encoder layers (+ optional
    # symmetric KL between main and aux joint posteriors) and a next-label
    # LM loss on the prediction network output
    aux_transducer_weight: float = 0.0
    symm_kl_weight: float = 0.0
    lm_loss_weight: float = 0.0
    aux_layers: tuple = ()   # 1-based encoder layer indices
    dtype: Any = jnp.float32

    @property
    def blank_id(self) -> int:
        return 0


class PredictionNetwork(nn.Module):
    """LSTM label-history encoder (`asr_transducer/decoder/rnn_decoder.py`)."""

    vocab_size: int
    embed_dim: int = 256
    hidden: int = 256
    layers: int = 1
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype)
        self.cells = [
            nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype, name=f"lstm{i}")
            for i in range(self.layers)
        ]
        # nn.RNN over the SAME cell instances so step() and the full-sequence
        # forward share parameters
        self.rnns = [nn.RNN(cell) for cell in self.cells]
        self.dropout = nn.Dropout(self.dropout_rate)

    def init_state(self, batch: int):
        z = jnp.zeros((batch, self.hidden), self.dtype)
        return tuple((z, z) for _ in range(self.layers))

    def step(self, state, token):
        """token (B,) -> (out (B, H), new state). Blank-id tokens at the
        start position are fed as-is (espnet prepends blank as <sos>)."""
        x = self.embed(token)
        new_state = []
        for cell, st in zip(self.cells, state):
            st2, x = cell(st, x)
            new_state.append(st2)
        return x, tuple(new_state)

    def __call__(self, tokens, deterministic: bool = True):
        """Full-sequence forward for training: tokens (B, U) ->
        outputs (B, U+1, H) for history lengths 0..U (0 = blank start)."""
        b, u = tokens.shape
        start = jnp.zeros((b, 1), tokens.dtype)  # blank as BOS
        inp = jnp.concatenate([start, tokens], axis=1)  # (B, U+1)
        x = self.embed(inp)
        x = self.dropout(x, deterministic=deterministic)
        for rnn in self.rnns:
            x = rnn(x)
        return x  # (B, U+1, H)


class JointNetwork(nn.Module):
    """tanh(W_enc h_t + W_dec g_u) -> vocab (`joint_network.py`)."""

    vocab_size: int
    joint_dim: int = 320
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc, dec):
        """enc (..., D_e), dec (..., D_d) broadcastable -> logits (..., V)."""
        h = nn.Dense(self.joint_dim, dtype=self.dtype, name="lin_enc")(enc)
        h = h + nn.Dense(self.joint_dim, dtype=self.dtype, name="lin_dec")(dec)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="lin_out")(
            nn.tanh(h)
        )


class TransducerASRModel(nn.Module):
    config: TransducerConfig

    def setup(self):
        c = self.config
        enc_kw = dict(
            d_model=c.d_model, num_heads=c.num_heads, d_ff=c.d_ff,
            num_layers=c.num_encoder_layers, dropout_rate=c.dropout_rate,
            subsampling_factor=c.subsampling_factor, dtype=c.dtype,
        )
        capture = tuple(c.aux_layers) if c.aux_transducer_weight > 0 else ()
        if c.encoder_type == "conformer":
            self.encoder = ConformerEncoder(
                kernel_size=c.conformer_kernel_size, capture_layers=capture,
                **enc_kw
            )
        else:
            self.encoder = TransformerEncoder(capture_layers=capture, **enc_kw)
        self.decoder = PredictionNetwork(
            c.vocab_size, c.decoder_embed_dim, c.decoder_hidden,
            c.decoder_layers, c.dropout_rate, c.dtype,
        )
        self.joint = JointNetwork(c.vocab_size, c.joint_dim, c.dtype)
        if c.ctc_weight > 0:
            self.ctc_head = nn.Dense(c.vocab_size, dtype=c.dtype)
        if c.aux_transducer_weight > 0:
            # reference `transducer_tasks.py` mlp projecting aux encoder
            # outputs into the joint's encoder space
            self.aux_mlp = nn.Dense(c.d_model, dtype=c.dtype)
        if c.lm_loss_weight > 0:
            self.lm_head = nn.Dense(c.vocab_size, dtype=c.dtype)

    def _frontend(self, speech, speech_lengths, deterministic):
        c = self.config
        from espnet_tpu.ops.normalize import utterance_mvn
        from espnet_tpu.ops.specaug import specaug
        from espnet_tpu.ops.stft import log_mel_spectrogram

        if c.input_type == "raw":
            feats, lens = log_mel_spectrogram(
                speech, speech_lengths, c.fs, c.n_fft, c.hop_length,
                None, c.n_mels,
            )
        else:
            feats, lens = speech, speech_lengths
        if c.use_specaug and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, lens)
        if c.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, lens)
        return feats, lens

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        feats, lens = self._frontend(speech, speech_lengths, deterministic)
        out = self.encoder(feats, lens, deterministic)
        if len(out) == 3:
            return out[0], out[1]
        return out

    def encode_with_intermediates(self, speech, speech_lengths,
                                  deterministic: bool = True):
        feats, lens = self._frontend(speech, speech_lengths, deterministic)
        out = self.encoder(feats, lens, deterministic)
        if len(out) == 3:
            return out
        return out[0], out[1], []

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = True):
        c = self.config
        enc, enc_lengths, inters = self.encode_with_intermediates(
            speech, speech_lengths, deterministic
        )
        dec = self.decoder(text, deterministic)  # (B, U+1, H)
        logits = self.joint(enc[:, :, None, :], dec[:, None, :, :])
        loss_rnnt = transducer_loss(
            logits, text, enc_lengths, text_lengths, c.blank_id
        )
        stats = {"loss_rnnt": loss_rnnt}
        loss = loss_rnnt
        if c.ctc_weight > 0:
            loss_ctc = ctc_loss(self.ctc_head(enc), text, enc_lengths,
                                text_lengths, c.blank_id)
            stats["loss_ctc"] = loss_ctc
            loss = (1 - c.ctc_weight) * loss + c.ctc_weight * loss_ctc
        if c.aux_transducer_weight > 0 and inters:
            # aux transducer + symmetric KL on intermediate encoder layers
            # (`transducer_tasks.py:203-286`); the joint network is frozen
            # for the aux pass (grads flow to aux_mlp + encoder only),
            # mirroring requires_grad=False around the aux joint call
            frozen_joint = jax.tree_util.tree_map(
                jax.lax.stop_gradient, self.joint.variables["params"]
            )
            b = enc.shape[0]
            loss_aux = 0.0
            loss_kl = 0.0
            for _, h_aux in inters:
                aux_in = self.aux_mlp(h_aux)
                aux_logits = self.joint.apply(
                    {"params": frozen_joint},
                    aux_in[:, :, None, :], dec[:, None, :, :],
                )
                loss_aux = loss_aux + transducer_loss(
                    aux_logits, text, enc_lengths, text_lengths, c.blank_id
                )
                if c.symm_kl_weight > 0:
                    p_main = jax.nn.log_softmax(
                        logits.astype(jnp.float32), axis=-1
                    )
                    p_aux = jax.nn.log_softmax(
                        aux_logits.astype(jnp.float32), axis=-1
                    )
                    denom = float(np.prod(logits.shape[:3]))
                    kl_ma = jnp.sum(
                        jnp.exp(p_aux) * (p_aux - p_main)
                    ) / denom
                    kl_am = jnp.sum(
                        jnp.exp(p_main) * (p_main - p_aux)
                    ) / denom
                    loss_kl = loss_kl + kl_ma + kl_am
            loss_aux = loss_aux / len(inters)
            stats["loss_aux_trans"] = loss_aux
            loss = loss + c.aux_transducer_weight * loss_aux
            if c.symm_kl_weight > 0:
                loss_kl = loss_kl / len(inters)
                stats["loss_symm_kl"] = loss_kl
                loss = loss + c.symm_kl_weight * loss_kl
        if c.lm_loss_weight > 0:
            # next-label prediction CE on the prediction-net output
            # (`transducer_tasks.py:286-307`): dec[:, u] predicts text[:, u]
            lm_logits = self.lm_head(dec[:, :-1])  # (B, U, V)
            lp = jax.nn.log_softmax(lm_logits.astype(jnp.float32), axis=-1)
            tgt = jax.nn.one_hot(text, c.vocab_size)
            valid = (
                jnp.arange(text.shape[1])[None, :] < text_lengths[:, None]
            ).astype(jnp.float32)
            ce = -jnp.sum(jnp.sum(lp * tgt, -1) * valid) / jnp.maximum(
                jnp.sum(valid), 1.0
            )
            stats["loss_lm"] = ce
            loss = loss + c.lm_loss_weight * ce
        stats["loss"] = loss
        return loss, stats

    def greedy_search(self, enc, enc_lengths, max_tokens: int = 128,
                      max_symbols_per_frame: int = 3):
        """Batched greedy transducer decode over encoder output.

        Returns (tokens (B, max_tokens), lengths (B,)).
        """
        c = self.config
        b, t_max, _ = enc.shape

        def cond(s):
            t, u, *_ = s
            return jnp.any((t < enc_lengths) & (u < max_tokens))

        def body(s):
            t, u, sym_count, dec_out, dec_state, out, out_len = s
            t_safe = jnp.minimum(t, t_max - 1)
            enc_t = jnp.take_along_axis(
                enc, t_safe[:, None, None].repeat(enc.shape[2], 2), axis=1
            )[:, 0]
            logits = self.joint(enc_t, dec_out)  # (B, V)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            active = t < enc_lengths
            is_blank = (pred == c.blank_id) | (sym_count >= max_symbols_per_frame)
            emit = active & ~is_blank & (u < max_tokens)
            # write emitted tokens
            out = jnp.where(
                (jnp.arange(max_tokens)[None] == u[:, None]) & emit[:, None],
                pred[:, None], out,
            )
            new_u = u + emit.astype(jnp.int32)
            # advance decoder state for emitters
            new_dec_out, new_dec_state = self.decoder.step(dec_state, pred)
            dec_out = jnp.where(emit[:, None], new_dec_out, dec_out)
            dec_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(emit[:, None], new, old),
                new_dec_state, dec_state,
            )
            sym_count = jnp.where(emit, sym_count + 1, sym_count)
            adv = active & (is_blank | (u >= max_tokens))
            new_t = t + adv.astype(jnp.int32)
            sym_count = jnp.where(adv, 0, sym_count)
            return (new_t, new_u, sym_count, dec_out, dec_state, out, new_u)

        dec_state = self.decoder.init_state(b)
        dec_out, dec_state = self.decoder.step(
            dec_state, jnp.full((b,), c.blank_id, jnp.int32)
        )
        init = (
            jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32), dec_out, dec_state,
            jnp.zeros((b, max_tokens), jnp.int32), jnp.zeros((b,), jnp.int32),
        )
        _, u, _, _, _, out, out_len = jax.lax.while_loop(cond, body, init)
        return out, u

    def beam_search(self, enc, enc_lengths, beam_size: int = 5,
                    max_expansions: int = 3, max_tokens: int = 256,
                    score_norm: bool = True):
        """Batched mAES-style beam search (see decode/transducer_search.py).

        Returns (tokens (B, max_tokens), lengths (B,), scores (B,)).
        """
        from espnet_tpu.decode.transducer_search import (
            TransducerSearchConfig, batched_transducer_beam_search,
        )

        c = self.config

        def dec_init(n):
            st = self.decoder.init_state(n)
            return self.decoder.step(
                st, jnp.full((n,), c.blank_id, jnp.int32)
            )

        return batched_transducer_beam_search(
            enc, enc_lengths,
            joint_fn=lambda e, d: self.joint(e, d),
            dec_init=dec_init,
            dec_step=lambda st, tok: self.decoder.step(st, tok),
            config=TransducerSearchConfig(
                beam_size=beam_size, max_expansions=max_expansions,
                blank_id=c.blank_id, max_tokens=max_tokens,
                score_norm=score_norm,
            ),
        )

    def nsc_search(self, enc, enc_lengths, beam_size: int = 5,
                   nstep: int = 2, max_tokens: int = 256,
                   score_norm: bool = True):
        """Batched NSC search with prefix merging
        (`espnet/nets/beam_search_transducer.py:547` nsc_beam_search;
        see decode/transducer_search.py batched_transducer_nsc)."""
        from espnet_tpu.decode.transducer_search import (
            TransducerSearchConfig, batched_transducer_nsc,
        )

        c = self.config

        def dec_init(n):
            st = self.decoder.init_state(n)
            return self.decoder.step(
                st, jnp.full((n,), c.blank_id, jnp.int32)
            )

        return batched_transducer_nsc(
            enc, enc_lengths,
            joint_fn=lambda e, d: self.joint(e, d),
            dec_init=dec_init,
            dec_step=lambda st, tok: self.decoder.step(st, tok),
            config=TransducerSearchConfig(
                beam_size=beam_size, max_expansions=nstep,
                blank_id=c.blank_id, max_tokens=max_tokens,
                score_norm=score_norm,
            ),
        )

    def alsd_search(self, enc, enc_lengths, beam_size: int = 5,
                    max_tokens: int = 256, u_max: int = 50,
                    score_norm: bool = True):
        """Batched ALSD search (`beam_search_transducer.py` "alsd" mode;
        see decode/transducer_search.py batched_transducer_alsd)."""
        from espnet_tpu.decode.transducer_search import (
            TransducerSearchConfig, batched_transducer_alsd,
        )

        c = self.config

        def dec_init(n):
            st = self.decoder.init_state(n)
            return self.decoder.step(
                st, jnp.full((n,), c.blank_id, jnp.int32)
            )

        return batched_transducer_alsd(
            enc, enc_lengths,
            joint_fn=lambda e, d: self.joint(e, d),
            dec_init=dec_init,
            dec_step=lambda st, tok: self.decoder.step(st, tok),
            config=TransducerSearchConfig(
                beam_size=beam_size, blank_id=c.blank_id,
                max_tokens=max_tokens, score_norm=score_norm,
            ),
            u_max=u_max,
        )

    def tsd_search(self, enc, enc_lengths, beam_size: int = 5,
                   max_sym_exp: int = 3, max_tokens: int = 256,
                   score_norm: bool = True):
        """Batched time-synchronous search with logaddexp prefix merging
        (`beam_search_transducer.py:332` "tsd" mode; see
        decode/transducer_search.py batched_transducer_tsd)."""
        from espnet_tpu.decode.transducer_search import (
            TransducerSearchConfig, batched_transducer_tsd,
        )

        c = self.config

        def dec_init(n):
            st = self.decoder.init_state(n)
            return self.decoder.step(
                st, jnp.full((n,), c.blank_id, jnp.int32)
            )

        return batched_transducer_tsd(
            enc, enc_lengths,
            joint_fn=lambda e, d: self.joint(e, d),
            dec_init=dec_init,
            dec_step=lambda st, tok: self.decoder.step(st, tok),
            config=TransducerSearchConfig(
                # reference max_sym_exp counts joint levels (v in
                # range(max_sym_exp), beam_search_transducer.py tsd loop);
                # max_expansions counts label emissions between levels, so
                # max_sym_exp = max_expansions + 1.
                beam_size=beam_size, max_expansions=max(max_sym_exp - 1, 1),
                blank_id=c.blank_id, max_tokens=max_tokens,
                score_norm=score_norm,
            ),
        )
