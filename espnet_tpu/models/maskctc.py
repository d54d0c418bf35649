"""Mask-CTC: hybrid CTC / masked-LM non-autoregressive ASR.

Behavioral spec: reference `espnet2/asr/maskctc_model.py:39` (MaskCTCModel:
loss = ctc_weight * ctc + (1-ctc_weight) * MLM CE over masked positions;
<mask> appended to the vocab) with training-time masking per
`espnet/nets/pytorch_backend/maskctc/add_mask_token.py:13` (mask_uniform:
per utterance, a uniform-random fraction of tokens replaced by <mask>) and
`MaskCTCInference:262` (greedy CTC -> low-confidence tokens masked ->
iterative MLM infilling, most-confident mask_num/K per round).

TPU note: training masking uses a per-position Bernoulli with rate
num_mask/len (same expectation as the reference's sample-with-replacement
choice) so the whole batch masks in one fused op.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRConfig, ASRModel
from espnet_tpu.models.embedding import add_positional_encoding
from espnet_tpu.models.transformer import TransformerDecoderLayer
from espnet_tpu.ops.ctc import ctc_loss
from espnet_tpu.ops.losses import label_smoothing_loss, token_accuracy
from espnet_tpu.ops.masks import attention_bias, make_valid_mask


@dataclasses.dataclass(frozen=True)
class MaskCTCConfig(ASRConfig):
    """vocab_size excludes <mask>; mask_token = vocab_size."""

    @property
    def mask_token(self) -> int:
        return self.vocab_size


class MLMDecoder(nn.Module):
    """Non-causal (bidirectional) conditional masked-LM decoder
    (`espnet2/asr/decoder/mlm_decoder.py`)."""

    vocab_size: int          # includes <mask>
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_layers: int = 6
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, token_lengths, memory, memory_lengths,
                 deterministic: bool = True):
        u = tokens.shape[1]
        x = add_positional_encoding(
            nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="embed")(tokens)
        )
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        valid = make_valid_mask(token_lengths, u)
        self_bias = attention_bias(valid[:, None, None, :])  # no causal mask
        mem_bias = attention_bias(
            make_valid_mask(memory_lengths, memory.shape[1])[:, None, None, :]
        )
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.d_model, self.num_heads, self.d_ff, self.dropout_rate,
                dtype=self.dtype, name=f"layer{i}",
            )(x, self_bias, memory, mem_bias, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="out_proj")(x)


class MaskCTCModel(nn.Module):
    config: MaskCTCConfig

    def setup(self):
        c = self.config
        # reuse the ASR encoder assembly via an inner ASRModel-less setup:
        from espnet_tpu.models.conformer import ConformerEncoder
        from espnet_tpu.models.transformer import TransformerEncoder

        enc_kw = dict(
            d_model=c.d_model, num_heads=c.num_heads, d_ff=c.d_ff,
            num_layers=c.num_encoder_layers, dropout_rate=c.dropout_rate,
            subsampling_factor=c.subsampling_factor, dtype=c.dtype,
        )
        if c.encoder_type == "conformer":
            self.encoder = ConformerEncoder(
                kernel_size=c.conformer_kernel_size, **enc_kw
            )
        else:
            self.encoder = TransformerEncoder(**enc_kw)
        self.ctc_head = nn.Dense(c.vocab_size, dtype=c.dtype)
        self.decoder = MLMDecoder(
            vocab_size=c.vocab_size + 1, d_model=c.d_model,
            num_heads=c.num_heads, d_ff=c.decoder_d_ff,
            num_layers=c.num_decoder_layers, dropout_rate=c.dropout_rate,
            dtype=c.dtype,
        )

    def _frontend(self, speech, speech_lengths, deterministic):
        c = self.config
        from espnet_tpu.ops.normalize import utterance_mvn
        from espnet_tpu.ops.specaug import specaug
        from espnet_tpu.ops.stft import log_mel_spectrogram

        if c.input_type == "raw":
            feats, flens = log_mel_spectrogram(
                speech, speech_lengths, c.fs, c.n_fft, c.hop_length,
                c.win_length, c.n_mels,
            )
        else:
            feats, flens = speech, speech_lengths
        if c.use_specaug and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, flens)
        if c.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, flens)
        return feats, flens

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        feats, flens = self._frontend(speech, speech_lengths, deterministic)
        return self.encoder(feats, flens, deterministic)

    def ctc_log_probs(self, encoder_out):
        return jax.nn.log_softmax(
            self.ctc_head(encoder_out).astype(jnp.float32), axis=-1
        )

    def mlm_logits(self, tokens, token_lengths, enc, enc_lengths,
                   deterministic: bool = True):
        return self.decoder(tokens, token_lengths, enc, enc_lengths,
                            deterministic)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = True):
        c = self.config
        enc, enc_lengths = self.encode(speech, speech_lengths, deterministic)
        loss_ctc = ctc_loss(
            self.ctc_head(enc), text, enc_lengths, text_lengths, c.blank_id
        )
        stats: Dict[str, jnp.ndarray] = {"loss_ctc": loss_ctc}

        # mask_uniform: rate = U(1, len)/len per utterance
        b, u = text.shape
        key = (self.make_rng("mask") if not deterministic
               else jax.random.PRNGKey(0))
        k1, k2 = jax.random.split(key)
        lens_f = jnp.maximum(text_lengths.astype(jnp.float32), 1.0)
        num_mask = jax.random.randint(
            k1, (b,), 1, jnp.maximum(text_lengths, 1) + 1
        )
        rate = num_mask.astype(jnp.float32) / lens_f
        valid = make_valid_mask(text_lengths, u)
        masked = (jax.random.uniform(k2, (b, u)) < rate[:, None]) & valid
        # guarantee at least one masked token per utterance
        first_valid = jnp.zeros((b, u), bool).at[:, 0].set(True) & valid
        masked = jnp.where(
            jnp.any(masked, axis=1, keepdims=True), masked, first_valid
        )
        ys_in = jnp.where(masked, c.mask_token, text)
        logits = self.decoder(ys_in, text_lengths, enc, enc_lengths,
                              deterministic)
        loss_mlm = label_smoothing_loss(logits, text, masked, c.lsm_weight)
        acc_mlm = token_accuracy(logits, text, masked)
        stats["loss_mlm"] = loss_mlm
        stats["acc_mlm"] = acc_mlm
        loss = c.ctc_weight * loss_ctc + (1.0 - c.ctc_weight) * loss_mlm
        stats["loss"] = loss
        return loss, stats


class MaskCTCInference:
    """Batched non-autoregressive Mask-CTC inference
    (`maskctc_model.py:262` MaskCTCInference)."""

    def __init__(self, model: MaskCTCModel, variables,
                 n_iterations: int = 10, threshold_probability: float = 0.99,
                 max_tokens: int = 128):
        self.model = model
        self.variables = variables
        self.k = n_iterations
        self.thresh = threshold_probability
        self.max_tokens = max_tokens
        self._encode = jax.jit(
            lambda s, l: model.apply(
                variables, s, l, method=MaskCTCModel.encode
            )
        )
        self._ctc_lp = jax.jit(
            lambda e: model.apply(variables, e,
                                  method=MaskCTCModel.ctc_log_probs)
        )
        mask_token = model.config.mask_token
        self._mlm = jax.jit(
            lambda t, tl, e, el: jax.nn.log_softmax(
                model.apply(variables, t, tl, e, el,
                            method=MaskCTCModel.mlm_logits), -1,
            ).at[..., mask_token].set(-jnp.inf)
        )

    def __call__(self, speech, speech_lengths) -> List[List[int]]:
        c = self.model.config
        enc, elens = self._encode(
            jnp.asarray(speech), jnp.asarray(speech_lengths)
        )
        lp = np.asarray(self._ctc_lp(enc))
        probs = np.exp(lp.max(-1))
        ids = lp.argmax(-1)
        elens_np = np.asarray(elens)
        b = ids.shape[0]
        y_list, conf_list = [], []
        for i in range(b):
            seq, confs = [], []
            prev = -1
            for t in range(int(elens_np[i])):
                tok = int(ids[i, t])
                if tok == prev:
                    confs[-1] = max(confs[-1], float(probs[i, t]))
                else:
                    seq.append(tok)
                    confs.append(float(probs[i, t]))
                    prev = tok
            keep = [(s, cf) for s, cf in zip(seq, confs) if s != c.blank_id]
            y_list.append([s for s, _ in keep][: self.max_tokens])
            conf_list.append([cf for _, cf in keep][: self.max_tokens])

        umax = max(1, max(len(y) for y in y_list))
        y_in = np.zeros((b, umax), np.int32)
        lens = np.asarray([len(y) for y in y_list], np.int32)
        mask_pos = np.zeros((b, umax), bool)
        for i, (y, cf) in enumerate(zip(y_list, conf_list)):
            for j, (tok, p) in enumerate(zip(y, cf)):
                if p < self.thresh:
                    y_in[i, j] = c.mask_token
                    mask_pos[i, j] = True
                else:
                    y_in[i, j] = tok

        total_masks = int(mask_pos.sum())
        if total_masks > 0:
            num_iter = min(self.k, max(1, total_masks)) if self.k > 0 else 1
            per_round = max(1, total_masks // num_iter)
            for _ in range(num_iter - 1):
                if not mask_pos.any():
                    break
                pred = np.asarray(self._mlm(
                    jnp.asarray(y_in), jnp.asarray(lens), enc, elens
                ))
                score = pred.max(-1)
                tok = pred.argmax(-1)
                flat_scores = np.where(mask_pos, score, -np.inf).reshape(-1)
                order = np.argsort(-flat_scores)[:per_round]
                for o in order:
                    if flat_scores[o] == -np.inf:
                        continue
                    i, j = divmod(int(o), umax)
                    y_in[i, j] = int(tok[i, j])
                    mask_pos[i, j] = False
            if mask_pos.any():
                pred = np.asarray(self._mlm(
                    jnp.asarray(y_in), jnp.asarray(lens), enc, elens
                ))
                tok = pred.argmax(-1)
                y_in[mask_pos] = tok[mask_pos]
        return [y_in[i, : int(lens[i])].tolist() for i in range(b)]
