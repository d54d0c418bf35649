"""Language models: Transformer LM and sequential RNN (LSTM) LM.

Behavioral spec: reference `espnet2/lm/espnet_model.py:13`
(ESPnetLanguageModel: CE loss over [sos, y] -> [y, eos], perplexity stats)
and `espnet/nets/pytorch_backend/lm/transformer.py:18` /
`seq_rnn.py:10`, both implementing BatchScorerInterface for shallow
fusion (`abs_model.py:9`). `score_step` mirrors `batch_score` with
explicit cache pytrees for the beam-search while_loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.embedding import add_positional_encoding, sinusoidal_table
from espnet_tpu.models.transformer import TransformerEncoderLayer
from espnet_tpu.models.attention import MultiHeadAttention
from espnet_tpu.ops.masks import attention_bias, make_valid_mask, subsequent_mask


class TransformerLM(nn.Module):
    vocab_size: int
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 1024
    num_layers: int = 6
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)
        self.layers = [
            _LMLayer(self.d_model, self.num_heads, self.d_ff,
                     self.dropout_rate, self.dtype, name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype)
        self.out_proj = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, tokens, lengths, deterministic: bool = True):
        """(B, U) -> logits (B, U, V), causal."""
        u = tokens.shape[1]
        x = add_positional_encoding(self.embed(tokens))
        x = self.dropout(x, deterministic=deterministic)
        valid = make_valid_mask(lengths, u)
        mask = valid[:, None, None, :] & subsequent_mask(u)[None, None]
        bias = attention_bias(mask)
        for layer in self.layers:
            x = layer(x, bias, deterministic)
        return self.out_proj(self.final_norm(x))

    def init_cache(self, batch: int, max_len: int):
        h, dk = self.num_heads, self.d_model // self.num_heads
        z = jnp.zeros((batch, h, max_len, dk), self.dtype)
        return [{"k": z, "v": z} for _ in range(self.num_layers)]

    def score_step(self, tokens_step, pos, cache):
        """(B,) token at position pos -> (log_probs (B, V), cache)."""
        x = self.embed(tokens_step[:, None])
        t_all = cache[0]["k"].shape[2]
        pe = jnp.asarray(sinusoidal_table(t_all, self.d_model))
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        x = x + jax.lax.dynamic_slice(pe, (pos, 0), (1, self.d_model))[None].astype(x.dtype)
        new_cache = []
        for layer, lc in zip(self.layers, cache):
            x, nc = layer(x, None, True, cache=lc, cache_index=pos)
            new_cache.append(nc)
        logits = self.out_proj(self.final_norm(x))[:, 0]
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), new_cache


class _LMLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout_rate: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, bias, deterministic=True, cache=None, cache_index=None):
        from espnet_tpu.models.transformer import PositionwiseFeedForward

        drop = nn.Dropout(self.dropout_rate)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        attn = MultiHeadAttention(self.num_heads, self.d_model, self.dtype,
                                  name="self_attn")
        new_cache = None
        if cache is not None:
            h, new_cache = attn(h, h, h, bias, cache, cache_index)
        else:
            h = attn(h, h, h, bias)
        x = x + drop(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout_rate,
                                    dtype=self.dtype, name="ff")(h, deterministic)
        x = x + drop(h, deterministic=deterministic)
        if cache is not None:
            return x, new_cache
        return x


class RNNLM(nn.Module):
    """LSTM LM (SequentialRNNLM equivalent, `espnet2/lm/seq_rnn_lm.py`)."""

    vocab_size: int
    d_model: int = 256
    num_layers: int = 2
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)
        self.cells = [
            nn.OptimizedLSTMCell(self.d_model, dtype=self.dtype, name=f"lstm{i}")
            for i in range(self.num_layers)
        ]
        self.out_proj = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def init_cache(self, batch: int, max_len: int = 0):
        z = jnp.zeros((batch, self.d_model), self.dtype)
        return [((z, z)) for _ in range(self.num_layers)]

    def _step(self, carry, x_t):
        new_carry = []
        h = x_t
        for cell, c in zip(self.cells, carry):
            c2, h = cell(c, h)
            new_carry.append(c2)
        return new_carry, h

    def __call__(self, tokens, lengths, deterministic: bool = True):
        b, u = tokens.shape
        x = self.embed(tokens)
        x = self.dropout(x, deterministic=deterministic)
        carry = self.init_cache(b)
        ys = []
        for t in range(u):  # unrolled: training LMs use short BPTT windows
            carry, h = self._step(carry, x[:, t])
            ys.append(h)
        return self.out_proj(jnp.stack(ys, axis=1))

    def score_step(self, tokens_step, pos, cache):
        x = self.embed(tokens_step)
        cache, h = self._step(cache, x)
        logits = self.out_proj(h)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), cache


def lm_loss(logits, targets, valid_mask):
    """Token-mean CE + perplexity stats (ESPnetLanguageModel.forward)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    nll = nll * valid_mask
    n = jnp.maximum(jnp.sum(valid_mask), 1)
    loss = jnp.sum(nll) / n
    return loss, {"loss": loss, "ppl": jnp.exp(loss),
                  "nll_sum": jnp.sum(nll), "ntokens": n}
