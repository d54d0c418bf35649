"""S4 (state-space) ASR decoder.

Behavioral spec: reference `espnet2/asr/decoder/s4_decoder.py` (S4Decoder:
token embedding -> stack of state-space blocks from
`espnet2/asr/state_spaces/model.py` with cross-attention to the encoder,
BatchScorerInterface for beam search; the S4 kernels are
`state_spaces/s4.py` + CUDA `cauchy.py`). Here each block is
[LN -> S4D -> gated proj -> residual] + [LN -> cross-attn -> residual] +
[LN -> FF -> residual]; the S4D core (`ops/s4.py`) runs as a convolution
during teacher forcing and as a per-step recurrence during decoding —
unlike attention, decode state is O(1) in sequence length.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.attention import MultiHeadAttention
from espnet_tpu.models.transformer import PositionwiseFeedForward
from espnet_tpu.ops.masks import attention_bias, make_valid_mask
from espnet_tpu.ops.s4 import S4DLayer


class S4DecoderBlock(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    state_dim: int = 64
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.norm_s4 = nn.LayerNorm(dtype=self.dtype)
        self.s4 = S4DLayer(self.d_model, self.state_dim, dtype=self.dtype)
        self.gate = nn.Dense(2 * self.d_model, dtype=self.dtype)
        self.out = nn.Dense(self.d_model, dtype=self.dtype)
        self.norm_cross = nn.LayerNorm(dtype=self.dtype)
        self.cross = MultiHeadAttention(self.num_heads, self.d_model,
                                        self.dtype)
        self.norm_ff = nn.LayerNorm(dtype=self.dtype)
        self.ff = PositionwiseFeedForward(self.d_model, self.d_ff,
                                          self.dropout_rate, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def _post_s4(self, h, deterministic):
        a, g = jnp.split(self.gate(h), 2, axis=-1)
        h = a * nn.sigmoid(g)  # GLU
        return self.dropout(self.out(h), deterministic=deterministic)

    def __call__(self, x, memory, mem_bias, deterministic: bool = True):
        h = self.norm_s4(x)
        h = self.s4(h)
        x = x + self._post_s4(h, deterministic)
        h = self.norm_cross(x)
        h = self.cross(h, memory, memory, mem_bias)
        x = x + self.dropout(h, deterministic=deterministic)
        h = self.norm_ff(x)
        x = x + self.dropout(self.ff(h, deterministic),
                             deterministic=deterministic)
        return x

    def step(self, x_t, state, memory, mem_bias):
        """x_t (B, D); state = S4 complex state."""
        h = self.norm_s4(x_t)
        h, new_state = self.s4.step(state, h)
        x_t = x_t + self._post_s4(h, True)
        h = self.norm_cross(x_t)
        h = self.cross(h[:, None], memory, memory, mem_bias)[:, 0]
        x_t = x_t + h
        h = self.norm_ff(x_t)
        x_t = x_t + self.ff(h, True)
        return x_t, new_state

    def init_state(self, batch: int):
        return self.s4.init_state(batch)


class S4Decoder(nn.Module):
    """Drop-in alternative to TransformerDecoder (same scoring interface)."""

    vocab_size: int
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_layers: int = 6
    state_dim: int = 64
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)
        self.blocks = [
            S4DecoderBlock(self.d_model, self.num_heads, self.d_ff,
                           self.state_dim, self.dropout_rate, self.dtype,
                           name=f"block{i}")
            for i in range(self.num_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype)
        self.out_proj = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, tokens, token_lengths, memory, memory_lengths,
                 deterministic: bool = True):
        x = self.embed(tokens)
        x = self.dropout(x, deterministic=deterministic)
        mem_bias = attention_bias(
            make_valid_mask(memory_lengths, memory.shape[1])[:, None, None, :]
        )
        for block in self.blocks:
            x = block(x, memory, mem_bias, deterministic)
        return self.out_proj(self.final_norm(x))

    def init_cache(self, batch: int, max_len: int = 0):
        return [b.init_state(batch) for b in self.blocks]

    def score_step(self, tokens_step, pos, memory, memory_lengths, cache):
        mem_bias = attention_bias(
            make_valid_mask(memory_lengths, memory.shape[1])[:, None, None, :]
        )
        x = self.embed(tokens_step)
        new_cache = []
        for block, st in zip(self.blocks, cache):
            x, ns = block.step(x, st, memory, mem_bias)
            new_cache.append(ns)
        lp = jax.nn.log_softmax(
            self.out_proj(self.final_norm(x)).astype(jnp.float32), -1
        )
        return lp, new_cache
