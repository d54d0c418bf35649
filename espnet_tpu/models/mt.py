"""Machine translation (MT) model: token encoder -> decoder.

Behavioral spec: reference `espnet2/mt/espnet_model.py` (ESPnetMTModel:
embedding frontend + transformer encoder over source tokens, attention
decoder CE over target with label smoothing; sos/eos = vocab-1) and v1
`espnet/nets/pytorch_backend/e2e_mt_transformer.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.asr import add_sos_eos
from espnet_tpu.models.embedding import add_positional_encoding
from espnet_tpu.models.transformer import (
    TransformerDecoder, TransformerEncoderLayer,
)
from espnet_tpu.ops.losses import label_smoothing_loss, token_accuracy
from espnet_tpu.ops.masks import attention_bias, make_valid_mask


@dataclasses.dataclass(frozen=True)
class MTConfig:
    vocab_size: int = -1           # target vocab
    src_vocab_size: int = -1       # source vocab
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    decoder_d_ff: int = 2048
    lsm_weight: float = 0.1
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @property
    def sos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1


class MTEncoder(nn.Module):
    """Token-embedding transformer encoder (`mt/espnet_model.py` frontend)."""

    vocab_size: int
    d_model: int
    num_heads: int
    d_ff: int
    num_layers: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, lengths, deterministic: bool = True):
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="embed")(tokens)
        x = add_positional_encoding(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        bias = attention_bias(
            make_valid_mask(lengths, tokens.shape[1])[:, None, None, :]
        )
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.num_heads, self.d_ff, self.dropout_rate,
                dtype=self.dtype, name=f"layer{i}",
            )(x, bias, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="after_norm")(x), lengths


class MTModel(nn.Module):
    config: MTConfig

    def setup(self):
        c = self.config
        self.encoder = MTEncoder(
            c.src_vocab_size, c.d_model, c.num_heads, c.d_ff,
            c.num_encoder_layers, c.dropout_rate, c.dtype,
        )
        self.decoder = TransformerDecoder(
            vocab_size=c.vocab_size, d_model=c.d_model, num_heads=c.num_heads,
            d_ff=c.decoder_d_ff, num_layers=c.num_decoder_layers,
            dropout_rate=c.dropout_rate, dtype=c.dtype,
        )

    def encode(self, src_text, src_text_lengths, deterministic: bool = True):
        return self.encoder(src_text, src_text_lengths, deterministic)

    def decoder_score_step(self, tokens_step, pos, memory, memory_lengths, cache):
        return self.decoder.score_step(tokens_step, pos, memory,
                                       memory_lengths, cache)

    def decoder_init_cache(self, batch, max_len, memory=None,
                           memory_lengths=None):
        return self.decoder.init_cache(batch, max_len)

    def __call__(self, src_text, src_text_lengths, text, text_lengths,
                 deterministic: bool = True):
        c = self.config
        enc, enc_lengths = self.encode(src_text, src_text_lengths,
                                       deterministic)
        ys_in, ys_out, olens = add_sos_eos(
            text, text_lengths, c.sos_id, c.eos_id
        )
        logits = self.decoder(ys_in, olens, enc, enc_lengths, deterministic)
        valid = make_valid_mask(olens, ys_in.shape[1])
        loss = label_smoothing_loss(logits, ys_out, valid, c.lsm_weight)
        acc = token_accuracy(logits, ys_out, valid)
        stats = {"loss": loss, "acc": acc}
        return loss, stats
