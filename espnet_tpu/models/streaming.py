"""Contextual-block (streaming) conformer encoder.

Behavioral spec: reference
`espnet2/asr/encoder/contextual_block_conformer_encoder.py:36`
(block/hop/look-ahead chunking with a context-embedding token carried one
block per layer; `forward_train:228` processes all blocks in parallel,
`forward_infer:382` consumes audio incrementally) and the per-layer context
plumbing of
`espnet/nets/pytorch_backend/conformer/contextual_block_encoder_layer.py`
(`forward_train:96`: slot 0 of block b at layer l is the slot -1 output of
layer l-1 at block b-1; block 0 reuses its own chain).

TPU formulation: frames are gathered once into a static
(B, nblk, block_size+2, D) slab; every layer is one batched
(B*nblk, block_size+2, D) conformer layer on the MXU plus a roll of the
context lane — no sequential loop over blocks in training. The blockwise
path (`forward_blockwise`) runs the *same* parameters sequentially with an
explicit carried state and produces bit-identical outputs, which is the
streaming execution mode.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.attention import MultiHeadAttention
from espnet_tpu.models.conformer import ConvolutionModule
from espnet_tpu.models.embedding import sinusoidal_table
from espnet_tpu.models.subsampling import Conv2dSubsampling
from espnet_tpu.models.transformer import PositionwiseFeedForward
from espnet_tpu.ops.masks import attention_bias, make_valid_mask


class ContextualBlockLayer(nn.Module):
    """One conformer-style layer applied to (N, block_size+2, D) chunks.

    Structure mirrors `contextual_block_encoder_layer.py:96-180`:
    [macaron FF] -> MHA -> conv -> FF -> final LayerNorm (pre-norm).
    """

    d_model: int
    num_heads: int
    d_ff: int
    kernel_size: int = 31
    dropout_rate: float = 0.1
    macaron_style: bool = True
    use_cnn_module: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)
        ff_scale = 0.5 if self.macaron_style else 1.0
        if self.macaron_style:
            h = nn.LayerNorm(dtype=self.dtype, name="norm_ff_macaron")(x)
            h = PositionwiseFeedForward(
                self.d_model, self.d_ff, self.dropout_rate,
                activation="swish", dtype=self.dtype, name="ff_macaron",
            )(h, deterministic)
            x = x + ff_scale * drop(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = MultiHeadAttention(self.num_heads, self.d_model, self.dtype,
                               name="self_attn")(h, h, h, bias)
        x = x + drop(h, deterministic=deterministic)
        if self.use_cnn_module:
            h = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
            h = ConvolutionModule(
                self.d_model, self.kernel_size, "layer", self.dtype,
                name="conv",
            )(h, jnp.ones(h.shape[:2], bool), deterministic)
            x = x + drop(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = PositionwiseFeedForward(
            self.d_model, self.d_ff, self.dropout_rate,
            activation="swish", dtype=self.dtype, name="ff",
        )(h, deterministic)
        x = x + ff_scale * drop(h, deterministic=deterministic)
        if self.use_cnn_module:
            x = nn.LayerNorm(dtype=self.dtype, name="norm_final")(x)
        return x


def _block_geometry(t: int, block_size: int, hop_size: int, look_ahead: int):
    """Static frame->(block, slot) gather maps (numpy, compile-time)."""
    past = block_size - hop_size - look_ahead
    nblk = max(1, math.ceil(float(t - past - look_ahead) / hop_size))
    # output reconstruction map (`forward_train`, encoder.py:357-375):
    # block 0 emits [0, bs-la); block b>=1 emits from slot i - b*hop + 1
    first = block_size - look_ahead
    idx = np.arange(t)
    blk = np.where(idx < first, 0, 1 + (idx - first) // hop_size)
    blk = np.minimum(blk, nblk - 1)
    slot = idx - blk * hop_size + 1
    slot = np.clip(slot, 0, block_size + 1)
    return nblk, blk.astype(np.int32), slot.astype(np.int32)


class ContextualBlockConformerEncoder(nn.Module):
    """Streaming conformer encoder (train-parallel + blockwise-sequential)."""

    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_layers: int = 12
    kernel_size: int = 31
    dropout_rate: float = 0.1
    subsampling_factor: int = 4
    block_size: int = 40
    hop_size: int = 16
    look_ahead: int = 16
    init_average: bool = True
    ctx_pos_enc: bool = True
    macaron_style: bool = True
    use_cnn_module: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = Conv2dSubsampling(
            self.d_model, self.subsampling_factor, dtype=self.dtype,
            name="embed",
        )
        self.layers = [
            ContextualBlockLayer(
                self.d_model, self.num_heads, self.d_ff, self.kernel_size,
                self.dropout_rate, self.macaron_style, self.use_cnn_module,
                self.dtype, name=f"layer{i}",
            )
            for i in range(self.num_layers)
        ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")

    # --- shared helpers ---------------------------------------------------
    def _pos_enc(self, x, start: int = 0):
        t, d = x.shape[-2], x.shape[-1]
        pe = jnp.asarray(sinusoidal_table(start + t, d)[start:])
        return x * jnp.asarray(d ** 0.5, x.dtype) + pe.astype(x.dtype)

    def _addin(self, x_raw, counts):
        """Per-block context seed: mean (or max) of raw block frames.

        x_raw: (B, nblk, block_size, D) zero-padded windows; counts (nblk,)
        actual frames per window (`forward_train` encoder.py:276-300).
        """
        if self.init_average:
            return jnp.sum(x_raw, axis=2) / jnp.maximum(
                counts[None, :, None], 1
            ).astype(x_raw.dtype)
        return jnp.max(x_raw, axis=2)

    def _chunk_bias(self):
        # queries 1..bs+1 attend keys 0..bs (encoder.py:312-317); query 0 is
        # inert (overwritten next layer), key bs+1 (ctx seed) is query-only
        bs = self.block_size
        q = np.arange(bs + 2)[:, None]
        k = np.arange(bs + 2)[None, :]
        mask = (q >= 1) & (k <= bs)
        return attention_bias(jnp.asarray(mask)[None, None])

    def _windows(self, x, nblk):
        """x (B, T, D) -> (B, nblk, block_size, D) strided windows + counts."""
        b, t, d = x.shape
        bs, hop = self.block_size, self.hop_size
        need = (nblk - 1) * hop + bs
        xp = jnp.pad(x, ((0, 0), (0, max(0, need - t)), (0, 0)))
        starts = np.arange(nblk) * hop
        idx = starts[:, None] + np.arange(bs)[None, :]  # (nblk, bs)
        counts = np.minimum(np.maximum(t - starts, 0), bs)
        return xp[:, idx], jnp.asarray(counts)

    # --- training path (all blocks in parallel) ---------------------------
    def __call__(self, feats, lengths, deterministic: bool = True):
        x, olens = self.embed(feats, lengths)
        b, t, d = x.shape
        bs = self.block_size
        if bs == 0 or t <= bs:
            # short-sequence path (encoder.py:258-268): one full block
            bias = attention_bias(
                make_valid_mask(olens, t)[:, None, None, :]
            )
            h = self._pos_enc(x)
            for layer in self.layers:
                h = layer(h, bias, deterministic)
            return self.after_norm(h), olens

        nblk, blk_map, slot_map = _block_geometry(
            t, bs, self.hop_size, self.look_ahead
        )
        win_raw, counts = self._windows(x, nblk)
        addin = self._addin(win_raw, counts)          # (B, nblk, D)
        if self.ctx_pos_enc:
            addin = self._pos_enc(addin)
        x_pe = self._pos_enc(x)
        win, _ = self._windows(x_pe, nblk)            # (B, nblk, bs, D)

        prev_addin = jnp.concatenate([addin[:, :1], addin[:, :-1]], axis=1)
        chunk = jnp.concatenate(
            [prev_addin[:, :, None], win, addin[:, :, None]], axis=2
        )  # (B, nblk, bs+2, D)

        bias = self._chunk_bias()
        h = chunk
        for li, layer in enumerate(self.layers):
            if li > 0:
                # ctx lane: slot 0 of block b <- slot -1 of block b-1 at the
                # previous layer; block 0 reuses its own
                # (contextual_block_encoder_layer.py:191-194)
                chain = h[:, :, -1]
                ctx = jnp.concatenate([chain[:, :1], chain[:, :-1]], axis=1)
                h = h.at[:, :, 0].set(ctx)
            h = layer(
                h.reshape(b * nblk, bs + 2, d), bias, deterministic
            ).reshape(b, nblk, bs + 2, d)

        ys = h[:, blk_map, slot_map]                  # (B, T, D)
        return self.after_norm(ys), olens

    # --- blockwise-sequential path (streaming execution) -------------------
    def forward_blockwise(self, feats, lengths, deterministic: bool = True):
        """Same computation, sequential over blocks with explicit carried
        context (the streaming execution mode; equals __call__ exactly)."""
        x, olens = self.embed(feats, lengths)
        b, t, d = x.shape
        bs = self.block_size
        if bs == 0 or t <= bs:
            return self(feats, lengths, deterministic)
        nblk, blk_map, slot_map = _block_geometry(
            t, bs, self.hop_size, self.look_ahead
        )
        win_raw, counts = self._windows(x, nblk)
        addin_all = self._addin(win_raw, counts)
        if self.ctx_pos_enc:
            addin_all = self._pos_enc(addin_all)
        x_pe = self._pos_enc(x)
        win, _ = self._windows(x_pe, nblk)
        bias = self._chunk_bias()

        ctx = None  # list of per-layer context vectors from previous block
        outs = []
        for bi in range(nblk):
            chunk, new_ctx = self._one_block(
                win[:, bi], addin_all[:, bi],
                addin_all[:, bi - 1] if bi > 0 else None,
                ctx, bias, deterministic,
            )
            outs.append(chunk)
            ctx = new_ctx
        h = jnp.stack(outs, axis=1)  # (B, nblk, bs+2, D)
        ys = h[:, blk_map, slot_map]
        return self.after_norm(ys), olens

    def _one_block(self, frames, addin_cur, addin_prev, ctx, bias,
                   deterministic):
        """Process one (B, bs, D) block. ctx: None (first block) or list of
        num_layers context vectors (B, D) carried from the previous block.
        Returns (chunk output (B, bs+2, D), new ctx list)."""
        first = ctx is None
        slot0 = addin_cur if first else addin_prev
        h = jnp.concatenate(
            [slot0[:, None], frames, addin_cur[:, None]], axis=1
        )
        new_ctx = []
        for li, layer in enumerate(self.layers):
            if li > 0:
                chain = h[:, -1]  # slot -1 output of layer li-1, this block
                use = chain if first else ctx[li]
                h = h.at[:, 0].set(use)
                new_ctx.append(chain)
            else:
                new_ctx.append(addin_cur)
            h = layer(h, bias, deterministic)
        return h, new_ctx
