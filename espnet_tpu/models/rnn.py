"""RNN (v1) stack: VGG-BLSTM encoder + location-aware attention LSTM decoder.

Behavioral spec: reference `espnet/nets/pytorch_backend/rnn/encoders.py`
(VGG2L `:24`: two 3x3-conv/maxpool blocks collapsing freq; RNNP `:90`:
stacked (B)LSTM with per-layer linear projection),
`rnn/attentions.py` (the full 14-type attention zoo lives in
`rnn_attentions.py`; AttLoc `:334` is the default — 1-D conv over the
previous alignment feeds the score MLP, softmax scaled by 2.0) and
`rnn/decoders.py` (Decoder `:44`: LSTM stack fed [embed, context], output
projection over [top hidden, context]).

The decoder exposes the same `decoder_init_cache`/`decoder_score_step`
interface as the transformer decoder, so the batched label-synchronous
beam search (`decode/beam_search.py`) drives either decoder unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.ops.masks import make_valid_mask


class VGG2L(nn.Module):
    """Two conv/pool blocks (64, 128 channels), freq collapsed
    (`encoders.py:24`)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths):
        x = feats[..., None]  # (B, T, F, 1)
        for i, ch in enumerate((64, 128)):
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"conv{i}_1")(x))
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"conv{i}_2")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="out")(x)
        return x, lengths // 4


class VGGRNNEncoder(nn.Module):
    """VGG2L + stacked BLSTM with projection (`encoders.py` VGG2L+RNNP)."""

    d_model: int = 256       # eprojs (projection dim)
    hidden: int = 256        # eunits per direction
    num_layers: int = 3      # elayers
    bidirectional: bool = True
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True,
                 carry=None, return_carry: bool = False):
        """If `carry` is given (list of per-layer LSTM carries from
        `init_carry` or a previous chunk) the forward RNNs resume from it —
        the chunk-streaming path of the reference v1 encoders
        (`rnn/encoders.py` RNNP `prev_state` threading, used by
        `streaming/{window,segment}.py`). Requires bidirectional=False.
        Returns (out, olens) or (out, olens, new_carry)."""
        if carry is not None or return_carry:
            assert not self.bidirectional, (
                "chunk-carry streaming needs a unidirectional encoder"
            )
        x, olens = VGG2L(self.d_model, self.dtype, name="vgg")(feats, lengths)
        new_carry = []
        for i in range(self.num_layers):
            fwd_rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden),
                             name=f"lstm{i}_fwd")
            if carry is not None or return_carry:
                c_i, fwd = fwd_rnn(
                    x,
                    initial_carry=None if carry is None else carry[i],
                    return_carry=True,
                )
                new_carry.append(c_i)
            else:
                fwd = fwd_rnn(x)
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                             keep_order=True, name=f"lstm{i}_bwd")(x)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
            x = jnp.tanh(
                nn.Dense(self.d_model, dtype=self.dtype, name=f"proj{i}")(h)
            )
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        mask = make_valid_mask(olens, x.shape[1])[:, :, None]
        out = x * mask.astype(x.dtype)
        if return_carry:
            return out, olens, new_carry
        return out, olens

    def init_carry(self, batch: int):
        """Zero LSTM carries, one (c, h) pair per layer."""
        z = jnp.zeros((batch, self.hidden), self.dtype)
        return [(z, z) for _ in range(self.num_layers)]


from espnet_tpu.models.rnn_attentions import AttLoc, make_attention

# back-compat alias: the original in-file AttLoc implementation moved to the
# attention zoo (`rnn_attentions.py`) with identical parameter names
LocationAwareAttention = AttLoc


class RNNDecoder(nn.Module):
    """LSTM attention decoder (`decoders.py:44`).

    `att_type` selects from the v1 attention zoo (`rnn_attentions.py`,
    reference `rnn/attentions.py` via `initial_att`); `sampling_probability`
    enables scheduled sampling (`decoders.py:246`: with prob p the previous
    step's argmax prediction replaces the ground-truth input token — the
    reference draws one coin per step for the whole batch, as do we).
    """

    vocab_size: int
    encoder_dim: int = 256
    embed_dim: int = 256
    hidden: int = 256        # dunits
    num_layers: int = 1      # dlayers
    att_type: str = "location"
    att_dim: int = 320
    att_conv_channels: int = 10
    att_conv_kernel: int = 100
    att_heads: int = 4
    att_win: int = 5
    sampling_probability: float = 0.0
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.embed_dim,
                              dtype=self.dtype)
        self.cells = [
            nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                 name=f"lstm{i}")
            for i in range(self.num_layers)
        ]
        self.att = make_attention(
            self.att_type, att_dim=self.att_dim,
            conv_channels=self.att_conv_channels,
            conv_kernel=self.att_conv_kernel, heads=self.att_heads,
            att_win=self.att_win, out_dim=self.encoder_dim,
            dtype=self.dtype, name="att",
        )
        self.output = nn.Dense(self.vocab_size, dtype=self.dtype,
                               name="output")
        self.dropout = nn.Dropout(self.dropout_rate)

    def _step(self, token, state, enc, enc_mask, deterministic):
        """One decode step. state = dict(h list, c list, att dict)."""
        ey = self.embed(token)                        # (N, E)
        context, _, att_state = self.att(
            enc, enc_mask, state["h"][0], state["att"]
        )
        x = jnp.concatenate([ey, context], axis=-1)
        hs, cs = [], []
        for li, cell in enumerate(self.cells):
            (c_new, h_new), x = cell((state["c"][li], state["h"][li]), x)
            hs.append(h_new)
            cs.append(c_new)
        x = self.dropout(x, deterministic=deterministic)
        logits = self.output(jnp.concatenate([x, context], axis=-1))
        return logits, {"h": hs, "c": cs, "att": att_state}

    def init_state(self, batch: int, t_max: int, enc_mask):
        z = jnp.zeros((batch, self.hidden), self.dtype)
        return {"h": [z] * self.num_layers, "c": [z] * self.num_layers,
                "att": self.att.init_state(batch, t_max, enc_mask)}

    def __call__(self, tokens, token_lengths, memory, memory_lengths,
                 deterministic: bool = True):
        """Teacher-forced full forward: tokens (B, U) -> logits (B, U, V)."""
        b, u = tokens.shape
        enc_mask = make_valid_mask(memory_lengths, memory.shape[1])
        state = self.init_state(b, memory.shape[1], enc_mask)
        sample = self.sampling_probability > 0.0 and not deterministic

        # flax-native scan over target positions with shared params
        def body(mdl, carry, tok_t):
            state, prev_logits, i = carry
            if sample:
                rng_name = ("sampling" if mdl.has_rng("sampling")
                            else "dropout")
                coin = jax.random.bernoulli(
                    mdl.make_rng(rng_name), mdl.sampling_probability
                )
                use_pred = jnp.logical_and(coin, i > 0)
                tok_t = jnp.where(
                    use_pred,
                    jnp.argmax(prev_logits, axis=-1).astype(tok_t.dtype),
                    tok_t,
                )
            logits, new_state = mdl._step(
                tok_t, state, memory, enc_mask, deterministic
            )
            return (new_state, logits, i + 1), logits

        scan = nn.scan(
            body, variable_broadcast="params",
            split_rngs={"params": False, "dropout": True, "sampling": True},
            in_axes=1, out_axes=1,
        )
        logits0 = jnp.zeros((b, self.vocab_size), self.dtype)
        _, logits = scan(self, (state, logits0, jnp.int32(0)), tokens)
        return logits

    # --- beam-search interface (matches TransformerDecoder) ---------------
    def score_memory_cache(self, batch: int, memory, memory_lengths):
        enc_mask = make_valid_mask(memory_lengths, memory.shape[1])
        state = self.init_state(batch, memory.shape[1], enc_mask)
        # stack layer lists into arrays for a clean pytree
        # leading axis must be the batch/beam axis: the beam search
        # re-gathers cache rows with tree_map(lambda c: c[src])
        return {
            "h": jnp.stack(state["h"], 1), "c": jnp.stack(state["c"], 1),
            "att": state["att"],
        }

    def score_step(self, tokens_step, pos, memory, memory_lengths, cache):
        enc_mask = make_valid_mask(memory_lengths, memory.shape[1])
        state = {
            "h": [cache["h"][:, i] for i in range(self.num_layers)],
            "c": [cache["c"][:, i] for i in range(self.num_layers)],
            "att": cache["att"],
        }
        logits, new_state = self._step(
            tokens_step, state, memory, enc_mask, True
        )
        new_cache = {
            "h": jnp.stack(new_state["h"], 1),
            "c": jnp.stack(new_state["c"], 1),
            "att": new_state["att"],
        }
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), new_cache
