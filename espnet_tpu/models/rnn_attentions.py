"""v1 RNN attention zoo.

Behavioral spec: reference `espnet/nets/pytorch_backend/rnn/attentions.py`
(NoAtt :45, AttDot :93, AttAdd :170, AttLoc :249, AttCov :382, AttLoc2D :484,
AttLocRec :605, AttCovLoc :728, AttMultiHeadDot :844, AttMultiHeadAdd :957,
AttMultiHeadLoc :1074, AttMultiHeadMultiResLoc :1231, AttForward :1387,
AttForwardTA :1517) and the `initial_att`/`att_for` factory (:1650).

TPU-first redesign: the reference keeps per-utterance python state on the
module (`pre_compute_enc_h`, `mask`, mutable `att_prev` lists); here every
attention is a pure flax module with an explicit, fixed-shape dict state so
one compiled program drives teacher forcing (`lax.scan`) and beam search
(`lax.while_loop`) alike.  Every state leaf has a leading batch axis so the
beam search can re-gather hypothesis rows with a `tree_map`.  The unbounded
`att_prev_list` of AttCov/AttCovLoc becomes a running coverage sum (the
reference only ever consumes `sum(att_prev_list)`), and AttLoc2D's window is
a fixed-size rolling buffer — both XLA-static formulations of the same math.

Interface:
  ``init_state(batch, t_max, enc_mask) -> dict``  (pure shape/mask math)
  ``__call__(enc, enc_mask, dec_state, state, out_prev=None)
      -> (context, w, new_state)``

Biases that cancel in the softmax (the reference's `gvec` bias) are omitted;
biases inside `tanh` (mlp_enc, wvec) are kept — torch-parity is asserted in
`tests/test_rnn_attentions.py`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_valid(enc_mask, dtype):
    """Uniform weights over valid frames (reference inits att_prev this way)."""
    m = enc_mask.astype(dtype)
    return m / jnp.sum(m, axis=-1, keepdims=True)


def _masked_softmax(e, enc_mask, scaling):
    e = jnp.where(enc_mask, e, -1e30)
    return jax.nn.softmax(scaling * e, axis=-1)


class NoAtt(nn.Module):
    """Uniform (content-free) attention (`attentions.py:45`)."""

    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        return {"w": _uniform_valid(enc_mask, self.dtype)}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        w = state["w"]
        context = jnp.einsum("nt,ntd->nd", w, enc)
        return context, w, {"w": w}


class AttDot(nn.Module):
    """tanh-dot attention (`attentions.py:93`)."""

    att_dim: int = 320
    scaling: float = 2.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        return {}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        k = jnp.tanh(nn.Dense(self.att_dim, dtype=self.dtype,
                              name="mlp_enc")(enc))
        q = jnp.tanh(nn.Dense(self.att_dim, dtype=self.dtype,
                              name="mlp_dec")(dec_state))
        e = jnp.einsum("ntd,nd->nt", k, q)
        w = _masked_softmax(e, enc_mask, self.scaling)
        return jnp.einsum("nt,ntd->nd", w, enc), w, {}


class AttAdd(nn.Module):
    """Additive (Bahdanau) attention (`attentions.py:170`)."""

    att_dim: int = 320
    scaling: float = 2.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        return {}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        e = jnp.tanh(
            nn.Dense(self.att_dim, dtype=self.dtype, name="mlp_enc")(enc)
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_dec")(dec_state)[:, None]
        )
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(e)[..., 0]
        w = _masked_softmax(e, enc_mask, self.scaling)
        return jnp.einsum("nt,ntd->nd", w, enc), w, {}


class AttLoc(nn.Module):
    """Location-aware attention (`attentions.py:249`): 1-D conv over the
    previous alignment feeds the score MLP."""

    att_dim: int = 320
    conv_channels: int = 10
    conv_kernel: int = 100
    scaling: float = 2.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        return {"w": _uniform_valid(enc_mask, self.dtype)}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        f = nn.Conv(self.conv_channels, (2 * (self.conv_kernel // 2) + 1,),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="loc_conv")(state["w"][:, :, None])
        e = nn.tanh(
            nn.Dense(self.att_dim, dtype=self.dtype, name="mlp_enc")(enc)
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_dec")(dec_state)[:, None]
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_att")(f)
        )
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(e)[..., 0]
        w = _masked_softmax(e, enc_mask, self.scaling)
        return jnp.einsum("nt,ntd->nd", w, enc), w, {"w": w}


class AttCov(nn.Module):
    """Coverage attention (`attentions.py:382`): the running sum of all past
    alignments (incl. the uniform init) enters the score MLP through wvec."""

    att_dim: int = 320
    scaling: float = 2.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        return {"cum": _uniform_valid(enc_mask, self.dtype)}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        cov = nn.Dense(self.att_dim, dtype=self.dtype,
                       name="wvec")(state["cum"][:, :, None])
        e = jnp.tanh(
            cov
            + nn.Dense(self.att_dim, dtype=self.dtype, name="mlp_enc")(enc)
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_dec")(dec_state)[:, None]
        )
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(e)[..., 0]
        w = _masked_softmax(e, enc_mask, self.scaling)
        return (jnp.einsum("nt,ntd->nd", w, enc), w,
                {"cum": state["cum"] + w})


class AttCovLoc(nn.Module):
    """Coverage-location attention (`attentions.py:728`): AttLoc whose conv
    input is the coverage sum instead of the last alignment."""

    att_dim: int = 320
    conv_channels: int = 10
    conv_kernel: int = 100
    scaling: float = 2.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        return {"cum": _uniform_valid(enc_mask, self.dtype)}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        f = nn.Conv(self.conv_channels, (2 * (self.conv_kernel // 2) + 1,),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="loc_conv")(state["cum"][:, :, None])
        e = nn.tanh(
            nn.Dense(self.att_dim, dtype=self.dtype, name="mlp_enc")(enc)
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_dec")(dec_state)[:, None]
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_att")(f)
        )
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(e)[..., 0]
        w = _masked_softmax(e, enc_mask, self.scaling)
        return (jnp.einsum("nt,ntd->nd", w, enc), w,
                {"cum": state["cum"] + w})


class AttLoc2D(nn.Module):
    """2-D location attention (`attentions.py:484`): convolve a rolling
    window of the last `att_win` alignments with an (att_win, K) kernel."""

    att_dim: int = 320
    conv_channels: int = 10
    conv_kernel: int = 100
    att_win: int = 5
    scaling: float = 2.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        w0 = _uniform_valid(enc_mask, self.dtype)
        return {"win": jnp.tile(w0[:, None, :], (1, self.att_win, 1))}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        filts = self.conv_kernel // 2
        # (B, att_win, T, 1) -> VALID over the window axis, SAME over time
        f = nn.Conv(self.conv_channels, (self.att_win, 2 * filts + 1),
                    padding=((0, 0), (filts, filts)), use_bias=False,
                    dtype=self.dtype,
                    name="loc_conv")(state["win"][..., None])
        f = f[:, 0]  # (B, T, C)
        e = jnp.tanh(
            nn.Dense(self.att_dim, dtype=self.dtype, name="mlp_enc")(enc)
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_dec")(dec_state)[:, None]
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_att")(f)
        )
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(e)[..., 0]
        w = _masked_softmax(e, enc_mask, self.scaling)
        win = jnp.concatenate([state["win"][:, 1:], w[:, None]], axis=1)
        return jnp.einsum("nt,ntd->nd", w, enc), w, {"win": win}


class AttLocRec(nn.Module):
    """Recurrent location attention (`attentions.py:605`): conv + relu +
    max-pool over time of the last alignment drives a bias-free LSTM cell
    whose hidden state enters the score MLP."""

    att_dim: int = 320
    conv_channels: int = 10
    conv_kernel: int = 100
    scaling: float = 2.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        z = jnp.zeros((batch, self.att_dim), self.dtype)
        return {"w": _uniform_valid(enc_mask, self.dtype), "ah": z, "ac": z}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        f = nn.Conv(self.conv_channels, (2 * (self.conv_kernel // 2) + 1,),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="loc_conv")(state["w"][:, :, None])
        pooled = jnp.max(nn.relu(f), axis=1)  # (B, C)
        # bias-free LSTM cell, torch gate order i,f,g,o (LSTMCell(bias=False))
        gates = (
            nn.Dense(4 * self.att_dim, use_bias=False, dtype=self.dtype,
                     name="lstm_ih")(pooled)
            + nn.Dense(4 * self.att_dim, use_bias=False, dtype=self.dtype,
                       name="lstm_hh")(state["ah"])
        )
        i, fg, g, o = jnp.split(gates, 4, axis=-1)
        ac = nn.sigmoid(fg) * state["ac"] + nn.sigmoid(i) * jnp.tanh(g)
        ah = nn.sigmoid(o) * jnp.tanh(ac)
        e = jnp.tanh(
            ah[:, None]
            + nn.Dense(self.att_dim, dtype=self.dtype, name="mlp_enc")(enc)
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_dec")(dec_state)[:, None]
        )
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(e)[..., 0]
        w = _masked_softmax(e, enc_mask, self.scaling)
        return (jnp.einsum("nt,ntd->nd", w, enc), w,
                {"w": w, "ah": ah, "ac": ac})


class AttMultiHeadDot(nn.Module):
    """Multi-head tanh-dot attention (`attentions.py:844`).  The reference's
    per-head Linear lists are fused into single (in, H*d) projections — one
    MXU matmul instead of H small ones."""

    heads: int = 4
    att_dim_k: int = 64
    att_dim_v: int = 64
    out_dim: int = 256   # eprojs (mlp_o output)
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        return {}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        b, t, _ = enc.shape
        k = jnp.tanh(
            nn.Dense(self.heads * self.att_dim_k, use_bias=False,
                     dtype=self.dtype, name="mlp_k")(enc)
        ).reshape(b, t, self.heads, self.att_dim_k)
        v = nn.Dense(self.heads * self.att_dim_v, use_bias=False,
                     dtype=self.dtype,
                     name="mlp_v")(enc).reshape(b, t, self.heads,
                                                self.att_dim_v)
        q = jnp.tanh(
            nn.Dense(self.heads * self.att_dim_k, dtype=self.dtype,
                     name="mlp_q")(dec_state)
        ).reshape(b, self.heads, self.att_dim_k)
        e = jnp.einsum("nthk,nhk->nht", k, q)
        w = _masked_softmax(e, enc_mask[:, None, :],
                            1.0 / jnp.sqrt(jnp.asarray(self.att_dim_k,
                                                       self.dtype)))
        c = jnp.einsum("nht,nthv->nhv", w, v).reshape(b, -1)
        c = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="mlp_o")(c)
        return c, w.mean(axis=1), {}


class AttMultiHeadAdd(nn.Module):
    """Multi-head additive attention (`attentions.py:957`)."""

    heads: int = 4
    att_dim_k: int = 64
    att_dim_v: int = 64
    out_dim: int = 256
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        return {}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        b, t, _ = enc.shape
        k = nn.Dense(self.heads * self.att_dim_k, use_bias=False,
                     dtype=self.dtype,
                     name="mlp_k")(enc).reshape(b, t, self.heads,
                                                self.att_dim_k)
        v = nn.Dense(self.heads * self.att_dim_v, use_bias=False,
                     dtype=self.dtype,
                     name="mlp_v")(enc).reshape(b, t, self.heads,
                                                self.att_dim_v)
        q = nn.Dense(self.heads * self.att_dim_k, dtype=self.dtype,
                     name="mlp_q")(dec_state).reshape(b, self.heads,
                                                      self.att_dim_k)
        h = jnp.tanh(k + q[:, None])
        # per-head gvec: (H, dk) contraction
        gv = self.param("gvec", nn.initializers.lecun_normal(),
                        (self.heads, self.att_dim_k), self.dtype)
        e = jnp.einsum("nthk,hk->nht", h, gv)
        w = _masked_softmax(e, enc_mask[:, None, :],
                            1.0 / float(self.att_dim_k) ** 0.5)
        c = jnp.einsum("nht,nthv->nhv", w, v).reshape(b, -1)
        c = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="mlp_o")(c)
        return c, w.mean(axis=1), {}


class _MultiHeadLocBase(nn.Module):
    """Shared body of AttMultiHeadLoc (:1074) / AttMultiHeadMultiResLoc
    (:1231); the only difference is the per-head conv filter size."""

    heads: int = 4
    att_dim_k: int = 64
    att_dim_v: int = 64
    out_dim: int = 256
    conv_channels: int = 10
    conv_kernel: int = 100
    multi_res: bool = False
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        w0 = _uniform_valid(enc_mask, self.dtype)
        return {"w": jnp.tile(w0[:, None, :], (1, self.heads, 1))}

    def _head_filts(self, h):
        base = self.conv_kernel // 2
        if self.multi_res:
            # reference :1276 — afilts = aconv_filts * (h + 1) // aheads
            # (may be 0: a kernel-size-1 conv, same as the reference)
            return base * (h + 1) // self.heads
        return base

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        b, t, _ = enc.shape
        k = nn.Dense(self.heads * self.att_dim_k, use_bias=False,
                     dtype=self.dtype,
                     name="mlp_k")(enc).reshape(b, t, self.heads,
                                                self.att_dim_k)
        v = nn.Dense(self.heads * self.att_dim_v, use_bias=False,
                     dtype=self.dtype,
                     name="mlp_v")(enc).reshape(b, t, self.heads,
                                                self.att_dim_v)
        q = nn.Dense(self.heads * self.att_dim_k, dtype=self.dtype,
                     name="mlp_q")(dec_state).reshape(b, self.heads,
                                                      self.att_dim_k)
        # per-head location conv (distinct filter sizes when multi_res)
        fs = []
        for hd in range(self.heads):
            filts = self._head_filts(hd)
            f = nn.Conv(self.conv_channels, (2 * filts + 1,), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name=f"loc_conv{hd}")(state["w"][:, hd, :, None])
            fs.append(nn.Dense(self.att_dim_k, use_bias=False,
                               dtype=self.dtype, name=f"mlp_att{hd}")(f))
        fstack = jnp.stack(fs, axis=2)  # (B, T, H, dk)
        e = jnp.tanh(k + q[:, None] + fstack)
        gv = self.param("gvec", nn.initializers.lecun_normal(),
                        (self.heads, self.att_dim_k), self.dtype)
        e = jnp.einsum("nthk,hk->nht", e, gv)
        # reference quirk: AttMultiHeadLoc applies its forward's scaling=2.0
        # default (:1148, self.scaling unused); MultiResLoc uses
        # self.scaling = 1/sqrt(dk) (:1289,:1370)
        scaling = (1.0 / float(self.att_dim_k) ** 0.5 if self.multi_res
                   else 2.0)
        w = _masked_softmax(e, enc_mask[:, None, :], scaling)
        c = jnp.einsum("nht,nthv->nhv", w, v).reshape(b, -1)
        c = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="mlp_o")(c)
        return c, w.mean(axis=1), {"w": w}


class AttForward(nn.Module):
    """Forward attention (`attentions.py:1387`): location scores reweighted
    by the forward recursion (w_prev + shift(w_prev)) then renormalised."""

    att_dim: int = 320
    conv_channels: int = 10
    conv_kernel: int = 100
    scaling: float = 1.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        # initial attention [1, 0, 0, ...]
        w0 = jnp.zeros((batch, t_max), self.dtype).at[:, 0].set(1.0)
        return {"w": w0}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        w_prev = state["w"]
        f = nn.Conv(self.conv_channels, (2 * (self.conv_kernel // 2) + 1,),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="loc_conv")(w_prev[:, :, None])
        e = jnp.tanh(
            nn.Dense(self.att_dim, dtype=self.dtype, name="mlp_enc")(enc)
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_dec")(dec_state)[:, None]
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_att")(f)
        )
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(e)[..., 0]
        w = _masked_softmax(e, enc_mask, self.scaling)
        shift = jnp.pad(w_prev, ((0, 0), (1, 0)))[:, :-1]
        w = (w_prev + shift) * w
        w = jnp.clip(w, 1e-6, None)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        return jnp.einsum("nt,ntd->nd", w, enc), w, {"w": w}


class AttForwardTA(nn.Module):
    """Forward attention with transition agent (`attentions.py:1517`):
    the blend of stay/move probabilities is predicted from
    [context, previous output frame, decoder state]."""

    att_dim: int = 320
    conv_channels: int = 10
    conv_kernel: int = 100
    scaling: float = 1.0
    dtype: Any = jnp.float32

    def init_state(self, batch, t_max, enc_mask):
        w0 = jnp.zeros((batch, t_max), self.dtype).at[:, 0].set(1.0)
        return {"w": w0, "ta": jnp.full((batch, 1), 0.5, self.dtype)}

    @nn.compact
    def __call__(self, enc, enc_mask, dec_state, state, out_prev=None):
        assert out_prev is not None, "AttForwardTA needs the previous output"
        w_prev, ta = state["w"], state["ta"]
        f = nn.Conv(self.conv_channels, (2 * (self.conv_kernel // 2) + 1,),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="loc_conv")(w_prev[:, :, None])
        e = jnp.tanh(
            nn.Dense(self.att_dim, dtype=self.dtype, name="mlp_enc")(enc)
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_dec")(dec_state)[:, None]
            + nn.Dense(self.att_dim, use_bias=False, dtype=self.dtype,
                       name="mlp_att")(f)
        )
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(e)[..., 0]
        w = _masked_softmax(e, enc_mask, self.scaling)
        shift = jnp.pad(w_prev, ((0, 0), (1, 0)))[:, :-1]
        w = (ta * w_prev + (1.0 - ta) * shift) * w
        w = jnp.clip(w, 1e-6, None)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        context = jnp.einsum("nt,ntd->nd", w, enc)
        ta_new = nn.sigmoid(
            nn.Dense(1, dtype=self.dtype, name="mlp_ta")(
                jnp.concatenate([context, out_prev, dec_state], axis=-1)
            )
        )
        return context, w, {"w": w, "ta": ta_new}


ATT_TYPES = (
    "noatt", "dot", "add", "location", "coverage", "coverage_location",
    "location2d", "location_recurrent", "multi_head_dot", "multi_head_add",
    "multi_head_loc", "multi_head_multi_res_loc", "forward", "forward_ta",
)


def make_attention(att_type: str, *, att_dim=320, conv_channels=10,
                   conv_kernel=100, heads=4, att_win=5, out_dim=256,
                   dtype=jnp.float32, name="att"):
    """Factory mirroring `initial_att` (`attentions.py:1650`).

    `conv_kernel` is the full kernel length (2*aconv_filts+1 ~ reference's
    aconv_filts); `out_dim` is eprojs for the multi-head variants' mlp_o.
    """
    if att_type == "noatt":
        return NoAtt(dtype=dtype, name=name)
    if att_type == "dot":
        return AttDot(att_dim=att_dim, dtype=dtype, name=name)
    if att_type == "add":
        return AttAdd(att_dim=att_dim, dtype=dtype, name=name)
    if att_type == "location":
        return AttLoc(att_dim=att_dim, conv_channels=conv_channels,
                      conv_kernel=conv_kernel, dtype=dtype, name=name)
    if att_type == "coverage":
        return AttCov(att_dim=att_dim, dtype=dtype, name=name)
    if att_type == "coverage_location":
        return AttCovLoc(att_dim=att_dim, conv_channels=conv_channels,
                         conv_kernel=conv_kernel, dtype=dtype, name=name)
    if att_type == "location2d":
        return AttLoc2D(att_dim=att_dim, conv_channels=conv_channels,
                        conv_kernel=conv_kernel, att_win=att_win,
                        dtype=dtype, name=name)
    if att_type == "location_recurrent":
        return AttLocRec(att_dim=att_dim, conv_channels=conv_channels,
                         conv_kernel=conv_kernel, dtype=dtype, name=name)
    if att_type == "multi_head_dot":
        return AttMultiHeadDot(heads=heads, att_dim_k=att_dim,
                               att_dim_v=att_dim, out_dim=out_dim,
                               dtype=dtype, name=name)
    if att_type == "multi_head_add":
        return AttMultiHeadAdd(heads=heads, att_dim_k=att_dim,
                               att_dim_v=att_dim, out_dim=out_dim,
                               dtype=dtype, name=name)
    if att_type in ("multi_head_loc", "multi_head_multi_res_loc"):
        return _MultiHeadLocBase(
            heads=heads, att_dim_k=att_dim, att_dim_v=att_dim,
            out_dim=out_dim, conv_channels=conv_channels,
            conv_kernel=conv_kernel,
            multi_res=(att_type == "multi_head_multi_res_loc"),
            dtype=dtype, name=name)
    if att_type == "forward":
        return AttForward(att_dim=att_dim, conv_channels=conv_channels,
                          conv_kernel=conv_kernel, dtype=dtype, name=name)
    if att_type == "forward_ta":
        return AttForwardTA(att_dim=att_dim, conv_channels=conv_channels,
                            conv_kernel=conv_kernel, dtype=dtype, name=name)
    raise ValueError(f"unknown att_type: {att_type!r} (choices: {ATT_TYPES})")
