"""Multi-head attention modules (flax.linen).

Behavioral spec: reference `espnet/nets/pytorch_backend/transformer/attention.py`
(`MultiHeadedAttention:15`, `RelPositionMultiHeadedAttention:209` — the
Transformer-XL relative-position variant used by the Conformer). TPU-first
implementation: einsum-everything so the whole attention block is MXU matmuls;
masks arrive as additive bias; softmax in float32 regardless of compute dtype.

Sharding note: head dimension is the natural tensor-parallel axis; projections
carry logical axis names via `nn.with_logical_partitioning` so
`parallel/sharding.py` can map them onto a ("data","model") mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _flash_disabled() -> bool:
    """ESPNET_TPU_DISABLE_FLASH=1 forces the XLA attention path (perf
    ablation / kernel debugging escape hatch)."""
    return os.environ.get("ESPNET_TPU_DISABLE_FLASH", "") not in ("", "0")


def _dense(features: int, dtype, name: str, logical=("embed", "heads")):
    return nn.Dense(
        features,
        dtype=dtype,
        name=name,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.xavier_uniform(), logical
        ),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros, (logical[-1],)),
    )


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    extra_score: Optional[jnp.ndarray] = None,
    return_weights: bool = False,
) -> jnp.ndarray:
    """q,k,v: (B, H, T, Dk). bias: broadcastable to (B, H, Tq, Tk)."""
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if extra_score is not None:
        scores = scores + extra_score
    scores = scores.astype(jnp.float32) / np.sqrt(d_k)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    weights = nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
    if return_weights:
        return out, weights
    return out


class MultiHeadAttention(nn.Module):
    """Standard MHA. Returns (B, Tq, D).

    For long full self-attention (no incremental cache, Tq == Tk >=
    flash_threshold) the blocked Pallas online-softmax kernel
    (`espnet_tpu/ops/pallas_attention.py`) is used instead of
    materialising the (B, H, T, T) score tensor; below the threshold the
    plain XLA einsum path is faster (one fused launch, fits VMEM anyway).
    """

    num_heads: int
    d_model: int
    dtype: jnp.dtype = jnp.float32
    flash_threshold: int = 512

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.q_proj = _dense(self.d_model, self.dtype, "q_proj")
        self.k_proj = _dense(self.d_model, self.dtype, "k_proj")
        self.v_proj = _dense(self.d_model, self.dtype, "v_proj")
        self.out_proj = _dense(self.d_model, self.dtype, "out_proj",
                               logical=("heads", "embed"))

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        h = self.num_heads
        return x.reshape(b, t, h, self.d_model // h).transpose(0, 2, 1, 3)

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        """If `cache` is given ({"k","v"}: (B,H,Tmax,Dk)) and query is one
        step (Tq=1), performs incremental decoding: writes k/v at
        `cache_index` and attends over cache[:index+1] via bias masking.
        Returns (out, new_cache).
        """
        q = self._split(self.q_proj(query))
        k = self._split(self.k_proj(key))
        v = self._split(self.v_proj(value))
        new_cache = None
        if cache is not None:
            # Incremental: write this step's k/v into the cache at position i.
            idx = cache_index
            ck = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, idx, 0))
            cv = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, idx, 0))
            k, v = ck, cv
            new_cache = {"k": ck, "v": cv}
            tmax = k.shape[2]
            valid = jnp.arange(tmax)[None, None, None, :] <= idx
            step_bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
            bias = step_bias if bias is None else bias + step_bias
        use_flash = (
            cache is None
            and q.shape[2] == k.shape[2]
            and q.shape[2] >= self.flash_threshold
            and q.shape[3] % 8 == 0
            and not _flash_disabled()
        )
        if use_flash:
            from espnet_tpu.ops.pallas_attention import flash_attention

            x = flash_attention(q, k, v, bias)
        elif self.is_mutable_collection("intermediates"):
            # attention-heatmap capture (reference trainer plot_attention,
            # `espnet2/train/trainer.py:787`): weights are sown only when
            # the caller applies with mutable=["intermediates"]
            x, w = scaled_dot_attention(q, k, v, bias, return_weights=True)
            self.sow("intermediates", "attn", w)
        else:
            x = scaled_dot_attention(q, k, v, bias)
        b, h, t, dk = x.shape
        out = self.out_proj(x.transpose(0, 2, 1, 3).reshape(b, t, h * dk))
        if cache is not None:
            return out, new_cache
        return out


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift.

    x: (B, H, T, 2T-1) scores against positions [T-1 .. -(T-1)];
    returns (B, H, T, T) where out[..., i, j] = x[..., i, (T-1) - (i - j)]
    i.e. score for relative position (i - j). Matches
    `attention.py:209` RelPositionMultiHeadedAttention.rel_shift.
    """
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:].reshape(b, h, t, 2 * t - 1)
    return x[:, :, :, :t]


class RelPositionMultiHeadAttention(nn.Module):
    """MHA with Transformer-XL style relative position encoding (Conformer)."""

    num_heads: int
    d_model: int
    dtype: jnp.dtype = jnp.float32
    flash_threshold: int = 256  # min T for the Pallas rel-pos kernel (TPU)

    def setup(self):
        h, d = self.num_heads, self.d_model
        assert d % h == 0
        self.q_proj = _dense(d, self.dtype, "q_proj")
        self.k_proj = _dense(d, self.dtype, "k_proj")
        self.v_proj = _dense(d, self.dtype, "v_proj")
        self.out_proj = _dense(d, self.dtype, "out_proj", logical=("heads", "embed"))
        self.pos_proj = nn.Dense(
            d,
            use_bias=False,
            dtype=self.dtype,
            name="pos_proj",
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("embed", "heads")
            ),
        )
        dk = d // h
        self.pos_bias_u = self.param(
            "pos_bias_u",
            nn.with_logical_partitioning(nn.initializers.zeros, ("heads", "kv")),
            (h, dk),
        )
        self.pos_bias_v = self.param(
            "pos_bias_v",
            nn.with_logical_partitioning(nn.initializers.zeros, ("heads", "kv")),
            (h, dk),
        )

    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h, dk = self.num_heads, d // self.num_heads
        q = self.q_proj(x).reshape(b, t, h, dk).transpose(0, 2, 1, 3)
        k = self.k_proj(x).reshape(b, t, h, dk).transpose(0, 2, 1, 3)
        v = self.v_proj(x).reshape(b, t, h, dk).transpose(0, 2, 1, 3)
        p = self.pos_proj(pos_emb)  # (1, 2T-1, D)

        # The blocked Pallas kernel computes ac+bd with an in-kernel skew so
        # no (B, H, T, 2T-1) tensor is materialised — on TPU the XLA
        # formulation below spends ~4x the rest of attention on the bd term
        # (fwd+bwd 80 -> 31 ms for the 12-layer bench encoder). XLA path
        # kept for short sequences (padding waste) and non-TPU backends.
        use_flash = (
            t >= self.flash_threshold
            and dk % 8 == 0
            and bias is not None
            and jax.default_backend() == "tpu"
            and not _flash_disabled()
        )
        if use_flash:
            from espnet_tpu.ops.pallas_relpos_attention import (
                relpos_flash_attention,
            )

            p_heads = p.reshape(-1, h, dk).transpose(1, 0, 2)  # (H, 2T-1, Dk)
            out = relpos_flash_attention(
                q, k, v, p_heads, self.pos_bias_u, self.pos_bias_v, bias
            )
            return self.out_proj(out.transpose(0, 2, 1, 3).reshape(b, t, d))

        p = p.reshape(1, -1, h, dk).transpose(0, 2, 1, 3)  # (1, H, 2T-1, Dk)
        q_u = q + self.pos_bias_u.astype(q.dtype)[None, :, None, :]
        q_v = q + self.pos_bias_v.astype(q.dtype)[None, :, None, :]
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
        bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, p)  # (B, H, T, 2T-1)
        bd = _rel_shift(bd)
        scores = (ac + bd).astype(jnp.float32) / np.sqrt(dk)
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        weights = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(b, t, d))
