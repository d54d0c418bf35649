"""Convolutional subsampling front blocks.

Behavioral spec: reference `espnet/nets/pytorch_backend/transformer/subsampling.py`
(`Conv2dSubsampling:46` ×4 and its ×2/×6/×8 variants): two (or three) 3x3
stride-2 conv+relu over a (B, 1, T, F) "image", then a linear projection of
the flattened (channels × reduced-freq) axis to d_model.  Length recurrence
per stride-2 valid conv: t -> (t - 1) // 2 (floor((t - 3)/2) + 1).
"""

from __future__ import annotations

import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv_out_len(t, kernel=3, stride=2):
    return (t - kernel) // stride + 1


class TooShortUttError(ValueError):
    """Utterance too short for the subsampling receptive field.

    Mirror of the reference's explicit error
    (`espnet/nets/pytorch_backend/transformer/subsampling.py:14`); without
    it a 0-frame encoder input surfaces as an opaque ZeroDivisionError
    deep in the attention rel-shift."""


def _mono_matmul_default() -> bool:
    """First-conv-as-matmul A/B switch (ESPNET_TPU_SUB_MATMUL=1 enables).

    The first subsampling conv has ONE input channel, so as a convolution
    its contraction depth is k*k*1 = 9 — the MXU runs it at ~2% of peak
    (measured 5.3 ms fwd+bwd of the b32 step for 13 GFLOP). The hypothesis
    that a matmul over the whole frequency axis (contraction k*F = 240,
    structured-sparse expansion of the same 9*C weights) would beat it was
    MEASURED FALSE on v5e: fwd 5.6 vs 5.3 ms, fwd+bwd 21.3 vs 13.6 ms —
    the ~30x nominal-FLOP inflation triples in the backward (dW and
    dPatches are both full-size matmuls), swamping the MXU-utilization
    gain. Kept opt-in for re-evaluation on other geometries; default OFF.
    The parameter tree ("conv0" kernel/bias) is unchanged either way, so
    checkpoints swap freely between the paths.
    """
    return os.environ.get("ESPNET_TPU_SUB_MATMUL", "0") == "1"


class _Conv2dParams(nn.Module):
    """nn.Conv-compatible kernel/bias holder ((k, k, c_in, c_out))."""

    k: int
    c_in: int
    c_out: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.k, self.k, self.c_in, self.c_out), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.c_out,), jnp.float32)


def _mono_conv_matmul(x2: jnp.ndarray, kern: jnp.ndarray, bias: jnp.ndarray,
                      k: int, s: int) -> jnp.ndarray:
    """3x3-style VALID conv over (B, T, F) mono input as one big matmul.

    x2 (B, T, F); kern (k, k, 1, C). Returns (B, T', F', C) with
    T' = (T-k)//s + 1, F' = (F-k)//s + 1. Patches unfold only TIME (k
    strided slices); the frequency-axis convolution is absorbed into a
    (k*F, F'*C) weight that holds each of the k*k*C true parameters at
    its (df, f') offsets and zeros elsewhere — gradients flow back to the
    real (k, k, 1, C) kernel through the scatter construction.
    """
    b, t, f = x2.shape
    c = kern.shape[-1]
    tp = (t - k) // s + 1
    fp = (f - k) // s + 1
    rows = [x2[:, dt:dt + s * (tp - 1) + 1:s, :] for dt in range(k)]
    patches = jnp.concatenate(rows, axis=-1)  # (B, T', k*F)
    fj = jnp.arange(fp)
    wbig = jnp.zeros((k, f, fp, c), kern.dtype)
    for df in range(k):
        wbig = wbig.at[:, s * fj + df, fj, :].set(kern[:, df, 0, :][:, None])
    y = jax.lax.dot_general(
        patches.reshape(b * tp, k * f), wbig.reshape(k * f, fp * c),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return (y.reshape(b, tp, fp, c) + bias.astype(jnp.float32)).astype(
        x2.dtype)


def subsampled_length(lengths: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Output lengths after Conv2dSubsampling with total reduction `factor`."""
    out = lengths
    if factor == 2:
        out = _conv_out_len(_conv_out_len(out, 3, 2), 3, 1)
    elif factor == 4:
        out = _conv_out_len(_conv_out_len(out, 3, 2), 3, 2)
    elif factor == 6:
        out = _conv_out_len(_conv_out_len(out, 3, 2), 5, 3)
    elif factor == 8:
        out = _conv_out_len(_conv_out_len(_conv_out_len(out, 3, 2), 3, 2), 3, 2)
    else:
        raise ValueError(f"unsupported subsampling factor {factor}")
    return out


class Conv2dSubsampling(nn.Module):
    """(B, T, F) features -> (B, T', d_model), T' ≈ T/factor."""

    d_model: int
    factor: int = 4  # one of {2, 4, 6, 8}
    channels: int = None  # defaults to d_model
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.channels or self.d_model
        x = x[..., None]  # (B, T, F, C=1) — NHWC for lax conv
        if self.factor == 2:
            convs = [(3, 2), (3, 1)]
        elif self.factor == 4:
            convs = [(3, 2), (3, 2)]
        elif self.factor == 6:
            convs = [(3, 2), (5, 3)]
        elif self.factor == 8:
            convs = [(3, 2), (3, 2), (3, 2)]
        else:
            raise ValueError(f"unsupported subsampling factor {self.factor}")
        t_out = x.shape[1]
        for k_, s_ in convs:
            t_out = _conv_out_len(t_out, k_, s_)
        if t_out < 1:
            raise TooShortUttError(
                f"input of {x.shape[1]} frames is too short for "
                f"subsampling x{self.factor} (needs at least "
                f"{7 if self.factor in (4, 2) else 11})")
        freq = x.shape[2]
        for i, (k, s) in enumerate(convs):
            if (i == 0 and x.shape[-1] == 1 and _mono_matmul_default()
                    and jax.default_backend() == "tpu"):
                p = _Conv2dParams(k, 1, c, name=f"conv{i}")
                x = _mono_conv_matmul(
                    x[..., 0], p.kernel.astype(self.dtype),
                    p.bias, k, s)
            else:
                x = nn.Conv(
                    c, (k, k), strides=(s, s), padding="VALID",
                    dtype=self.dtype, name=f"conv{i}",
                )(x)
            x = nn.relu(x)
            freq = _conv_out_len(freq, k, s)
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, freq * c)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="out")(x)
        return x, subsampled_length(lengths, self.factor)
