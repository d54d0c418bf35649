"""S4D: diagonal state-space sequence layer (kernel + recurrence).

Behavioral spec: reference `espnet2/asr/state_spaces/s4.py` (full S4 with a
CUDA/pykeops Cauchy kernel, `state_spaces/cauchy.py`). This build uses the
S4D diagonalisation (Gu et al., "On the Parameterization and Initialization
of Diagonal State Space Models") — the reference's own `s4.py` includes the
diag mode; the CUDA Cauchy kernel becomes a plain Vandermonde einsum on the
MXU (SURVEY §2.6 replacement plan).

Two execution modes over the same parameters:
* convolution (training): y = causal_conv(u, K), K from the Vandermonde of
  exp(dt*A) powers — one FFT-free einsum per layer;
* recurrence (decoding): x_t = Abar x_{t-1} + Bbar u_t, y_t = 2Re(C x_t).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def s4d_init(h: int, n: int, dt_min=1e-3, dt_max=1e-1, seed: int = 0):
    """S4D-Lin initialisation: A = -1/2 + i*pi*k, log-uniform dt."""
    rng = np.random.RandomState(seed)
    a_re = -0.5 * np.ones((h, n // 2), np.float32)
    a_im = np.pi * np.arange(n // 2, dtype=np.float32)[None, :].repeat(h, 0)
    log_dt = rng.uniform(np.log(dt_min), np.log(dt_max), (h,)).astype(
        np.float32
    )
    return a_re, a_im, log_dt


class S4DLayer(nn.Module):
    """Per-channel diagonal SSM applied along time (B, T, H)."""

    d_model: int
    state_dim: int = 64          # N (complex pairs: N/2 modes)
    dt_min: float = 1e-3
    dt_max: float = 1e-1
    dtype: Any = jnp.float32

    def setup(self):
        h, n2 = self.d_model, self.state_dim // 2
        a_re0, a_im0, log_dt0 = s4d_init(h, self.state_dim,
                                         self.dt_min, self.dt_max)
        # log-parameterised negative real part keeps the system stable
        self.log_neg_a_re = self.param(
            "log_neg_a_re", lambda k: jnp.log(-jnp.asarray(a_re0)))
        self.a_im = self.param("a_im", lambda k: jnp.asarray(a_im0))
        self.log_dt = self.param("log_dt", lambda k: jnp.asarray(log_dt0))
        self.c_re = self.param("c_re", nn.initializers.normal(0.5), (h, n2))
        self.c_im = self.param("c_im", nn.initializers.normal(0.5), (h, n2))
        self.d = self.param("d", nn.initializers.ones, (h,))

    def _discretize(self):
        dt = jnp.exp(self.log_dt)[:, None]                  # (H, 1)
        a = -jnp.exp(self.log_neg_a_re) + 1j * self.a_im    # (H, N2)
        abar = jnp.exp(dt * a)
        bbar = (abar - 1.0) / a                             # ZOH, B = 1
        c = self.c_re + 1j * self.c_im
        return abar, bbar, c

    def kernel(self, length: int) -> jnp.ndarray:
        """(H, L) causal convolution kernel (Vandermonde over Abar powers)."""
        abar, bbar, c = self._discretize()
        # K[h, l] = 2 Re sum_n c[h,n] bbar[h,n] abar[h,n]^l
        log_abar = jnp.log(abar)                            # (H, N2)
        powers = jnp.exp(
            log_abar[:, :, None] * jnp.arange(length)[None, None, :]
        )                                                   # (H, N2, L)
        k = 2.0 * jnp.real(jnp.einsum("hn,hn,hnl->hl", c, bbar, powers))
        return k.astype(self.dtype)

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        """Causal SSM convolution: u (B, T, H) -> y (B, T, H)."""
        k = self.kernel(u.shape[1])                         # (H, T)
        y = self._causal_conv(u, k)
        return y + u * self.d[None, None, :]

    def _causal_conv(self, u, k):
        # grouped conv: kernel (W, 1, H); lax cross-correlates, so reverse
        t = u.shape[1]
        kern = k.T[::-1][:, None, :]                        # (T, 1, H)
        return jax.lax.conv_general_dilated(
            u.astype(jnp.float32), kern.astype(jnp.float32),
            window_strides=(1,), padding=[(t - 1, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.d_model,
        ).astype(u.dtype)

    # --- recurrence (one step) -------------------------------------------
    def init_state(self, batch: int):
        return jnp.zeros((batch, self.d_model, self.state_dim // 2),
                         jnp.complex64)

    def step(self, state, u_t):
        """state (B, H, N2) complex; u_t (B, H) -> (y_t, new state)."""
        abar, bbar, c = self._discretize()
        new_state = state * abar[None] + bbar[None] * u_t[..., None]
        y = 2.0 * jnp.real(jnp.einsum("bhn,hn->bh", new_state, c))
        return y.astype(u_t.dtype) + u_t * self.d[None, :], new_state
