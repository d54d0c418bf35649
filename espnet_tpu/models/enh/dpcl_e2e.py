"""DPCL-E2E separator: deep clustering + soft k-means + enhancement stage.

Behavioral spec: reference `espnet2/enh/separator/dpcl_e2e_separator.py:11`
(DPCLE2ESeparator; Isik et al. 2016): BLSTM -> per-TF-bin embeddings V ->
soft k-means over the embeddings (hardness alpha) -> cluster masks ->
concat(masked sources, mixture) -> enhancement BLSTM -> softmax masks on
the input spectrum.

TPU-first deviations (documented):
* the reference iterates k-means until `||c_new - c||^2 < threshold` (up to
  500 steps) — data-dependent loop bounds don't fit reverse-mode autodiff
  under jit, so the soft k-means runs a FIXED `kmeans_iters` steps as a
  `lax.scan` (differentiable, static shape). A handful of iterations is
  where the reference's loop converges on real features anyway.
* the reference computes the cluster distance as `sum(V - c**2)` — an
  operator-precedence slip for `sum((V - c)**2)`; the correct squared
  Euclidean distance is used here.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DPCLE2ESeparator(nn.Module):
    """Input: features (B, T, N) — with `complex_pairs=True` N = 2F
    real||imag STFT pairs (magnitude feeds the nets, final masks apply to
    both parts). Output: (masked (B, num_spk, T, N), lens, others)."""

    input_dim: int
    num_spk: int = 2
    predict_noise: bool = False
    nonlinear: str = "tanh"
    layers: int = 2
    unit: int = 512
    emb_dim: int = 40
    alpha: float = 5.0
    kmeans_iters: int = 10
    complex_pairs: bool = False
    dtype: Any = jnp.float32

    def _blstm(self, x, layers, name):
        for li in range(layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.unit, dtype=self.dtype),
                         name=f"{name}{li}_fwd")(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.unit, dtype=self.dtype),
                         reverse=True, keep_order=True,
                         name=f"{name}{li}_bwd")(x)
            x = nn.Dense(self.unit, dtype=self.dtype, name=f"{name}{li}_proj")(
                jnp.concatenate([fwd, bwd], axis=-1))
            x = nn.tanh(x)
        return x

    @nn.compact
    def __call__(self, feat, lengths, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
        b, t, n = feat.shape
        if self.complex_pairs:
            f = n // 2
            re, im = feat[..., :f], feat[..., f:]
            feature = jnp.sqrt(re**2 + im**2 + 1e-8)
        else:
            f = n
            feature = feat
        k = self.num_spk + 1 if self.predict_noise else self.num_spk

        # ---- stage 1: embeddings ----
        x = self._blstm(feature, self.layers, "blstm")
        x = nn.Dense(f * self.emb_dim, dtype=self.dtype, name="emb")(x)
        x = {"sigmoid": nn.sigmoid, "relu": nn.relu, "tanh": nn.tanh}[
            self.nonlinear](x)
        v = x.reshape(b, t * f, self.emb_dim)

        # ---- soft k-means (fixed-iteration scan) ----
        centers0 = v[:, :k, :]

        def step(centers, _):
            d = jnp.sum(
                (v[:, :, None, :] - centers[:, None, :, :]) ** 2, axis=-1
            )  # (B, TF, K)
            gamma = jax.nn.softmax(-self.alpha * d, axis=-1)
            w = jnp.sum(gamma, axis=1)[:, :, None]  # (B, K, 1)
            new_centers = jnp.einsum("bnk,bnd->bkd", gamma, v) / (w + 1e-8)
            return new_centers, gamma

        centers, gammas = jax.lax.scan(
            step, centers0, None, length=self.kmeans_iters)
        gamma = gammas[-1]  # (B, TF, K)
        masks = gamma.reshape(b, t, f, k)

        # ---- stage 2: enhancement BLSTM over [masked sources, mixture] ----
        masked_feats = feature[..., None] * masks  # (B, T, F, K)
        cat = jnp.concatenate(
            [masked_feats.transpose(0, 1, 3, 2).reshape(b, t, k * f), feature],
            axis=-1,
        )
        h = self._blstm(cat, 1, "enh_blstm")
        z = nn.Dense(f * k, dtype=self.dtype, name="enh_out")(h)
        z = z.reshape(b, t, f, k)
        enh_masks = jax.nn.softmax(z, axis=-1)

        def apply_mask(m):  # m: (B, T, F) -> same layout as feat
            if self.complex_pairs:
                return jnp.concatenate([re * m, im * m], axis=-1)
            return feature * m

        outs = [apply_mask(enh_masks[..., i]) for i in range(k)]
        others: Dict[str, jnp.ndarray] = {}
        for i in range(self.num_spk):
            others[f"mask_spk{i + 1}"] = enh_masks[..., i]
        if self.predict_noise:
            others["noise1"] = outs[-1]
            outs = outs[: self.num_spk]
        masked = jnp.stack(outs, axis=1)  # (B, num_spk, T, N)
        return masked, lengths, others
