"""TPU-cheap dropout.

`flax.linen.Dropout` draws a float32 uniform per element and keeps the mask
in float32 — on the bench conformer the (B*T, d_ff) FFN intermediates make
that ~14 ms/step of RNG + mask traffic (measured: dropout on/off =
93.5 -> 79 ms on a v5e). `FastDropout` draws uint8 random bits instead
(4x fewer RNG bits, 4x less mask traffic) and quantizes the drop rate to
1/256 steps (0.1 -> 26/256 ~ 0.1016) — an approximation with no measurable
training effect at typical rates, documented here because it is one.

Same API surface as nn.Dropout for the call sites we use: rate attribute,
`deterministic` kwarg, 'dropout' rng collection.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastDropout(nn.Module):
    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        q = max(1, min(255, round(self.rate * 256)))
        rng = self.make_rng(self.rng_collection)
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
        keep = bits >= q
        scale = jnp.asarray(256.0 / (256 - q), x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))
