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

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _masked_scale(x, key, q: int):
    bits = jax.random.bits(key, x.shape, dtype=jnp.uint8)
    scale = jnp.asarray(256.0 / (256 - q), x.dtype)
    return jnp.where(bits >= q, x * scale, jnp.zeros_like(x))


def _masked_scale_fwd(x, key, q):
    # residual is just the KEY: the mask is regenerated in the backward
    # pass instead of stored. With the rbg generator bits are nearly free
    # to redraw, while a stored (B*T, d_ff) mask is ~30 MB of HBM
    # write+read per FFN that autodiff would otherwise carry.
    return _masked_scale(x, key, q), key


def _masked_scale_bwd(q, key, g):
    bits = jax.random.bits(key, g.shape, dtype=jnp.uint8)
    scale = jnp.asarray(256.0 / (256 - q), g.dtype)
    return (jnp.where(bits >= q, g * scale, jnp.zeros_like(g)), None)


_masked_scale.defvjp(_masked_scale_fwd, _masked_scale_bwd)


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
        return _masked_scale(x, rng, q)
