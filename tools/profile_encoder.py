"""Module-level timing inside the conformer block: attention vs FFN vs conv.

Times fwd and fwd+bwd of 12x each sub-module on the bench shapes
(B=32, T=469 subsampled, D=256) so the encoder's 74 ms fwd+bwd can be
attributed. Also A/Bs the Pallas rel-pos kernel vs the XLA formulation.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=20, name=""):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(leaf.reshape(-1)[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(leaf.reshape(-1)[0]))
    per = (time.perf_counter() - t0) / n
    print(f"# {name:32s} compile {compile_s:6.1f}s  run {per * 1e3:8.2f} ms",
          file=sys.stderr, flush=True)
    return per


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.attention import RelPositionMultiHeadAttention
    from espnet_tpu.models.conformer import ConformerBlock, ConvolutionModule
    from espnet_tpu.models.embedding import rel_position_encoding
    from espnet_tpu.models.transformer import PositionwiseFeedForward
    from espnet_tpu.ops.masks import attention_bias, make_valid_mask

    b, t, d, h, dff = 32, 469, 256, 4, 2048
    layers = 12
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32), dtype)
    lens = jnp.full((b,), t, jnp.int32)
    pad_mask = make_valid_mask(lens, t)
    bias = attention_bias(pad_mask[:, None, None, :])
    pos_emb = rel_position_encoding(t, d, dtype)
    key = jax.random.key(0, impl="rbg")
    results = {}

    def stack(mod_fn, call):
        """Build a 12x module stack as one flax module."""

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x, deterministic=True):
                for i in range(layers):
                    x = call(mod_fn(f"m{i}"), x, deterministic)
                return x

        return Stack()

    cases = {
        "ffn": stack(
            lambda nm: PositionwiseFeedForward(d, dff, 0.1, activation="swish",
                                               dtype=dtype, name=nm),
            lambda m, x, det: x + m(x, det)),
        "attn": stack(
            lambda nm: RelPositionMultiHeadAttention(h, d, dtype, name=nm),
            lambda m, x, det: x + m(x, pos_emb, bias)),
        "conv": stack(
            lambda nm: ConvolutionModule(d, 31, "layer", dtype, name=nm),
            lambda m, x, det: x + m(x, pad_mask, det)),
        "block": stack(
            lambda nm: ConformerBlock(d, h, dff, 31, 0.1, "layer", dtype,
                                      name=nm),
            lambda m, x, det: x + m(x, pos_emb, bias, pad_mask, det)),
    }
    if os.environ.get("ESPNET_TPU_DISABLE_FLASH"):
        cases = {f"{k}_noflash": v for k, v in cases.items()}

    for name, model in cases.items():
        params = nn.meta.unbox(
            jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"])

        @jax.jit
        def fwd(p, x, key):
            return model.apply({"params": p}, x, False,
                               rngs={"dropout": key})

        @jax.jit
        def grad(p, x, key):
            def loss(p, x):
                o = model.apply({"params": p}, x, False,
                                rngs={"dropout": key})
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))(p, x)

        results[f"{name}_fwd"] = timeit(fwd, (params, x, key), 20,
                                        f"12x {name} fwd")
        results[f"{name}_fwd_bwd"] = timeit(grad, (params, x, key), 20,
                                            f"12x {name} fwd+bwd")

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
