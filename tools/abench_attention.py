"""A/B microbenchmark for the rel-pos Pallas attention kernel.

Times 12 chained kernel invocations (matching the 12-layer encoder) fwd
and fwd+bwd on the bench shapes, so kernel variants can be compared
without re-running the full train step. Env knobs under test:
ESPNET_TPU_RELPOS_SKEW, ESPNET_TPU_ATTN_FOLD, ESPNET_TPU_RELPOS_BLOCK.

Usage: python tools/abench_attention.py [--t 469] [--n 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--t", type=int, default=469)
    ap.add_argument("--h", type=int, default=4)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--layers", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from espnet_tpu.ops.pallas_relpos_attention import relpos_flash_attention

    b, t, h, d = args.b, args.t, args.h, args.d
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2,
                                jnp.bfloat16)
    q = mk(b, h, t, d)
    k = mk(b, h, t, d)
    v = mk(b, h, t, d)
    p = mk(h, 2 * t - 1, d)
    u = jnp.asarray(rng.randn(h, d).astype(np.float32) * 0.2)
    vb = jnp.asarray(rng.randn(h, d).astype(np.float32) * 0.2)

    L = args.layers

    @jax.jit
    def fwd(q, k, v, p, u, vb):
        o = q
        for _ in range(L):
            o = relpos_flash_attention(o, k, v, p, u, vb)
        return jnp.sum(o.astype(jnp.float32))

    grad = jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3, 4, 5)))

    def timeit(fn, fargs, name):
        t0 = time.perf_counter()
        out = fn(*fargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(leaf.reshape(-1)[0]))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.n):
            out = fn(*fargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(leaf.reshape(-1)[0]))
        per = (time.perf_counter() - t0) / args.n
        print(f"# {name:14s} compile {comp:6.1f}s  run {per * 1e3:7.2f} ms",
              file=sys.stderr, flush=True)
        return per

    fargs = (q, k, v, p, u, vb)
    timeit(fwd, fargs, f"{L}x kernel fwd")
    timeit(grad, fargs, f"{L}x fwd+bwd")


if __name__ == "__main__":
    main()
