"""TPU-side parity check of the Pallas rel-pos kernel vs the XLA oracle.

Runs forward AND gradients (q, k, v, p, u, vb) through both formulations
on the real device and prints max abs errors. Use after any kernel change;
the CPU test suite only exercises the interpret path, which bypasses the
Mosaic roll lowerings this checks.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from espnet_tpu.ops.pallas_relpos_attention import (
        relpos_attention_reference, relpos_flash_attention)

    for (b, t, h, d) in [(3, 469, 4, 64), (2, 1200, 4, 64)]:
        rng = np.random.RandomState(0)
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
        q, k, v = mk(b, h, t, d), mk(b, h, t, d), mk(b, h, t, d)
        p = mk(h, 2 * t - 1, d)
        u, vb = mk(h, d), mk(h, d)
        lens = np.full((b,), t)
        lens[0] = t - 37
        bias = np.zeros((b, 1, 1, t), np.float32)
        for i, L in enumerate(lens):
            bias[i, :, :, L:] = -1e30
        bias = jnp.asarray(bias)

        def loss_flash(q, k, v, p, u, vb):
            o = relpos_flash_attention(q, k, v, p, u, vb, bias,
                                       interpret=False)
            w = jnp.cos(jnp.arange(o.size, dtype=jnp.float32)).reshape(o.shape)
            mask = (jnp.arange(t)[None, None, :, None]
                    < jnp.asarray(lens)[:, None, None, None])
            return jnp.sum(o * w * mask)

        def loss_ref(q, k, v, p, u, vb):
            o = relpos_attention_reference(q, k, v, p, u, vb, bias)
            w = jnp.cos(jnp.arange(o.size, dtype=jnp.float32)).reshape(o.shape)
            mask = (jnp.arange(t)[None, None, :, None]
                    < jnp.asarray(lens)[:, None, None, None])
            return jnp.sum(o * w * mask)

        args = (q, k, v, p, u, vb)
        gf = jax.jit(jax.grad(loss_flash, argnums=tuple(range(6))))(*args)
        gr = jax.jit(jax.grad(loss_ref, argnums=tuple(range(6))))(*args)
        of = relpos_flash_attention(*args, bias, interpret=False)
        orf = relpos_attention_reference(*args, bias)
        mask = (np.arange(t)[None, None, :, None] < lens[:, None, None, None])
        oerr = float(jnp.max(jnp.abs((of - orf) * mask)))
        print(f"shapes b{b} t{t}: fwd maxerr {oerr:.2e}")
        names = ["dq", "dk", "dv", "dp", "du", "dvb"]
        ok = oerr < 2e-4
        for n, a_, b_ in zip(names, gf, gr):
            e = float(jnp.max(jnp.abs(a_ - b_)))
            r = float(jnp.max(jnp.abs(b_)))
            print(f"  {n}: maxerr {e:.2e} (ref absmax {r:.1f})")
            ok = ok and e < 2e-3 * max(r, 1.0)
        if not ok:
            print("PARITY FAIL")
            sys.exit(1)

    # bf16 case (the dtype training actually uses: bf16 q/k/v/p inputs,
    # bf16 dq/dk/dv outputs) at looser, bf16-appropriate tolerances.
    b, t, h, d = 3, 469, 4, 64
    rng = np.random.RandomState(1)
    mk16 = lambda *s: jnp.asarray(
        rng.randn(*s).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    q, k, v = mk16(b, h, t, d), mk16(b, h, t, d), mk16(b, h, t, d)
    p = mk16(h, 2 * t - 1, d)
    u, vb = mk16(h, d), mk16(h, d)
    lens = np.full((b,), t)
    lens[0] = t - 37
    bias = np.zeros((b, 1, 1, t), np.float32)
    for i, L in enumerate(lens):
        bias[i, :, :, L:] = -1e30
    bias = jnp.asarray(bias)
    mask = (jnp.arange(t)[None, None, :, None]
            < jnp.asarray(lens)[:, None, None, None])
    w = jnp.cos(jnp.arange(b * h * t * d, dtype=jnp.float32)).reshape(
        (b, h, t, d))

    def loss16(fn, *args):
        o = fn(*args, bias).astype(jnp.float32)
        return jnp.sum(o * w * mask)

    from espnet_tpu.ops.pallas_relpos_attention import (
        relpos_attention_reference, relpos_flash_attention)
    args = (q, k, v, p, u, vb)
    gf = jax.jit(jax.grad(
        lambda *a: loss16(
            lambda *x: relpos_flash_attention(*x, interpret=False), *a),
        argnums=tuple(range(6))))(*args)
    gr = jax.jit(jax.grad(
        lambda *a: loss16(relpos_attention_reference, *a),
        argnums=tuple(range(6))))(*args)
    of = relpos_flash_attention(*args, bias, interpret=False).astype(
        jnp.float32)
    orf = relpos_attention_reference(*args, bias).astype(jnp.float32)
    oerr = float(jnp.max(jnp.abs((of - orf) * mask)))
    print(f"bf16 b{b} t{t}: fwd maxerr {oerr:.2e}")
    ok = oerr < 3e-2
    for n, a_, b_ in zip(["dq", "dk", "dv", "dp", "du", "dvb"], gf, gr):
        a_ = jnp.asarray(a_, jnp.float32)
        b_ = jnp.asarray(b_, jnp.float32)
        e = float(jnp.max(jnp.abs(a_ - b_)))
        r = float(jnp.max(jnp.abs(b_)))
        print(f"  {n}: maxerr {e:.2e} (ref absmax {r:.1f})")
        ok = ok and e < 2e-2 * max(r, 1.0)
    if not ok:
        print("PARITY FAIL")
        sys.exit(1)
    print("PARITY OK")


if __name__ == "__main__":
    main()
