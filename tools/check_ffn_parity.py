"""TPU-side parity + speed check of the fused FFN Pallas kernel.

Forward and all five gradients vs the unfused XLA reference, in f32 AND
bf16 (the dtype training actually uses), at the bench model's FFN shape;
then a timed fwd+bwd comparison of fused vs unfused at bf16.  The CPU
test suite covers only the interpret path — run this after kernel changes.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from espnet_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    from espnet_tpu.ops.pallas_ffn import ffn_reference, fused_ffn

    rng = np.random.RandomState(0)
    m, d, dff = 15008, 256, 2048  # bench conformer: B=32 x T'=469
    x0 = rng.randn(m, d).astype(np.float32) * 0.5
    k10 = rng.randn(d, dff).astype(np.float32) * 0.05
    b10 = rng.randn(dff).astype(np.float32) * 0.1
    k20 = rng.randn(dff, d).astype(np.float32) * 0.05
    b20 = rng.randn(d).astype(np.float32) * 0.1
    w = jnp.asarray(rng.randn(m, d).astype(np.float32))

    ok = True
    # f32 tolerance reflects DEFAULT MXU precision (single-pass bf16) used
    # by BOTH formulations; the comparison isolates kernel bugs, not
    # accumulation depth.
    for dtype, ftol, gtol in [(jnp.float32, 1e-3, 2e-3),
                              (jnp.bfloat16, 3e-2, 5e-2)]:
        x = jnp.asarray(x0).astype(dtype)
        k1 = jnp.asarray(k10).astype(dtype)
        k2 = jnp.asarray(k20).astype(dtype)
        b1, b2 = jnp.asarray(b10), jnp.asarray(b20)

        def loss(fn, x, k1, b1, k2, b2):
            y = fn(x, k1, b1, k2, b2)
            return jnp.sum(y.astype(jnp.float32) * w)

        f_fused = lambda *a: fused_ffn(*a, activation="swish",
                                       interpret=False)
        f_ref = lambda *a: ffn_reference(*a, activation="swish")
        gf = jax.jit(jax.grad(lambda *a: loss(f_fused, *a),
                              argnums=(0, 1, 2, 3, 4)))(x, k1, b1, k2, b2)
        gr = jax.jit(jax.grad(lambda *a: loss(f_ref, *a),
                              argnums=(0, 1, 2, 3, 4)))(x, k1, b1, k2, b2)
        yf = f_fused(x, k1, b1, k2, b2).astype(jnp.float32)
        yr = f_ref(x, k1, b1, k2, b2).astype(jnp.float32)
        ferr = float(jnp.max(jnp.abs(yf - yr)) / jnp.max(jnp.abs(yr)))
        print(f"{np.dtype(dtype).name}: fwd relerr {ferr:.2e}")
        ok = ok and ferr < ftol
        for n, a_, b_ in zip(["dx", "dk1", "db1", "dk2", "db2"], gf, gr):
            a_ = jnp.asarray(a_, jnp.float32)
            b_ = jnp.asarray(b_, jnp.float32)
            e = float(jnp.max(jnp.abs(a_ - b_)) /
                      jnp.maximum(jnp.max(jnp.abs(b_)), 1.0))
            print(f"  {n}: relerr {e:.2e}")
            ok = ok and e < gtol

    # dropout-on smoke on device: fwd/bwd mask agreement (grad exactly 0
    # where the forward output contribution was dropped is checked on CPU;
    # here just check determinism + rate)
    x = jnp.asarray(x0).astype(jnp.bfloat16)
    k1 = jnp.asarray(k10).astype(jnp.bfloat16)
    k2 = jnp.asarray(k20).astype(jnp.bfloat16)
    b1, b2 = jnp.asarray(b10), jnp.asarray(b20)
    seed = jnp.array([5], jnp.int32)
    dfn = jax.jit(lambda s: fused_ffn(x, k1, b1, jnp.zeros_like(k2),
                                      jnp.zeros_like(b2), s, drop_rate=0.1,
                                      interpret=False))
    y1, y2 = dfn(seed), dfn(seed)
    same = bool(jnp.all(y1 == y2))
    print(f"dropout determinism: {same}")
    ok = ok and same

    # --- timing: 24-layer-equivalent fwd+bwd chain, bf16 ---
    def chain(fn):
        def run(x, k1, b1, k2, b2):
            def body(c, _):
                return fn(c, k1, b1, k2, b2), None
            y, _ = jax.lax.scan(body, x, None, length=24)
            return jnp.sum(y.astype(jnp.float32) * w)
        return jax.jit(jax.grad(run, argnums=(0, 1, 2, 3, 4)))

    for name, fn in [("fused", f_fused), ("xla", f_ref)]:
        g = chain(fn)
        r = g(x, k1, b1, k2, b2)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = g(x, k1, b1, k2, b2)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 10
        flops = 24 * 6 * 2 * m * d * dff  # 6 GEMM-equivalents per layer
        print(f"{name}: 24-layer fwd+bwd {dt*1e3:.2f} ms "
              f"({flops/dt/1e12:.1f} TFLOP/s eff)")

    ok = check_prenorm() and ok
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)


def check_prenorm():
    """On-device parity of fused_prenorm_ffn (f32 + bf16) vs the XLA ref."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.ops.pallas_ffn import (
        fused_prenorm_ffn, prenorm_ffn_reference)

    rng = np.random.RandomState(1)
    m, d, dff = 15008, 256, 2048
    lns0 = 1 + 0.1 * rng.randn(d)
    lnb0 = 0.1 * rng.randn(d)
    x0 = rng.randn(m, d).astype(np.float32) * 0.5
    k10 = rng.randn(d, dff).astype(np.float32) * 0.05
    b10 = 0.1 * rng.randn(dff)
    k20 = rng.randn(dff, d).astype(np.float32) * 0.05
    b20 = 0.1 * rng.randn(d)
    w = jnp.asarray(rng.randn(m, d).astype(np.float32))
    ok = True
    for dtype, ftol, gtol in [(jnp.float32, 1e-3, 3e-3),
                              (jnp.bfloat16, 3e-2, 6e-2)]:
        x = jnp.asarray(x0).astype(dtype)
        args = (jnp.asarray(lns0, jnp.float32), jnp.asarray(lnb0, jnp.float32),
                jnp.asarray(k10).astype(dtype), jnp.asarray(b10, jnp.float32),
                jnp.asarray(k20).astype(dtype), jnp.asarray(b20, jnp.float32))

        def loss(fn, x, *a):
            return jnp.sum(fn(x, *a).astype(jnp.float32) * w)

        ff = lambda x, *a: fused_prenorm_ffn(x, *a, residual_scale=0.5,
                                             interpret=False)
        fr = lambda x, *a: prenorm_ffn_reference(x, *a, residual_scale=0.5)
        gf = jax.jit(jax.grad(lambda *a: loss(ff, *a),
                              argnums=tuple(range(7))))(x, *args)
        gr = jax.jit(jax.grad(lambda *a: loss(fr, *a),
                              argnums=tuple(range(7))))(x, *args)
        yf = ff(x, *args).astype(jnp.float32)
        yr = fr(x, *args).astype(jnp.float32)
        e = float(jnp.max(jnp.abs(yf - yr)) / jnp.max(jnp.abs(yr)))
        print(f"prenorm {np.dtype(dtype).name}: fwd relerr {e:.2e}")
        ok = ok and e < ftol
        for n, a_, b_ in zip(["dx", "dlns", "dlnb", "dk1", "db1", "dk2",
                              "db2"], gf, gr):
            a_ = jnp.asarray(a_, jnp.float32)
            b_ = jnp.asarray(b_, jnp.float32)
            er = float(jnp.max(jnp.abs(a_ - b_))
                       / jnp.maximum(jnp.max(jnp.abs(b_)), 1.0))
            print(f"  {n}: relerr {er:.2e}")
            ok = ok and er < gtol
    return ok


if __name__ == "__main__":
    main()
