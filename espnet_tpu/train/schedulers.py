"""LR schedules as optax-compatible callables.

Behavioral spec: reference `espnet2/schedulers/noam_lr.py:12` (NoamLR:
lr * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5) — the classic
"Attention is all you need" schedule normalised so peak ≈ lr at
step = warmup) and `warmup_lr.py:11` (WarmupLR: same without the d_model
factor, lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)).
"""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(base_lr: float, d_model: int, warmup_steps: int = 25000):
    def fn(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return (
            base_lr
            * d_model ** -0.5
            * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        )

    return fn


def warmup_schedule(base_lr: float, warmup_steps: int = 25000):
    def fn(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return (
            base_lr
            * warmup_steps ** 0.5
            * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        )

    return fn


def constant_schedule(base_lr: float):
    def fn(step):
        return jnp.asarray(base_lr, jnp.float32)

    return fn


def exponential_decay_schedule(base_lr: float, decay_rate: float,
                               decay_steps: int):
    def fn(step):
        return base_lr * decay_rate ** (step.astype(jnp.float32) / decay_steps)

    return fn


def build_schedule(name: str, base_lr: float, **kw):
    if name == "noam":
        return noam_schedule(base_lr, kw.get("d_model", 256),
                             kw.get("warmup_steps", 25000))
    if name == "warmuplr":
        return warmup_schedule(base_lr, kw.get("warmup_steps", 25000))
    if name == "constant" or name is None:
        return constant_schedule(base_lr)
    if name == "exponential":
        return exponential_decay_schedule(
            base_lr, kw.get("decay_rate", 0.96), kw.get("decay_steps", 10000)
        )
    raise ValueError(f"unknown schedule {name}")
