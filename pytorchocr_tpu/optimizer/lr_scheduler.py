"""Iteration-granular LR schedules with linear/constant warmup
(reference pytocr/optimizer/lr_scheduler.py:11-113).

Pure step->lr functions built on jnp so they trace inside the jitted train
step (optax schedule contract)."""

import jax.numpy as jnp

__all__ = ["WarmupMultiStepLR", "WarmupPolyLR", "WarmupCosineLR"]


def _warmup_factor(step, warmup_iters, warmup_factor, warmup_method):
    if warmup_method == "constant":
        return jnp.asarray(warmup_factor, jnp.float32)
    if warmup_method == "linear":
        alpha = step / jnp.maximum(warmup_iters, 1)
        return warmup_factor * (1 - alpha) + alpha
    raise ValueError("Only 'constant' or 'linear' warmup_method accepted")


def WarmupMultiStepLR(
    base_lr,
    milestones,
    gamma=0.1,
    warmup_factor=1.0 / 3,
    warmup_iters=500,
    warmup_method="linear",
    **kwargs
):
    milestones = list(milestones)
    if milestones != sorted(milestones):
        raise ValueError("Milestones should be a list of increasing integers.")
    ms = jnp.asarray(milestones, jnp.float32) if milestones else None

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        f = jnp.where(
            step < warmup_iters,
            _warmup_factor(step, warmup_iters, warmup_factor, warmup_method),
            1.0,
        )
        decays = jnp.sum(step >= ms) if ms is not None else 0
        return base_lr * f * gamma ** decays

    return schedule


def WarmupPolyLR(
    base_lr,
    target_lr=0,
    max_iters=0,
    power=0.9,
    warmup_factor=1.0 / 3,
    warmup_iters=500,
    warmup_method="linear",
    **kwargs
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        f = _warmup_factor(step, warmup_iters, warmup_factor, warmup_method)
        warm = target_lr + (base_lr - target_lr) * f
        N = jnp.maximum(max_iters - warmup_iters, 1)
        T = jnp.clip(step - warmup_iters, 0, N)
        factor = (1 - T / N) ** power
        poly = target_lr + (base_lr - target_lr) * factor
        return jnp.where(step < warmup_iters, warm, poly)

    return schedule


def WarmupCosineLR(
    base_lr,
    T_max_iters,
    eta_min=0,
    warmup_factor=1.0 / 3,
    warmup_iters=500,
    warmup_method="linear",
    **kwargs
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        f = _warmup_factor(step, warmup_iters, warmup_factor, warmup_method)
        warm = base_lr * f
        T = jnp.mod(step - warmup_iters, 2 * T_max_iters)
        cos = eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * T / T_max_iters)
        ) / 2
        return jnp.where(step < warmup_iters, warm, cos)

    return schedule
