"""Optimizer + LR schedule construction.

Parity target: cubercnn/solver/build.py — per-param groups (no weight decay
on prior parameters, :44-45), sgd/adam/adamw(+amsgrad) selection (:49-64),
optional gradient clipping, WarmupMultiStepLR.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def warmup_multistep_schedule(base_lr, steps, gamma, warmup_iters, warmup_factor):
    """detectron2 WarmupMultiStepLR: linear warmup then step decays."""

    def schedule(count):
        warm = jnp.clip(count / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        factor = warmup_factor * (1 - warm) + warm
        milestone = jnp.zeros((), jnp.float32)
        for s in steps:
            milestone = milestone + (count >= s)
        return base_lr * factor * (gamma**milestone)

    return schedule


def _no_decay_mask(params):
    """Weight-decay mask: skip priors buffers (solver/build.py:44-45)."""

    def mask_fn(path, _):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        return "priors" not in name

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_optimizer(cfg, params):
    s = cfg.solver
    schedule = warmup_multistep_schedule(
        s.base_lr, s.steps, s.gamma, s.warmup_iters, s.warmup_factor
    )
    wd_mask = _no_decay_mask(params)

    parts = []
    if s.clip_gradients > 0:
        parts.append(optax.clip_by_global_norm(s.clip_gradients))

    opt_type = s.type.lower()
    if opt_type == "sgd":
        if s.weight_decay > 0:
            parts.append(optax.add_decayed_weights(s.weight_decay, mask=wd_mask))
        parts.append(optax.sgd(learning_rate=schedule, momentum=s.momentum))
    elif opt_type in ("adam", "adam+amsgrad"):
        if s.weight_decay > 0:
            parts.append(optax.add_decayed_weights(s.weight_decay, mask=wd_mask))
        parts.append(optax.adam(learning_rate=schedule))
    elif opt_type in ("adamw", "adamw+amsgrad"):
        parts.append(
            optax.adamw(learning_rate=schedule, weight_decay=s.weight_decay, mask=wd_mask)
        )
    else:
        raise ValueError(f"unknown solver type '{s.type}'")

    return optax.chain(*parts), schedule


def host_lr(solver_cfg, iteration: int) -> float:
    """Host-side (numpy-free) mirror of the schedule — the jnp version
    dispatches eager device ops per call, which is costly over a relay."""
    warm = min(max(iteration / max(solver_cfg.warmup_iters, 1), 0.0), 1.0)
    factor = solver_cfg.warmup_factor * (1 - warm) + warm
    milestones = sum(1 for s in solver_cfg.steps if iteration >= s)
    return float(solver_cfg.base_lr * factor * (solver_cfg.gamma ** milestones))
