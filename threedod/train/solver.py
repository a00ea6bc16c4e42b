"""Optimizer + LR schedule construction.

Parity target: cubercnn/solver/build.py — per-param groups (no weight decay
on prior parameters, :44-45), sgd/adam/adamw(+amsgrad) selection (:49-64),
optional gradient clipping, WarmupMultiStepLR.

Two constructions of the same optimizer:
  * build_optimizer — per-leaf pytree transforms (the straightforward optax
    form; kept for mixed-dtype param trees and as the semantics oracle).
  * build_flat_optimizer — the SAME update math on ONE raveled parameter
    vector (the weight-decay mask becomes an elementwise 0/1 vector, so the
    per-group no-decay semantics are preserved exactly; equivalence-tested
    in tests/test_train.py). Hypothesis was that the per-leaf form's ~6 ops
    x 168 leaves of tiny fusions carry enough per-op overhead to matter;
    MEASURED OTHERWISE on v5e (docs/DESIGN.md 9f): back-to-back interleaved
    rounds put flat at ~87 ms/step vs per-leaf ~82.5 (the ravel/unravel
    copies and lost donation aliasing cost more than the fusion overhead
    they remove), and profile_bwd's full-minus-noopt puts the whole
    optimizer+guard section at only ~4 ms. Kept as an equivalence-tested
    alternative behind Trainer's default-off gate, per the repo's
    negative-result convention (DESIGN 9c).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

# The reference runs every Adam variant with eps=1e-2 (solver/build.py:58-64)
ADAM_EPS = 1e-2


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
    """Weight-decay mask: skip priors buffers (solver/build.py:44-45) and
    norm-layer params (solver/build.py:33-34 with detectron2's default
    `SOLVER.WEIGHT_DECAY_NORM = 0.0`: every BatchNorm/LayerNorm/GroupNorm
    weight+bias trains decay-free). Flax norm modules here are named `bn`
    (ConvBN / heads) or carry `norm` in the module name (sam/gdino), and
    only norm layers own `scale` leaves."""

    def mask_fn(path, _):
        parts = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        if any("priors" in p for p in parts):
            return False
        mod = parts[-2].lower() if len(parts) >= 2 else ""
        if (mod == "bn" or "norm" in mod) and parts[-1] in ("scale", "bias"):
            return False
        return True

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

    # reference Adam/AdamW use eps=1e-2 (solver/build.py:58-64); torch's
    # `amsgrad=True` maps to optax's amsgrad max-of-second-moment variant
    opt_type = s.type.lower()
    if opt_type == "sgd":
        if s.weight_decay > 0:
            parts.append(optax.add_decayed_weights(s.weight_decay, mask=wd_mask))
        parts.append(
            optax.sgd(learning_rate=schedule, momentum=s.momentum, nesterov=s.nesterov)
        )
    elif opt_type in ("adam", "adam+amsgrad"):
        if s.weight_decay > 0:
            parts.append(optax.add_decayed_weights(s.weight_decay, mask=wd_mask))
        make = optax.amsgrad if "amsgrad" in opt_type else optax.adam
        parts.append(make(learning_rate=schedule, eps=ADAM_EPS))
    elif opt_type in ("adamw", "adamw+amsgrad"):
        scaler = optax.scale_by_amsgrad if "amsgrad" in opt_type else optax.scale_by_adam
        parts.append(scaler(eps=ADAM_EPS))
        parts.append(optax.add_decayed_weights(s.weight_decay, mask=wd_mask))
        parts.append(optax.scale_by_learning_rate(schedule))
    else:
        raise ValueError(f"unknown solver type '{s.type}'")

    return optax.chain(*parts), schedule


def _flat_decay(weight_decay: float, flat_mask: jnp.ndarray):
    """add_decayed_weights with an ELEMENTWISE mask over the flat params
    vector (optax masks select whole leaves; the flat vector is one leaf)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return updates + weight_decay * jnp.where(flat_mask, params, 0.0), state

    return optax.GradientTransformation(init_fn, update_fn)


def flat_decay_mask(params) -> jnp.ndarray:
    """The per-group no-decay mask raveled to element granularity, in
    ravel_pytree's leaf order (host-side numpy — no eager device ops)."""
    mask_tree = _no_decay_mask(params)
    return jnp.asarray(
        np.concatenate(
            [
                np.full(max(int(np.prod(p.shape)), 1), bool(m))
                for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask_tree))
            ]
        )
        if jax.tree.leaves(params)
        else np.zeros((0,), bool)
    )


def build_flat_optimizer(cfg, params):
    """The build_optimizer chain re-expressed over one flat vector.

    Identical arithmetic per element (clip's global norm is the same value
    up to summation order; trace/adam moments and decay are elementwise) —
    equivalence-tested against build_optimizer in tests/test_train.py."""
    s = cfg.solver
    schedule = warmup_multistep_schedule(
        s.base_lr, s.steps, s.gamma, s.warmup_iters, s.warmup_factor
    )
    mask = flat_decay_mask(params)

    parts = []
    if s.clip_gradients > 0:
        parts.append(optax.clip_by_global_norm(s.clip_gradients))

    opt_type = s.type.lower()
    if opt_type == "sgd":
        if s.weight_decay > 0:
            parts.append(_flat_decay(s.weight_decay, mask))
        parts.append(
            optax.sgd(learning_rate=schedule, momentum=s.momentum, nesterov=s.nesterov)
        )
    elif opt_type in ("adam", "adam+amsgrad"):
        if s.weight_decay > 0:
            parts.append(_flat_decay(s.weight_decay, mask))
        make = optax.amsgrad if "amsgrad" in opt_type else optax.adam
        parts.append(make(learning_rate=schedule, eps=ADAM_EPS))
    elif opt_type in ("adamw", "adamw+amsgrad"):
        # optax.adamw == chain(scale_by_adam, add_decayed_weights(wd, mask),
        # scale_by_learning_rate) — same chain with the elementwise mask
        scaler = optax.scale_by_amsgrad if "amsgrad" in opt_type else optax.scale_by_adam
        parts.append(scaler(eps=ADAM_EPS))
        parts.append(_flat_decay(s.weight_decay, mask))
        parts.append(optax.scale_by_learning_rate(schedule))
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
