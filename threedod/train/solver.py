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


def scale_by_amsgrad_torch(b1: float = 0.9, b2: float = 0.999, eps: float = ADAM_EPS):
    """AMSGrad with torch.optim semantics (reference parity).

    torch (`amsgrad=True`, adam.py) keeps the running max of the RAW second
    moments and bias-corrects the max at use time:
        nu_max <- max(nu_max, nu);  denom = sqrt(nu_max / bc2) + eps
    optax's `scale_by_amsgrad` instead maxes the bias-corrected moments
    (max(nu_hat, nu/bc2)) — since bc2 grows over steps the two running
    maxima differ and the trajectories diverge (caught by
    tests/test_solver_torch_parity.py). Elementwise, so the flat-vector
    optimizer can reuse it unchanged."""

    def init_fn(params):
        z = lambda p: jnp.zeros_like(p)
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": jax.tree.map(z, params),
            "nu": jax.tree.map(z, params),
            "nu_max": jax.tree.map(z, params),
        }

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], updates)
        nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm / bc2) + eps), mu, nu_max
        )
        return out, {"count": count, "mu": mu, "nu": nu, "nu_max": nu_max}

    return optax.GradientTransformation(init_fn, update_fn)


def warmup_multistep_schedule(base_lr, steps, gamma, warmup_iters, warmup_factor):
    """detectron2 WarmupMultiStepLR: linear warmup then step decays."""

    def schedule(count):
        if warmup_iters <= 0:
            # d2 semantics: `iter < warmup_iters` never true -> no warmup
            warm = jnp.ones((), jnp.float32)
        else:
            warm = jnp.clip(count / warmup_iters, 0.0, 1.0)
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
        if "amsgrad" in opt_type:
            parts.append(scale_by_amsgrad_torch())
            parts.append(optax.scale_by_learning_rate(schedule))
        else:
            parts.append(optax.adam(learning_rate=schedule, eps=ADAM_EPS))
    elif opt_type in ("adamw", "adamw+amsgrad"):
        scaler = (
            scale_by_amsgrad_torch()
            if "amsgrad" in opt_type
            else optax.scale_by_adam(eps=ADAM_EPS)
        )
        parts.append(scaler)
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
        if "amsgrad" in opt_type:
            parts.append(scale_by_amsgrad_torch())
            parts.append(optax.scale_by_learning_rate(schedule))
        else:
            parts.append(optax.adam(learning_rate=schedule, eps=ADAM_EPS))
    elif opt_type in ("adamw", "adamw+amsgrad"):
        # optax.adamw == chain(scale_by_adam, add_decayed_weights(wd, mask),
        # scale_by_learning_rate) — same chain with the elementwise mask
        scaler = (
            scale_by_amsgrad_torch()
            if "amsgrad" in opt_type
            else optax.scale_by_adam(eps=ADAM_EPS)
        )
        parts.append(scaler)
        parts.append(_flat_decay(s.weight_decay, mask))
        parts.append(optax.scale_by_learning_rate(schedule))
    else:
        raise ValueError(f"unknown solver type '{s.type}'")

    return optax.chain(*parts), schedule


def host_lr(solver_cfg, iteration: int) -> float:
    """Host-side (numpy-free) mirror of the schedule — the jnp version
    dispatches eager device ops per call, which is costly over a relay."""
    if solver_cfg.warmup_iters <= 0:
        warm = 1.0  # mirror the jnp schedule's warmup_iters=0 edge
    else:
        warm = min(max(iteration / solver_cfg.warmup_iters, 0.0), 1.0)
    factor = solver_cfg.warmup_factor * (1 - warm) + warm
    milestones = sum(1 for s in solver_cfg.steps if iteration >= s)
    return float(solver_cfg.base_lr * factor * (solver_cfg.gamma ** milestones))
