"""Metric-depth fine-tuning (Depth-Anything-V2) — trainer, loss, metrics.

Parity target: the reference's vendored depth sub-framework trainer
(depth/metric_depth/train.py:1-211, util/loss.py SiLogLoss,
util/metric.py eval_depth):
  * SiLog loss over the valid-depth mask (loss.py:5-16),
  * AdamW with two parameter groups — encoder ('pretrained') at base LR,
    everything else at 10x (train.py:103-105), weight decay 0.01,
  * polynomial LR decay  lr = base * (1 - it/total)**0.9  recomputed from
    the base every iteration (train.py:148-152),
  * whole-batch random horizontal flip with p=0.5 (train.py:131-134),
  * masked depth metrics d1/d2/d3, abs_rel, sq_rel, rmse, rmse_log, log10,
    silog (metric.py:4-25), images with <10 valid pixels skipped
    (train.py:178-179), metric sums all-reduced across ranks
    (train.py:184-188).

TPU re-design: the DDP/SyncBatchNorm/NCCL plumbing (dist_helper.py:8-41)
disappears — one jitted train step over a batch sharded on the 1-D data
mesh; the flip decision and the mask live inside the jit program (static
shapes, `jnp.where` masking instead of boolean indexing); metric reduction
happens inside jit (the sharded sums are XLA psum over ICI).
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..parallel.mesh import make_mesh, replicate_local, shard_batch
from .checkpoint import CheckpointManager

logger = logging.getLogger(__name__)

MIN_VALID_PIXELS = 10  # train.py:178 — skip images with fewer valid pixels


# ---------------------------------------------------------------------------
# loss + metrics (masked, static-shape)
# ---------------------------------------------------------------------------

def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    n = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis) / n


def silog_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    valid_mask: jnp.ndarray,
    lambd: float = 0.5,
) -> jnp.ndarray:
    """Scale-invariant log loss (util/loss.py:5-16), masked.

    sqrt( mean(d^2) - lambd * mean(d)^2 ),  d = log(target) - log(pred).
    """
    mask = valid_mask.astype(jnp.float32)
    # guards: the reference boolean-indexes, so invalid pixels never reach
    # log(); here they flow through masked — clamp to keep them finite.
    d = jnp.log(jnp.maximum(target, 1e-6)) - jnp.log(jnp.maximum(pred, 1e-6))
    m2 = _masked_mean(d * d, mask)
    m1 = _masked_mean(d, mask)
    return jnp.sqrt(jnp.maximum(m2 - lambd * m1 * m1, 1e-12))


def eval_depth(
    pred: jnp.ndarray, target: jnp.ndarray, valid_mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Per-image masked depth metrics (util/metric.py:4-25).

    pred/target: (..., H, W); valid_mask broadcastable. Returns scalars
    averaged over valid pixels (one image's worth, reference semantics).
    """
    mask = valid_mask.astype(jnp.float32)
    p = jnp.maximum(pred, 1e-6)
    t = jnp.maximum(target, 1e-6)

    thresh = jnp.maximum(t / p, p / t)
    diff = p - t
    diff_log = jnp.log(p) - jnp.log(t)

    m = lambda x: _masked_mean(x, mask)
    silog_m2 = m(diff_log**2)
    silog_m1 = m(diff_log)
    return {
        "d1": m((thresh < 1.25).astype(jnp.float32)),
        "d2": m((thresh < 1.25**2).astype(jnp.float32)),
        "d3": m((thresh < 1.25**3).astype(jnp.float32)),
        "abs_rel": m(jnp.abs(diff) / t),
        "sq_rel": m(diff**2 / t),
        "rmse": jnp.sqrt(m(diff**2)),
        "rmse_log": jnp.sqrt(m(diff_log**2)),
        "log10": m(jnp.abs(jnp.log10(p) - jnp.log10(t))),
        "silog": jnp.sqrt(jnp.maximum(silog_m2 - 0.5 * silog_m1**2, 1e-12)),
    }


# ---------------------------------------------------------------------------
# optimizer: two groups (encoder x1, head x10) + poly decay
# ---------------------------------------------------------------------------

def poly_schedule(base_lr: float, total_iters: int, power: float = 0.9) -> Callable:
    """train.py:148 — lr = base * (1 - it/total)**power."""

    def schedule(count):
        frac = jnp.clip(count / jnp.maximum(total_iters, 1), 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power

    return schedule


def build_depth_optimizer(params, base_lr: float, total_iters: int, weight_decay: float = 0.01):
    """AdamW, encoder params ('pretrained' subtree) at base LR, everything
    else (DPT head) at 10x (train.py:103-105)."""

    def label_fn(params):
        return {k: ("pretrained" if k == "pretrained" else "head") for k in params}

    enc_sched = poly_schedule(base_lr, total_iters)
    head_sched = poly_schedule(base_lr * 10.0, total_iters)
    tx = optax.multi_transform(
        {
            "pretrained": optax.adamw(enc_sched, b1=0.9, b2=0.999, weight_decay=weight_decay),
            "head": optax.adamw(head_sched, b1=0.9, b2=0.999, weight_decay=weight_decay),
        },
        label_fn,
    )
    return tx


def host_poly_lr(base_lr: float, total_iters: int, iteration: int, power: float = 0.9) -> float:
    frac = min(max(iteration / max(total_iters, 1), 0.0), 1.0)
    return float(base_lr * (1.0 - frac) ** power)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


@struct.dataclass
class DepthTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


class DepthTrainer:
    """Fine-tunes a DepthAnythingV2 flax model on (image, depth, valid_mask)
    batches. Mesh data-parallel; one jit program per phase."""

    def __init__(
        self,
        model,
        base_lr: float = 5e-6,
        total_iters: int = 1000,
        min_depth: float = 0.001,
        max_depth: float = 20.0,
        mesh=None,
    ):
        self.model = model
        self.base_lr = base_lr
        self.total_iters = total_iters
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.mesh = mesh if mesh is not None else make_mesh()
        self.optimizer = None
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------
    def init_state(self, key, sample_image) -> DepthTrainState:
        init_fn = jax.jit(lambda k, x: self.model.init(k, x))
        variables = init_fn(key, sample_image)
        params = variables["params"]
        self.optimizer = build_depth_optimizer(params, self.base_lr, self.total_iters)
        opt_state = self.optimizer.init(params)
        state = DepthTrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        return replicate_local(state, self.mesh)

    # ------------------------------------------------------------------
    def make_train_step(self) -> Callable:
        model, optimizer = self.model, self.optimizer
        min_d, max_d = self.min_depth, self.max_depth

        def train_step(state: DepthTrainState, image, depth, valid_mask, key):
            # whole-batch random hflip, p=0.5 (train.py:131-134)
            flip = jax.random.bernoulli(key)
            image = jnp.where(flip, image[:, :, ::-1, :], image)
            depth = jnp.where(flip, depth[:, :, ::-1], depth)
            valid_mask = jnp.where(flip, valid_mask[:, :, ::-1], valid_mask)

            mask = valid_mask & (depth >= min_d) & (depth <= max_d)

            def loss_fn(params):
                pred = model.apply({"params": params}, image)
                return silog_loss(pred, depth, mask)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                DepthTrainState(params=new_params, opt_state=new_opt, step=state.step + 1),
                loss,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def make_eval_step(self) -> Callable:
        model = self.model
        min_d, max_d = self.min_depth, self.max_depth

        def eval_step(params, image, depth, valid_mask):
            pred = model.apply({"params": params}, image)
            if pred.shape != depth.shape:
                from ..models.depth.dpt import resize_align_corners

                pred = resize_align_corners(pred[..., None], depth.shape[1], depth.shape[2])[..., 0]
            mask = valid_mask & (depth >= min_d) & (depth <= max_d)
            per_image = jax.vmap(eval_depth)(pred, depth, mask)
            # skip images with too few valid pixels (train.py:178-179)
            keep = (jnp.sum(mask, axis=(1, 2)) >= MIN_VALID_PIXELS).astype(jnp.float32)
            sums = {k: jnp.sum(v * keep) for k, v in per_image.items()}
            return sums, jnp.sum(keep)

        return jax.jit(eval_step)

    # ------------------------------------------------------------------
    def fit(
        self,
        state: DepthTrainState,
        train_loader,
        epochs: int,
        val_loader=None,
        save_path: Optional[str] = None,
        seed: int = 0,
        log_every: int = 100,
    ):
        """Epoch loop mirroring train.py:115-211. Loaders yield dicts with
        'image' (B,H,W,3 normalized), 'depth' (B,H,W), 'valid_mask' (B,H,W)."""
        if self._train_step is None:
            self._train_step = self.make_train_step()
        ckpt = None
        if save_path is not None:
            ckpt = CheckpointManager(save_path, period=10**9, max_iter=10**9)

        previous_best = {
            k: 0.0 for k in ("d1", "d2", "d3")
        } | {k: 100.0 for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "log10", "silog")}
        key = jax.random.PRNGKey(seed)
        it = int(jax.device_get(state.step))

        for epoch in range(epochs):
            for sample in train_loader:
                key, k = jax.random.split(key)
                image = shard_batch(jnp.asarray(sample["image"]), self.mesh)
                depth = shard_batch(jnp.asarray(sample["depth"]), self.mesh)
                mask = shard_batch(jnp.asarray(sample["valid_mask"], bool), self.mesh)
                state, loss = self._train_step(state, image, depth, mask, k)
                if it % log_every == 0:
                    logger.info(
                        "Epoch %d iter %d LR %.7f loss %.3f",
                        epoch, it,
                        host_poly_lr(self.base_lr, self.total_iters, it),
                        float(jax.device_get(loss)),
                    )
                it += 1

            if val_loader is not None:
                results = self.evaluate(state.params, val_loader)
                logger.info("eval @ epoch %d: %s", epoch,
                            {k: round(v, 3) for k, v in results.items()})
                for k, v in results.items():
                    if k in ("d1", "d2", "d3"):
                        previous_best[k] = max(previous_best[k], v)
                    else:
                        previous_best[k] = min(previous_best[k], v)

            if ckpt is not None:
                # reference saves a single overwritten 'latest.pth'
                # (train.py:203-210)
                ckpt.save(
                    "latest",
                    {"state": jax.device_get(state), "epoch": epoch,
                     "previous_best": dict(previous_best)},
                )
        return state, previous_best

    # ------------------------------------------------------------------
    def evaluate(self, params, val_loader) -> Dict[str, float]:
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        totals: Dict[str, float] = {}
        nsamples = 0.0
        for sample in val_loader:
            image = shard_batch(jnp.asarray(sample["image"]), self.mesh)
            depth = shard_batch(jnp.asarray(sample["depth"]), self.mesh)
            mask = shard_batch(jnp.asarray(sample["valid_mask"], bool), self.mesh)
            sums, n = jax.device_get(self._eval_step(params, image, depth, mask))
            for k, v in sums.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            nsamples += float(n)
        return {k: v / max(nsamples, 1.0) for k, v in totals.items()}
