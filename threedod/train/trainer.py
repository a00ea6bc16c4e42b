"""Training loop with divergence-tolerant stabilizer and mesh data-parallel.

Parity target: tools/train_net.py:127-335 (do_train) and :456-493 (retry
loop in main):
  * rolling-mean loss divergence detector (TOLERANCE=4, GAMMA=0.02),
  * per-parameter NaN/Inf gradient scan after backward,
  * cluster-consistent skip (here: the jit program is SPMD-global, so every
    host/chip computes the identical global flag — no explicit allreduce),
  * retry/restart: if exploding-iteration fraction >= STABILIZE past half a
    checkpoint period, tear down and restart from the last checkpoint, up to
    MAX_TRAINING_ATTEMPTS,
  * checkpointing suppressed while diverging.

TPU re-design: one jitted train_step over a batch sharded on a 1-D
`Mesh('data')`; gradients average implicitly through the sharded loss mean
(ICI all-reduce inserted by XLA); the divergence flag zeroes the gradient
inside the step, so skipped iterations cost one compiled step, not a
recompile.

Asynchronous host loop (round 4): the stabilizer's rolling mean lives IN
the train state (`TrainState.stab`, NaN = uninitialised), so the host never
has to read a scalar back to decide the next step. `fit` dispatches steps
without any per-iteration `jax.device_get`; each step returns one packed
f32 vector of every scalar, and the host drains the buffered vectors with a
single stacked transfer at window/checkpoint/eval boundaries. Over the TPU
relay this removes a full host<->device round-trip per iteration and lets
the (single-core) host data pipeline overlap with device execution —
measured 7.8-9.2 it/s -> device-bound with the same step program.

Two deliberate parity drifts of the async loop (advisor round 4):
  * The RETRY decision (exploding-iteration fraction >= STABILIZE) is
    evaluated at drain boundaries (window/eval/checkpoint), not every
    iteration as the reference does — up to window-1 extra steps may
    dispatch after the threshold is crossed. Parameters stay safe (the
    in-jit skip zeroes diverging updates); only the restart fires later.
  * `TrainState.stab` was added in round 4, which changes the checkpoint
    pytree: round-3-era checkpoints do not restore through
    resume_or_load's abstract tree (structure mismatch). Format break,
    intentional; re-export old runs via params-only model_zoo loading.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jax.flatten_util import ravel_pytree

from ..data.batch import split_superbatch
from ..parallel.mesh import make_mesh_for_batch, replicate_local, shard_batch, shard_superbatch
from .checkpoint import CheckpointManager
from .events import EventStorage
from .solver import build_flat_optimizer, build_optimizer, host_lr


def _uniform_float_dtypes(tree) -> bool:
    """True iff every leaf shares one floating dtype (ravel_pytree would
    otherwise promote/cast, breaking exactness)."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return False
    dts = {jnp.asarray(l).dtype for l in leaves}
    return len(dts) == 1 and jnp.issubdtype(next(iter(dts)), jnp.floating)

logger = logging.getLogger(__name__)

TOLERANCE = 4.0
GAMMA = 0.02


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # stabilizer rolling loss mean (reference train_net.py:209-254
    # `recent_loss`); device-resident so the divergence decision never
    # requires a host read-back. NaN = "not yet initialised" (the reference's
    # `recent_loss is None`).
    stab: jnp.ndarray


@struct.dataclass
class StepOut:
    """Per-step scalars. `packed` carries every scalar in one f32 vector
    ([total, diverging, rolling, *losses(sorted), *metrics(sorted)]) so an
    async host loop needs exactly one small transfer per drained window;
    the individual fields exist for direct callers (profilers, tests)."""
    total: jnp.ndarray
    losses: Any
    metrics: Any
    diverging: jnp.ndarray
    packed: jnp.ndarray


def init_stab() -> jnp.ndarray:
    return jnp.asarray(np.nan, jnp.float32)


class Trainer:
    def __init__(self, cfg, model, mesh=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh_for_batch(cfg.solver.ims_per_batch)
        self.optimizer, self.schedule = None, None
        self.flat_opt = False
        self._train_step = None
        self._train_step_chain = None  # compiled K-step scan (fit with K>1)
        # (loss_keys, metric_keys) captured at first trace of the step; fixes
        # the layout of StepOut.packed for the async drain in fit().
        self._scalar_keys = None

    # ------------------------------------------------------------------
    def ensure_optimizer(self, params):
        """Build the optimizer once. Default is the per-leaf optax form:
        the flat single-vector alternative is mathematically identical but
        MEASURED SLOWER on v5e (~87 vs ~82.5 ms/step back-to-back; the
        ravel/unravel copies and lost donation aliasing outweigh the
        per-leaf fusion overhead — solver.build_flat_optimizer docstring,
        docs/DESIGN.md 9f). Set THREEDOD_FLAT_OPT=1 to flip the gate on a
        uniform-float param tree (ravel_pytree would promote mixed dtypes)."""
        if self.optimizer is None:
            self.flat_opt = bool(
                int(os.environ.get("THREEDOD_FLAT_OPT", "0"))
            ) and _uniform_float_dtypes(params)
            build = build_flat_optimizer if self.flat_opt else build_optimizer
            self.optimizer, self.schedule = build(self.cfg, params)
        return self.optimizer

    # ------------------------------------------------------------------
    def init_state(self, key, sample_batch) -> TrainState:
        # jit the init: unjitted flax init dispatches thousands of eager ops
        # (catastrophic over a remote-TPU relay, and slower everywhere).
        init_fn = jax.jit(lambda k, b: self.model.init(
            {"params": k, "sampling": jax.random.fold_in(k, 1)}, b, train=True
        ))
        variables = init_fn(key, sample_batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.ensure_optimizer(params)
        if self.flat_opt:
            opt_state = jax.jit(lambda p: self.optimizer.init(ravel_pytree(p)[0]))(params)
        else:
            opt_state = self.optimizer.init(params)
        state = TrainState(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            step=jnp.zeros((), jnp.int32), stab=init_stab(),
        )
        # replicate over the mesh (communication-free — see replicate_local)
        return replicate_local(state, self.mesh)

    # ------------------------------------------------------------------
    def _step_body(self) -> Callable:
        """Raw (unjitted) `step(state, batch, base_key) -> (state, StepOut)`.

        The per-iteration RNG is derived in-jit as fold_in(base_key,
        state.step), so the host passes the SAME base key array every call
        (no per-iteration key split / transfer). The stabilizer decision and
        its rolling-mean update both run in-jit from state.stab — which also
        makes the body directly chainable under lax.scan (make_train_step_k):
        divergence skips and the rolling mean propagate step-to-step with no
        host involvement."""
        model = self.model
        optimizer = self.optimizer
        flat_opt = self.flat_opt
        freeze_bn = self.cfg.model.freeze_bn or not self.cfg.model.use_bn
        # static python bool: gates *bookkeeping* (rolling mean + explode
        # accounting), exactly like the reference's host-side
        # `diverging and stabilize > 0`. The parameter-update guard below
        # uses the raw flag regardless (unchanged from round 3).
        stab_on = self.cfg.model.stabilize > 0

        def train_step(state: TrainState, batch, base_key):
            key = jax.random.fold_in(base_key, state.step)

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch,
                    train=True,
                    rngs={"sampling": key},
                    mutable=["batch_stats"],
                )
                losses, metrics = out
                total = sum(jax.tree.leaves(losses))
                return total, (losses, metrics, mut.get("batch_stats", state.batch_stats))

            (total, (losses, metrics, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)

            if flat_opt:
                flat_g, _ = ravel_pytree(grads)
                grads_finite = jnp.isfinite(flat_g).all()
            else:
                grads_finite = jnp.all(
                    jnp.asarray([jnp.isfinite(g).all() for g in jax.tree.leaves(grads)])
                )
            rolling = state.stab
            uninit = jnp.isnan(rolling)
            roll_eff = jnp.where(uninit, jnp.inf, rolling)
            loss_ok = jnp.isfinite(total) & (total <= roll_eff * TOLERANCE)
            diverging = ~(grads_finite & loss_ok)

            # rolling-mean update (reference train_net.py:227-236 ordering:
            # first-iteration init to 2*total happens BEFORE the EMA, so the
            # first successful step applies both)
            book_div = diverging if stab_on else jnp.zeros((), bool)
            base = jnp.where(
                uninit,
                jnp.where(jnp.isfinite(total), total * 2.0, 1e6),
                rolling,
            )
            new_stab = jnp.where(book_div, base, base * (1 - GAMMA) + total * GAMMA)

            # on divergence the whole optimizer step is skipped (parameters,
            # momentum and weight decay all stay put — reference semantics of
            # not calling optimizer.step()). The LR-schedule count lags by
            # the number of skipped iterations, which STABILIZE bounds to a
            # small fraction.
            if flat_opt:
                # one flat vector: the whole update/guard section is a
                # handful of vector ops instead of ~6 x n_leaves tiny
                # fusions (solver.build_flat_optimizer docstring)
                flat_p, unravel = ravel_pytree(state.params)
                updates_flat, new_opt = optimizer.update(
                    flat_g, state.opt_state, flat_p
                )
                new_params = unravel(
                    jnp.where(diverging, flat_p, flat_p + updates_flat)
                )
            else:
                updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
                new_params = jax.tree.map(
                    lambda p, u: jnp.where(diverging, p, p + u), state.params, updates
                )
            new_opt = jax.tree.map(
                lambda old, new: jnp.where(diverging, old, new), state.opt_state, new_opt
            )
            if freeze_bn:
                new_bs = state.batch_stats
            elif flat_opt and jax.tree.leaves(new_bs) and _uniform_float_dtypes(new_bs):
                flat_nb, unravel_bs = ravel_pytree(new_bs)
                flat_ob, _ = ravel_pytree(state.batch_stats)
                new_bs = unravel_bs(jnp.where(diverging, flat_ob, flat_nb))
            else:
                new_bs = jax.tree.map(
                    lambda new, old: jnp.where(diverging, old, new), new_bs, state.batch_stats
                )
            new_state = TrainState(
                params=new_params, batch_stats=new_bs, opt_state=new_opt,
                step=state.step + 1, stab=new_stab,
            )
            lkeys, mkeys = sorted(losses), sorted(metrics)
            self._scalar_keys = (tuple(lkeys), tuple(mkeys))
            packed = jnp.stack(
                [total.astype(jnp.float32),
                 book_div.astype(jnp.float32),
                 new_stab]
                + [losses[k].astype(jnp.float32) for k in lkeys]
                + [metrics[k].astype(jnp.float32) for k in mkeys]
            )
            out = StepOut(
                total=total, losses=losses, metrics=metrics,
                diverging=diverging, packed=packed,
            )
            return new_state, out

        return train_step

    def make_train_step(self) -> Callable:
        """Jitted single step, state donated."""
        return jax.jit(self._step_body(), donate_argnums=(0,))

    def make_train_step_k(self, k: int) -> Callable:
        """Jitted K-step chain: `(state, superbatch, base_key) -> (state,
        packed(K, S))`.

        `superbatch` leaves carry a leading (K, B, ...) step axis (see
        data.batch.collate(steps=K)); the chain is a lax.scan of the single
        step body, so the compiled program stays single-step-sized (no K-fold
        HLO growth — large fused programs break the relay compile RPC) while
        one host dispatch covers K iterations. Numerically identical to K
        sequential single-step calls: the RNG key is fold_in(base_key,
        state.step) in-jit and the stabilizer rides TrainState
        (tests/test_train.py::test_k_step_chain_matches_singles).
        """
        body = self._step_body()

        def multi_step(state: TrainState, superbatch, base_key):
            def scan_body(st, b):
                st2, out = body(st, b, base_key)
                return st2, out.packed

            state, packed = jax.lax.scan(scan_body, state, superbatch)
            return state, packed

        return jax.jit(multi_step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_loader,
        start_iter: int = 0,
        eval_fn: Optional[Callable] = None,
        storage: Optional[EventStorage] = None,
    ):
        """One training attempt. Returns (state, True) on success or
        (state, False) when the stabilizer demands a restart.

        The loop is asynchronous: steps are dispatched back-to-back with no
        per-iteration device read; scalar vectors are buffered and drained
        (one stacked device_get) every `storage.window` iterations and at
        checkpoint / eval / retry boundaries. Wall-time attribution
        (loader wait, dispatch, drain) is logged as perf/* scalars."""
        cfg = self.cfg
        max_iter = cfg.solver.max_iter
        K = max(1, int(getattr(cfg.solver, "steps_per_dispatch", 1)))
        if K > 1 and self._train_step_chain is None:
            self._train_step_chain = self.make_train_step_k(K)
        if K == 1 and self._train_step is None:
            self._train_step = self.make_train_step()
        storage = storage or EventStorage(cfg.output_dir)
        ckpt = CheckpointManager(cfg.output_dir, cfg.solver.checkpoint_period, max_iter)

        # a fresh attempt restarts the rolling mean (reference: recent_loss
        # is a local of do_train, reset on every retry)
        state = state.replace(stab=init_stab())
        iterations_success = 0
        iterations_explode = 0
        base_key = jax.random.PRNGKey(cfg.seed)

        t_loader = t_dispatch = t_drain = 0.0
        pending: list = []  # [(start_iteration, n_steps, packed (n, S))]

        def drain():
            """One stacked transfer for all buffered scalars; returns the
            list of (iteration, vec) rows as host numpy."""
            nonlocal t_loader, t_dispatch, t_drain, iterations_success, iterations_explode
            if not pending:
                return True
            t0 = time.perf_counter()
            vals = np.asarray(jax.device_get(
                jnp.concatenate([p for _, _, p in pending], axis=0)
            ))
            t_drain += time.perf_counter() - t0
            lkeys, mkeys = self._scalar_keys
            its = [it0 + j for it0, n, _ in pending for j in range(n)]
            rows = list(zip(its, vals))
            pending.clear()
            for it, v in rows:
                total, book_div = float(v[0]), bool(v[1] > 0.5)
                if book_div:
                    iterations_explode += 1
                    logger.warning(
                        "Skipping gradient update: loss %.2f vs rolling mean %.2f",
                        total, float(v[2]),
                    )
                else:
                    iterations_success += 1
                storage.iter = it
                scalars = {"total_loss": total, "lr": host_lr(cfg.solver, it)}
                scalars.update(
                    {k: float(x) for k, x in zip(lkeys, v[3 : 3 + len(lkeys)])}
                )
                scalars.update(
                    {k: float(x) for k, x in zip(mkeys, v[3 + len(lkeys) :])}
                )
                storage.put_scalars(**scalars)
                if (it + 1) % storage.window == 0 or it == max_iter - 1:
                    storage.put_scalars(**{
                        "perf/loader_wait_s": t_loader,
                        "perf/dispatch_s": t_dispatch,
                        "perf/drain_s": t_drain,
                    })
                    t_loader = t_dispatch = t_drain = 0.0
                    storage.flush(max_iter)
            # last drained row's divergence flag decides checkpoint/eval
            # eligibility for the boundary iteration
            return not bool(rows[-1][1][1] > 0.5)

        data_iter = iter(train_loader)
        iteration = start_iter
        tail: list = []  # leftover single batches of a split superbatch
        staged = None  # next superbatch, already transferred to the mesh

        def stage():
            """Fetch + shard the NEXT superbatch. Called right after an
            (async) chain dispatch, so the host->device transfer overlaps
            the device executing the K steps just dispatched — measured
            23.4 ms/iter of synchronous device_put otherwise (K=10, bs8
            over the relay). Single-threaded on purpose: a worker-thread
            device_put concurrent with main-thread RPCs wedges the relay
            client."""
            nonlocal t_loader
            t0 = time.perf_counter()
            sb = shard_superbatch(next(data_iter), self.mesh)
            t_loader += time.perf_counter() - t0
            return sb

        while iteration < max_iter:
            # distance to the next boundary at which the host must look at
            # scalars; a K-chain must end exactly there
            to_b = max_iter - iteration
            to_b = min(to_b, storage.window - iteration % storage.window)
            if eval_fn is not None and cfg.test.eval_period > 0:
                to_b = min(to_b, cfg.test.eval_period - iteration % cfg.test.eval_period)
            to_b = min(to_b, ckpt.period - iteration % ckpt.period)

            if K > 1 and to_b >= K and not tail:
                if staged is None:
                    staged = stage()
                t0 = time.perf_counter()
                state, packed = self._train_step_chain(state, staged, base_key)
                pending.append((iteration, K, packed))
                t_dispatch += time.perf_counter() - t0
                iteration += K
                staged = None
                if iteration < max_iter:
                    staged = stage()  # transfer rides the running chain
            else:
                t0 = time.perf_counter()
                if K > 1:
                    if not tail:
                        if staged is not None:
                            sb, staged = staged, None
                        else:
                            sb = next(data_iter)
                        tail = split_superbatch(sb, K)
                    batch = tail.pop(0)
                else:
                    batch = next(data_iter)
                t_loader += time.perf_counter() - t0
                t0 = time.perf_counter()
                batch = shard_batch(batch, self.mesh)
                if self._train_step is None:
                    self._train_step = self.make_train_step()
                state, out = self._train_step(state, batch, base_key)
                pending.append((iteration, 1, out.packed[None, :]))
                t_dispatch += time.perf_counter() - t0
                iteration += 1

            nxt = iteration  # chunks end exactly on boundaries
            eval_due = (
                eval_fn is not None
                and cfg.test.eval_period > 0
                and nxt % cfg.test.eval_period == 0
                and nxt != max_iter
            )
            ckpt_due = nxt % ckpt.period == 0 or nxt >= max_iter
            boundary = (
                nxt % storage.window == 0
                or nxt >= max_iter
                or eval_due
                or ckpt_due
            )
            if boundary:
                last_ok = drain()

                total_iters = iterations_success + iterations_explode
                retry = (
                    cfg.model.stabilize > 0
                    and (iterations_explode / max(total_iters, 1)) >= cfg.model.stabilize
                    and total_iters > cfg.solver.checkpoint_period * 0.5
                )
                if retry:
                    logger.warning(
                        "!! Restarting training at %d iters. Exploding loss %d%% of iters !!",
                        nxt - 1, int(100 * iterations_explode / total_iters),
                    )
                    return state, False

                if eval_due and last_ok:
                    eval_fn(state, nxt, storage)

                # suppress checkpoints while potentially diverging. The
                # state is only pulled to host when a checkpoint is actually
                # due — a device_get of the full train state every iteration
                # would move hundreds of MB per step.
                if ckpt_due and last_ok and (
                    iterations_explode / max(total_iters, 1) < 0.5 * cfg.model.stabilize
                    or cfg.model.stabilize <= 0
                ):
                    it_done = nxt - 1  # last executed iteration index
                    ckpt.step(it_done, {"state": jax.device_get(state), "iteration": it_done})

        drain()
        return state, True


def train_with_retries(cfg, build_fn, train_loader_fn, eval_fn=None):
    """Full retry state machine (reference main loop train_net.py:456-493)."""
    attempt = 0
    storage = EventStorage(cfg.output_dir)
    while attempt < cfg.max_training_attempts:
        trainer, state, start_iter = build_fn(resume=attempt > 0)
        state, success = trainer.fit(
            state, train_loader_fn(), start_iter=start_iter, eval_fn=eval_fn, storage=storage
        )
        if success:
            return trainer, state
        attempt += 1
        logger.warning("training attempt %d failed; retrying from checkpoint", attempt)
    raise RuntimeError(f"training failed after {cfg.max_training_attempts} attempts")
