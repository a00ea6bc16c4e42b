"""Device mesh + sharding helpers (the framework's entire "comm backend").

Parity target: the reference's NCCL/DDP plumbing (tools/train_net.py:477-536,
allreduce_dict :497-524, depth/metric_depth/util/dist_helper.py). On TPU none
of that exists as user code: a 1-D `Mesh('data')` over all chips plus
NamedSharding on the batch makes XLA insert all gradient/metric collectives
over ICI/DCN (SURVEY.md §5.8). Multi-host bringup is `jax.distributed
.initialize()` + the same mesh over `jax.devices()`.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Multi-host bringup. No-op on a single host with no env configured."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(axis_name: str = "data", devices=None) -> Mesh:
    """1-D data-parallel mesh over all (global) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=(axis_name,))


def make_mesh_for_batch(batch_size: int, axis_name: str = "data", devices=None) -> Mesh:
    """Largest data mesh whose size divides the global batch.

    The reference (detectron2 launch) requires IMS_PER_BATCH divisible by
    world size; here a tiny batch on a big slice degrades to fewer devices
    instead of crashing in device_put."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while batch_size % n:
        n -= 1
    if n != len(devices):
        import logging

        logging.getLogger(__name__).warning(
            "global batch %d not divisible by %d devices; data mesh uses %d",
            batch_size, len(devices), n,
        )
    return Mesh(np.asarray(devices[:n]), axis_names=(axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_local(tree, mesh: Mesh):
    """Replicate a host-local pytree over the mesh WITHOUT communication.

    ``jax.device_put`` onto a replicated sharding that spans multiple
    processes runs a value-equality all-gather of the data itself
    (multihost_utils.assert_equal inside _device_put_sharding_impl) — a
    surprise collective whose gloo key-value exchange has a fixed 30 s
    window, so any compile/load skew between hosts at that moment kills
    the job (and the gather is payload-sized: the whole train state).
    Every caller here computes the tree identically on each process (same
    PRNG key, same program), so each process supplies its local copy
    directly via make_array_from_callback — no collective, no window.
    """
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)

    def place(x):
        if x is None:
            return None
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, rep, lambda idx: arr[idx])

    return jax.tree.map(place, tree)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a Batch pytree with batch-axis sharding over the mesh.

    Leaves whose leading dim doesn't divide over the mesh are replicated
    (correct, just not parallel) rather than crashing."""
    sharding = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)
    n = mesh.devices.size

    def place(x):
        if x is None:
            return None
        ok = hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0
        if ok:
            return jax.device_put(x, sharding)
        return replicate_local(x, mesh)

    return jax.tree.map(place, batch)


def shard_superbatch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a (K, B, ...) superbatch with axis-1 (per-step batch) sharding.

    The leading K axis is the `lax.scan` step axis of the trainer's chained
    dispatch and stays unsharded; each step's batch shards over the mesh
    exactly as in shard_batch."""
    sharding = NamedSharding(mesh, P(None, axis_name))
    n = mesh.devices.size

    def place(x):
        if x is None:
            return None
        ok = hasattr(x, "shape") and x.ndim >= 2 and x.shape[1] % n == 0
        if ok:
            return jax.device_put(x, sharding)
        return replicate_local(x, mesh)

    return jax.tree.map(place, batch)
