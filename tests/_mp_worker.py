"""Worker for the true multi-process distributed test (spawned by
tests/test_multiprocess.py): 2 processes x 4 virtual CPU devices each form
one 8-device data-parallel mesh via jax.distributed.initialize; each process
runs the SAME sharded train step (SPMD) and gathers predictions across
process boundaries — the multi-host story the reference implements with
DDP/NCCL (reference tools/train_net.py:477-536, launched via detectron2
launch)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

proc_id = int(sys.argv[1])
coordinator = sys.argv[2]

jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=proc_id
)

import numpy as np
import jax.numpy as jnp

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import __graft_entry__ as ge
from threedod.evaluation.inference import gather_predictions
from threedod.models import build_model
from threedod.parallel import make_mesh
from threedod.train import Trainer

cfg = ge._tiny_cfg()
cfg.model.dtype = "float32"
cfg.solver.ims_per_batch = 8
model = build_model(cfg)
mesh = make_mesh(devices=jax.devices())
trainer = Trainer(cfg, model, mesh=mesh)

batch = ge._tiny_batch(cfg, b=8, with_gt=True)  # same on every process (seeded)

# init_state is communication-free by design (parallel/mesh.replicate_local:
# each process supplies its identical local copy; jax.device_put onto a
# cross-process replicated sharding would run a surprise value-equality
# all-gather whose gloo window is a fixed 30 s — compile skew on a loaded
# host blew it). The barrier is defensive: it bounds import/build skew
# before any distributed activity.
from jax._src import distributed

distributed.global_state.client.wait_at_barrier("pre_init", 900_000)
state = trainer.init_state(jax.random.PRNGKey(0), batch)

# global sharded batch: each process provides its local quarter of the data
from jax.sharding import NamedSharding, PartitionSpec as P


def make_global(x):
    x = np.asarray(x)
    sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, x[proc_id * 4 : proc_id * 4 + 4])


sharded = jax.tree.map(make_global, batch)
step = trainer.make_train_step()

# AOT-compile first, then rendezvous at a coordination-service barrier:
# each process compiles at its own pace (minutes on CPU), but gloo's
# key-value exchange for the first cross-process collective has a 30 s
# timeout — both processes must *execute* near-simultaneously.
compiled = step.lower(state, sharded, jax.random.PRNGKey(1)).compile()


distributed.global_state.client.wait_at_barrier("compiled", 900_000)

new_state, out = compiled(state, sharded, jax.random.PRNGKey(1))
jax.block_until_ready(new_state.params)
total = float(jax.device_get(out.total))
assert np.isfinite(total), total

# cross-process prediction gather (evaluation/inference.py:25-43)
preds = [{"image_id": proc_id * 4 + i, "score": 0.5 + proc_id} for i in range(4)]
merged = gather_predictions(preds)
assert len(merged) == 8, len(merged)
ids = sorted(p["image_id"] for p in merged)
assert ids == list(range(8)), ids

print(f"WORKER{proc_id} OK loss={total:.6f}", flush=True)

# The implicit atexit shutdown hits a coordination-service barrier with a
# FIXED short timeout; interpreter teardown (buffer frees, XLA finalizers)
# skews by minutes on a loaded host. Rendezvous with a generous timeout and
# shut down explicitly while both processes are provably in lockstep.
distributed.global_state.client.wait_at_barrier("done", 900_000)
jax.distributed.shutdown()
