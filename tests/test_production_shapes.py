"""Production-shape multichip smoke (env-gated: THREEDOD_SLOW=1).

The default test pyramid and the driver's dryrun use reduced canvases; this
test AOT-compiles the FULL supervised train step at the production recipe —
512x672 canvas, 512 ROIs, bs8/device over the 8-device mesh (global batch
64, the v5e-8 analog of the reference's fixed-per-device scaling rule,
README.md:221-245) — proving the sharded program builds end-to-end at real
shapes. Execution stays off (a CPU-mesh step at these shapes takes
minutes); the real-chip memory/time numbers live in tools/memory_budget.py
and docs/DESIGN.md §11.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("THREEDOD_SLOW"),
    reason="production-shape compile smoke: set THREEDOD_SLOW=1",
)


def test_production_train_step_compiles_on_mesh():
    from threedod.config import Config
    from threedod.data.batch import Batch, GroundTruth
    from threedod.models import build_model
    from threedod.parallel import make_mesh, shard_batch
    from threedod.train import Trainer

    cfg = Config()
    cfg.shapes.canvas_height = 512
    cfg.shapes.canvas_width = 672
    cfg.model.roi_heads.num_classes = 38
    cfg.model.dtype = "bfloat16"
    cfg.solver.ims_per_batch = 64

    b = 64
    h, w, m = 512, 672, cfg.shapes.max_gt
    rng = np.random.RandomState(0)
    xy = rng.uniform(10, w // 2, (b, m, 2)).astype(np.float32)
    wh = rng.uniform(40, 160, (b, m, 2)).astype(np.float32)
    gt = GroundTruth(
        boxes2d=jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        classes=jnp.asarray(rng.randint(0, 38, (b, m)).astype(np.int32)),
        boxes3d=jnp.asarray(
            np.concatenate(
                [xy + wh / 2, 2 + rng.rand(b, m, 1) * 4, 0.3 + rng.rand(b, m, 3),
                 rng.randn(b, m, 3)], -1,
            ).astype(np.float32)
        ),
        poses=jnp.broadcast_to(jnp.eye(3), (b, m, 3, 3)),
        valid=jnp.asarray(np.tile([True] * 6 + [False] * (m - 6), (b, 1))),
    )
    K = np.tile(np.array([[[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]]], np.float32), (b, 1, 1))
    batch = Batch(
        image=jnp.zeros((b, h, w, 3), jnp.uint8),
        image_hw=jnp.asarray(np.tile([h, w], (b, 1)).astype(np.int32)),
        K=jnp.asarray(K),
        im_scale_ratio=jnp.full((b,), 1.5),
        image_id=jnp.zeros((b,), jnp.int32),
        gt=gt,
    )

    mesh = make_mesh()
    assert mesh.devices.size == 8
    model = build_model(cfg)
    trainer = Trainer(cfg, model, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.make_train_step()
    sharded = shard_batch(batch, mesh)
    assert len(sharded.image.sharding.device_set) == 8

    compiled = step.lower(state, sharded, jax.random.PRNGKey(1)).compile()
    # sharding survived into the executable: per-device input is b/8
    in_shardings = compiled.input_shardings[0]
    assert compiled is not None and in_shardings is not None
