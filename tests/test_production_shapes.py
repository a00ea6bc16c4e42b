"""Production-recipe multichip compile smoke.

Two variants of the SAME mesh/sharding/recipe code path (bf16, 38
classes, 512 ROIs/image, bs8/device over the 8-device mesh — the v5e-8
analog of the reference's fixed-per-device scaling rule,
README.md:221-245):

  * default-suite BUDGETED variant — 256x320 canvas, runs in every
    `pytest tests/ -q` (VERDICT r4 item 6: a regression in the 8-mesh
    production compile must be caught by the default suite);
  * full 512x672 variant — env-gated THREEDOD_SLOW=1 (minutes of XLA:CPU
    compile), the exact production canvas.

Both AOT-compile only; execution at these shapes lives on the real chip
(tools/memory_budget.py, docs/DESIGN.md §13).
"""
from __future__ import annotations

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _compile_recipe(canvas_h, canvas_w, steps_per_dispatch=1):
    from threedod.config import Config
    from threedod.data.batch import Batch, GroundTruth
    from threedod.models import build_model
    from threedod.parallel import make_mesh, shard_batch
    from threedod.parallel.mesh import shard_superbatch
    from threedod.train import Trainer

    cfg = Config()
    cfg.shapes.canvas_height = canvas_h
    cfg.shapes.canvas_width = canvas_w
    cfg.model.roi_heads.num_classes = 38
    cfg.model.dtype = "bfloat16"
    cfg.solver.ims_per_batch = 64

    b = 64
    h, w, m = canvas_h, canvas_w, cfg.shapes.max_gt
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
    if steps_per_dispatch > 1:
        k = steps_per_dispatch
        sb = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (k,) + a.shape), batch
        )
        chain = trainer.make_train_step_k(k)
        sharded = shard_superbatch(sb, mesh)
        assert len(sharded.image.sharding.device_set) == 8
        compiled = chain.lower(state, sharded, jax.random.PRNGKey(1)).compile()
    else:
        step = trainer.make_train_step()
        sharded = shard_batch(batch, mesh)
        assert len(sharded.image.sharding.device_set) == 8
        compiled = step.lower(state, sharded, jax.random.PRNGKey(1)).compile()
    in_shardings = compiled.input_shardings[0]
    assert compiled is not None and in_shardings is not None


def test_production_recipe_compiles_on_mesh_budgeted():
    """Default-suite: production recipe at a 256x320 canvas, single step."""
    _compile_recipe(256, 320)


def test_production_recipe_chain_compiles_on_mesh_budgeted():
    """Default-suite: the K-step chained dispatch at the same recipe."""
    _compile_recipe(256, 320, steps_per_dispatch=2)


@pytest.mark.skipif(
    not os.environ.get("THREEDOD_SLOW"),
    reason="full 512x672 production-canvas compile: set THREEDOD_SLOW=1",
)
def test_production_train_step_compiles_on_mesh():
    """Full production canvas (512x672)."""
    _compile_recipe(512, 672)
