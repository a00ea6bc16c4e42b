"""End-to-end training test: synth data -> mesh-sharded steps -> eval."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threedod.config import Config
from threedod.data import (
    CATALOG,
    Omni3D,
    TestLoader,
    TrainLoader,
    compute_priors,
    generate_synth_dataset,
    get_filter_settings_from_cfg,
    load_omni3d_json,
    register_and_store_model_metadata,
)
from threedod.data.synth import SYNTH_CATEGORIES
from threedod.evaluation import (
    Omni3DEvaluationHelper,
    gts_from_records,
    inference_on_dataset,
)
from threedod.models import build_model
from threedod.parallel import make_mesh, shard_batch
from threedod.train import Trainer
from threedod.train.solver import warmup_multistep_schedule


def small_cfg(outdir):
    cfg = Config()
    cfg.output_dir = outdir
    cfg.shapes.canvas_height = 96
    cfg.shapes.canvas_width = 128
    cfg.shapes.max_gt = 12
    cfg.shapes.roi_batch = 32
    cfg.shapes.nms_candidates = 128
    cfg.shapes.max_detections = 16
    cfg.input.min_size_train = (96,)
    cfg.input.min_size_test = 96
    cfg.model.roi_heads.batch_size_per_image = 32
    cfg.model.rpn.batch_size_per_image = 32
    cfg.model.rpn.pre_nms_topk_train = 128
    cfg.model.rpn.pre_nms_topk_test = 128
    cfg.model.rpn.post_nms_topk_train = 64
    cfg.model.rpn.post_nms_topk_test = 64
    cfg.model.dtype = "float32"
    cfg.solver.ims_per_batch = 8
    cfg.solver.max_iter = 8
    cfg.solver.base_lr = 0.005
    cfg.solver.checkpoint_period = 100
    cfg.solver.warmup_iters = 2
    cfg.test.eval_period = 0
    cfg.datasets.category_names = tuple(sorted(SYNTH_CATEGORIES))
    cfg.model.roi_heads.num_classes = len(SYNTH_CATEGORIES)
    return cfg


@pytest.fixture(scope="module")
def synth_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("datasets"))
    generate_synth_dataset(root=root, splits=(("train", 8), ("test", 4)), write_maps=False)
    outdir = str(tmp_path_factory.mktemp("out"))
    cfg = small_cfg(outdir)
    cfg.datasets.root = root

    CATALOG.clear()
    fs = get_filter_settings_from_cfg(cfg)
    datasets = Omni3D([os.path.join(root, "Omni3D", "synth_train.json")], filter_settings=fs)
    meta = register_and_store_model_metadata(datasets, outdir, fs)
    for split in ("synth_train", "synth_test"):
        records = load_omni3d_json(
            os.path.join(root, "Omni3D", f"{split}.json"), root, split, fs
        )
        CATALOG.register(split, lambda r=records: r)
    priors = compute_priors(cfg, datasets, meta.thing_classes)
    return cfg, meta, priors


class TestSchedule:
    def test_warmup_multistep(self):
        s = warmup_multistep_schedule(0.1, (100, 200), 0.1, 10, 0.01)
        assert abs(float(s(0)) - 0.001) < 1e-6
        assert abs(float(s(10)) - 0.1) < 1e-6
        assert abs(float(s(150)) - 0.01) < 1e-7
        assert abs(float(s(250)) - 0.001) < 1e-8


class TestTraining:
    def test_train_steps_on_mesh(self, synth_setup):
        cfg, meta, priors = synth_setup
        assert len(jax.devices()) == 8
        model = build_model(cfg, priors=priors)
        mesh = make_mesh()
        trainer = Trainer(cfg, model, mesh=mesh)

        dicts = CATALOG.get("synth_train")
        loader = TrainLoader(dicts, cfg, seed=0)
        sample = next(iter(loader))
        state = trainer.init_state(jax.random.PRNGKey(0), sample)

        # batch really is sharded over the 8 devices
        sharded = shard_batch(sample, mesh)
        assert len(sharded.image.sharding.device_set) == 8

        state, ok = trainer.fit(state, loader, start_iter=0)
        assert ok
        assert int(state.step) == cfg.solver.max_iter
        # metrics were written
        assert os.path.exists(os.path.join(cfg.output_dir, "metrics.json"))

        # overfit sanity: loss must be finite; store for eval test
        TestTraining.trained = (cfg, meta, model, state)

    def test_eval_pipeline(self, synth_setup):
        cfg, meta, model, state = TestTraining.trained
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        infer_fn = jax.jit(lambda b: model.apply(variables, b, train=False))
        records = CATALOG.get("synth_test")
        loader = TestLoader(records, cfg, batch_size=2)
        id_map_inv = {v: k for k, v in meta.thing_dataset_id_to_contiguous_id.items()}
        preds, timing = inference_on_dataset(infer_fn, loader, id_map_inv, warmup=0)
        assert timing["images"] == 4
        gts = gts_from_records(records, id_map_inv)
        assert len(gts) > 0
        helper = Omni3DEvaluationHelper(
            ["synth_test"], meta.thing_classes, meta.thing_dataset_id_to_contiguous_id
        )
        res = helper.evaluate("synth_test", gts, preds)
        # untrained-ish model: AP can be ~0 but the pipeline must produce
        # finite numbers and the right keys
        for k in ("AP2D", "AP3D", "AP3D@15", "AP3D@25", "AP3D@50"):
            assert k in res and np.isfinite(res[k])

    def test_divergence_skip(self, synth_setup):
        """A poisoned (NaN image) batch must not update parameters."""
        cfg, meta, model, state = TestTraining.trained
        trainer = Trainer(cfg, model, mesh=make_mesh())
        trainer.optimizer, trainer.schedule = (
            __import__("threedod.train.solver", fromlist=["build_optimizer"]).build_optimizer(
                cfg, state.params
            )
        )
        step = trainer.make_train_step()
        dicts = CATALOG.get("synth_train")
        loader = TrainLoader(dicts, cfg, batch_size=cfg.solver.ims_per_batch, seed=1)
        batch = next(iter(loader))
        # loader images are uint8 now (NaN would silently truncate);
        # poison through the float path, which the model treats as
        # already-normalised input
        batch = batch.replace(
            image=batch.image.astype(jnp.float32).at[0, 0, 0, 0].set(jnp.nan)
        )
        p_before = jax.device_get(state.params)
        new_state, total, losses, metrics, diverging = step(
            state, shard_batch(batch, trainer.mesh), jax.random.PRNGKey(0),
            jnp.asarray(np.inf, jnp.float32),
        )
        assert bool(diverging)
        p_after = jax.device_get(new_state.params)
        for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(p_after)):
            np.testing.assert_array_equal(a, b)


class TestMeshForBatch:
    def test_shrinks_to_divisor(self):
        from threedod.parallel import make_mesh_for_batch

        assert make_mesh_for_batch(16).devices.size == 8
        assert make_mesh_for_batch(2).devices.size == 2
        assert make_mesh_for_batch(3).devices.size == 3
        assert make_mesh_for_batch(7).devices.size == 7
        assert make_mesh_for_batch(5).devices.size == 5
        assert make_mesh_for_batch(11).devices.size == 1
        assert make_mesh_for_batch(12).devices.size == 6

    def test_shard_batch_replicates_indivisible_leaves(self):
        import jax.numpy as jnp

        from threedod.parallel import make_mesh, shard_batch

        mesh = make_mesh()
        out = shard_batch({"a": jnp.zeros((16, 4)), "b": jnp.zeros((2, 4))}, mesh)
        assert not out["a"].sharding.is_fully_replicated
        assert out["b"].sharding.is_fully_replicated
