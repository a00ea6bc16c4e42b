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


@pytest.fixture(scope="module")
def trained(synth_setup):
    """Fit the small RCNN3D once per module; shared by the eval/divergence/
    flat-optimizer tests (previously a TestTraining class attribute, which
    made those tests unrunnable standalone and order-coupled)."""
    cfg, meta, priors = synth_setup
    model = build_model(cfg, priors=priors)
    trainer = Trainer(cfg, model, mesh=make_mesh())
    dicts = CATALOG.get("synth_train")
    loader = TrainLoader(dicts, cfg, seed=0)
    sample = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    state, ok = trainer.fit(state, loader, start_iter=0)
    assert ok
    assert int(state.step) == cfg.solver.max_iter
    return cfg, meta, model, state


class TestTraining:
    def test_train_steps_on_mesh(self, synth_setup, trained):
        cfg, meta, model, state = trained
        assert len(jax.devices()) == 8

        # batch really is sharded over the 8 devices
        dicts = CATALOG.get("synth_train")
        loader = TrainLoader(dicts, cfg, seed=0)
        sample = next(iter(loader))
        sharded = shard_batch(sample, make_mesh())
        assert len(sharded.image.sharding.device_set) == 8

        assert int(state.step) == cfg.solver.max_iter
        # metrics were written
        assert os.path.exists(os.path.join(cfg.output_dir, "metrics.json"))

    def test_k_step_chain_exact_on_deterministic_model(self, tmp_path):
        """Chain mechanics are EXACTLY K sequential steps on a model with no
        discrete selection: per-step RNG folding, stabilizer rolling-mean
        propagation, and the in-chain divergence skip all ride TrainState.

        (The full RCNN3D comparison below is necessarily loose: Gumbel
        top-k ROI sampling turns ~1e-7 cross-program float noise between
        the scan-body compile and the standalone compile into discretely
        different sampled ROI sets after the first step.)"""
        import copy
        from flax import linen as nn
        from threedod.config import Config
        from threedod.data.batch import Batch, split_superbatch
        from threedod.parallel.mesh import shard_superbatch

        class Toy(nn.Module):
            @nn.compact
            def __call__(self, batch, train=False):
                w = self.param("w", nn.initializers.ones, (4,))
                noise = jax.random.normal(self.make_rng("sampling"), (4,)) * 0.01
                x = batch.image.astype(jnp.float32).mean()
                loss = ((w + noise).sum() - x) ** 2
                return {"toy": loss}, {"metric/x": x}

        cfg = Config()
        cfg.output_dir = str(tmp_path)
        cfg.model.use_bn = False
        cfg.solver.type = "sgd"
        cfg.solver.base_lr = 0.01
        cfg.solver.warmup_iters = 0
        cfg.solver.ims_per_batch = 8

        K = 5
        rng = np.random.RandomState(0)
        img = rng.rand(K, 8, 8, 8, 3).astype(np.float32)
        img[2] = np.nan  # step 2 must divergence-skip inside the chain
        sb = Batch(
            image=img,
            image_hw=np.full((K, 8, 2), 8, np.int32),
            K=np.tile(np.eye(3, dtype=np.float32), (K, 8, 1, 1)),
            im_scale_ratio=np.ones((K, 8), np.float32),
            image_id=np.zeros((K, 8), np.int32),
        )
        singles = split_superbatch(sb, K)

        mesh = make_mesh()
        trainer = Trainer(cfg, Toy(), mesh=mesh)
        base_key = jax.random.PRNGKey(cfg.seed)

        stateA = trainer.init_state(jax.random.PRNGKey(0), singles[0])
        step = trainer.make_train_step()
        packedA = []
        for b in singles:
            stateA, out = step(stateA, shard_batch(b, mesh), base_key)
            packedA.append(np.asarray(jax.device_get(out.packed)))
        packedA = np.stack(packedA)

        stateB = trainer.init_state(jax.random.PRNGKey(0), singles[0])
        chain = trainer.make_train_step_k(K)
        stateB, packedB = chain(stateB, shard_superbatch(sb, mesh), base_key)
        packedB = np.asarray(jax.device_get(packedB))

        # step 2 was skipped (divergence flag set), later steps continued
        assert packedB[2, 1] > 0.5 and packedB[3, 1] < 0.5
        np.testing.assert_allclose(packedA, packedB, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(
            jax.device_get(stateA.params)["w"], jax.device_get(stateB.params)["w"],
            rtol=1e-6,
        )
        assert int(stateA.step) == int(stateB.step) == K

    def test_k_step_chain_on_rcnn3d(self, synth_setup):
        """K-chain on the real model: first step matches the single-step
        program tightly; the whole chain runs finite to step K. (Cross-step
        exactness is certified on the deterministic toy above — RCNN3D's
        sampled ROI sets amplify cross-program float noise discretely.)"""
        cfg, meta, priors = synth_setup
        from threedod.data.batch import split_superbatch
        from threedod.parallel.mesh import shard_superbatch

        K = 4
        model = build_model(cfg, priors=priors)
        mesh = make_mesh()
        dicts = CATALOG.get("synth_train")
        loader = TrainLoader(dicts, cfg, seed=1, steps_per_batch=K)
        sb = next(iter(loader))  # numpy-leaf (K, B, ...) superbatch
        assert isinstance(sb.image, np.ndarray) and sb.image.shape[0] == K
        singles = split_superbatch(sb, K)

        trainer = Trainer(cfg, model, mesh=mesh)
        base_key = jax.random.PRNGKey(cfg.seed)

        stateA = trainer.init_state(jax.random.PRNGKey(0), singles[0])
        step = trainer.make_train_step()
        stateA, out0 = step(stateA, shard_batch(singles[0], mesh), base_key)
        packed0 = np.asarray(jax.device_get(out0.packed))

        stateB = trainer.init_state(jax.random.PRNGKey(0), singles[0])
        chain = trainer.make_train_step_k(K)
        stateB, packedB = chain(stateB, shard_superbatch(sb, mesh), base_key)
        packedB = np.asarray(jax.device_get(packedB))

        np.testing.assert_allclose(packed0, packedB[0], rtol=2e-4, atol=2e-5)
        assert np.isfinite(packedB).all()
        assert int(stateB.step) == K

    def test_fit_with_steps_per_dispatch(self, synth_setup, tmp_path):
        """fit() with K>1 runs chains + boundary-tail singles to completion."""
        import copy

        cfg, meta, priors = synth_setup
        cfg2 = copy.deepcopy(cfg)
        cfg2.output_dir = str(tmp_path)
        cfg2.solver.max_iter = 8
        cfg2.solver.steps_per_dispatch = 3  # 8 = 3 + 3 + 2-step tail
        model = build_model(cfg2, priors=priors)
        mesh = make_mesh()
        trainer = Trainer(cfg2, model, mesh=mesh)
        dicts = CATALOG.get("synth_train")
        loader = TrainLoader(dicts, cfg2, seed=0, steps_per_batch=3)
        sample = next(iter(loader))
        from threedod.data.batch import split_superbatch

        state = trainer.init_state(jax.random.PRNGKey(0), split_superbatch(sample, 3)[0])
        state, ok = trainer.fit(state, loader, start_iter=0)
        assert ok
        assert int(state.step) == cfg2.solver.max_iter
        assert os.path.exists(os.path.join(cfg2.output_dir, "metrics.json"))

    def test_eval_pipeline(self, synth_setup, trained):
        cfg, meta, model, state = trained
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

    def test_divergence_skip(self, synth_setup, trained):
        """A poisoned (NaN image) batch must not update parameters."""
        cfg, meta, model, state = trained
        trainer = Trainer(cfg, model, mesh=make_mesh())
        trainer.ensure_optimizer(state.params)
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
        # the step donates its state arg — feed it a copy so the shared
        # class fixture stays alive for later tests
        new_state, out = step(
            jax.tree.map(jnp.array, state), shard_batch(batch, trainer.mesh),
            jax.random.PRNGKey(0),
        )
        assert bool(out.diverging)
        p_after = jax.device_get(new_state.params)
        for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(p_after)):
            np.testing.assert_array_equal(a, b)


def _toy_params(key):
    """A small pytree that exercises every decay-mask rule: conv kernels
    (decay), bn scale/bias and priors buffers (no decay), head bias (decay)."""
    ks = jax.random.split(key, 6)
    return {
        "trunk": {
            "conv": {"kernel": jax.random.normal(ks[0], (3, 3, 4, 8))},
            "bn": {"scale": jax.random.normal(ks[1], (8,)),
                   "bias": jax.random.normal(ks[2], (8,))},
        },
        "head": {"dense": {"kernel": jax.random.normal(ks[3], (8, 5)),
                           "bias": jax.random.normal(ks[4], (5,))}},
        "priors": {"z": jax.random.normal(ks[5], (5, 2))},
    }


class TestFlatOptimizer:
    @pytest.mark.parametrize(
        "opt_type,clip",
        [("sgd", 0.0), ("sgd", 1.0), ("adamw", 1.0), ("adam", 0.0),
         ("adamw+amsgrad", 0.0), ("adam+amsgrad", 0.0)],
    )
    def test_flat_matches_per_leaf_optax(self, opt_type, clip):
        """The flat single-vector optimizer must reproduce the per-leaf
        optax chain over multiple steps: bit-identical with clip off (all
        ops elementwise, including the no-decay mask), ~ulp with clip on
        (the global-norm reduction order differs)."""
        import dataclasses

        from jax.flatten_util import ravel_pytree

        from threedod.train.solver import build_flat_optimizer, build_optimizer

        cfg = Config()
        cfg.solver = dataclasses.replace(
            cfg.solver, type=opt_type, clip_gradients=clip, weight_decay=1e-4,
            warmup_iters=2, steps=(4,),
        )
        params = _toy_params(jax.random.PRNGKey(0))

        per_leaf, _ = build_optimizer(cfg, params)
        flat_opt, _ = build_flat_optimizer(cfg, params)

        p_a = jax.tree.map(jnp.array, params)
        s_a = per_leaf.init(p_a)
        flat_p, unravel = ravel_pytree(jax.tree.map(jnp.array, params))
        s_b = flat_opt.init(flat_p)

        for i in range(6):
            grads = jax.tree.map(
                lambda p, k=jax.random.PRNGKey(100 + i): jax.random.normal(
                    jax.random.fold_in(k, hash(p.shape) % 997), p.shape
                ),
                params,
            )
            u_a, s_a = per_leaf.update(grads, s_a, p_a)
            p_a = jax.tree.map(lambda p, u: p + u, p_a, u_a)
            flat_g, _ = ravel_pytree(grads)
            u_b, s_b = flat_opt.update(flat_g, s_b, flat_p)
            flat_p = flat_p + u_b

        for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(unravel(flat_p))):
            if clip == 0.0:
                np.testing.assert_array_equal(a, b)
            else:
                np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7)

    def test_flat_trainer_step_matches(self, synth_setup, trained):
        """Trainer-level equivalence on the real model (one config — the
        optimizer matrix is covered cheaply above): the flat path's
        grads_finite / param-guard / batch_stats handling must reproduce
        the per-leaf step to ~1 ulp. Not bit-exact: the two programs are
        compiled separately and XLA's fusion choices (e.g. FMA in the
        decay update) differ — observed max deviation 9e-10 absolute on
        1 of 590k elements."""
        from jax.flatten_util import ravel_pytree

        from threedod.train.solver import build_flat_optimizer, build_optimizer

        cfg, meta, model, state = trained
        dicts = CATALOG.get("synth_train")
        loader = TrainLoader(dicts, cfg, batch_size=cfg.solver.ims_per_batch, seed=3)
        batch = next(iter(loader))

        results = {}
        for flat in (False, True):
            trainer = Trainer(cfg, model, mesh=make_mesh())
            trainer.flat_opt = flat
            build = build_flat_optimizer if flat else build_optimizer
            trainer.optimizer, trainer.schedule = build(cfg, state.params)
            if flat:
                opt_state = jax.jit(
                    lambda p: trainer.optimizer.init(ravel_pytree(p)[0])
                )(state.params)
            else:
                opt_state = trainer.optimizer.init(state.params)
            # fresh buffers: the step donates its state argument
            st = jax.tree.map(jnp.array, state).replace(
                opt_state=opt_state, step=jnp.zeros((), jnp.int32)
            )
            step = trainer.make_train_step()
            sb = shard_batch(batch, trainer.mesh)
            flags = []
            for i in range(2):
                st, out = step(st, sb, jax.random.PRNGKey(7 + i))
                flags.append(bool(out.diverging))
            results[flat] = (
                flags, jax.device_get(st.params), jax.device_get(st.batch_stats)
            )

        # the equivalence claim is flat == per-leaf, including the
        # divergence decision (whether the trained fixture's state makes a
        # fresh-optimizer step spike depends on suite ordering — both
        # variants just have to agree on it)
        assert results[False][0] == results[True][0]
        for a, b in zip(
            jax.tree.leaves(results[False][1:]), jax.tree.leaves(results[True][1:])
        ):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=2e-9)


class TestDecayMask:
    def test_norm_and_priors_excluded(self, synth_setup, trained):
        """Reference parity: priors buffers (solver/build.py:44-45) and
        norm-layer weight+bias (detectron2 WEIGHT_DECAY_NORM=0.0) train
        decay-free; conv kernels and head biases keep decay."""
        from threedod.train.solver import _no_decay_mask, flat_decay_mask

        cfg, meta, model, state = trained
        mask = _no_decay_mask(state.params)
        flat = {}
        jax.tree_util.tree_map_with_path(
            lambda path, _leaf, m: flat.setdefault(
                "/".join(str(x.key) for x in path), bool(m)
            ),
            state.params, mask,
        )
        bn = {k: v for k, v in flat.items() if "/bn/" in k}
        priors = {k: v for k, v in flat.items() if "priors" in k}
        kernels = {k: v for k, v in flat.items() if k.endswith("conv/kernel")}
        assert bn and not any(bn.values())
        assert priors and not any(priors.values())
        assert kernels and all(kernels.values())
        # elementwise flat mask agrees with the per-leaf mask
        fm = np.asarray(flat_decay_mask(state.params))
        from jax.flatten_util import ravel_pytree

        sizes = [int(np.prod(l.shape)) for l in jax.tree.leaves(state.params)]
        offs = np.cumsum([0] + sizes)
        for (a, m), o, sz in zip(
            zip(jax.tree.leaves(state.params), jax.tree.leaves(mask)), offs, sizes
        ):
            seg = fm[o : o + sz]
            assert seg.all() if m else not seg.any()


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
