#!/usr/bin/env python
"""Train / evaluate Cube R-CNN models (TPU-native).

Parity target: tools/train_net.py in the reference — dataset registration,
priors computation, model build, divergence-tolerant training with retries,
periodic evaluation — re-expressed over the jit/mesh trainer.

Usage:
  python tools/train_net.py --config-file configs/Base_Synth.yaml
  python tools/train_net.py --config-file ... --eval-only
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from threedod.config import load_config
from threedod.data import (
    CATALOG,
    Omni3D,
    TestLoader,
    TrainLoader,
    compute_priors,
    get_dataset_dicts,
    get_filter_settings_from_cfg,
    load_omni3d_json,
    register_and_store_model_metadata,
)
from threedod.evaluation import (
    Omni3DEvaluationHelper,
    gts_from_records,
    inference_on_dataset,
)
from threedod.models import build_model
from threedod.train import EventStorage, Trainer
from threedod.train.checkpoint import CheckpointManager
from threedod.parallel import make_mesh_for_batch

logger = logging.getLogger("threedod")


def register_datasets(cfg, names):
    fs = get_filter_settings_from_cfg(cfg)
    root = os.path.join(cfg.datasets.root, "Omni3D")
    for name in names:
        path = os.path.join(root, f"{name}.json")
        records = load_omni3d_json(path, cfg.datasets.root, name, fs)
        CATALOG.register(name, lambda r=records: r)


def setup(args):
    cfg = load_config(args.config_file, args.opts)
    os.makedirs(cfg.output_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s", force=True)

    fs = get_filter_settings_from_cfg(cfg)
    train_paths = [
        os.path.join(cfg.datasets.root, "Omni3D", f"{n}.json") for n in cfg.datasets.train
    ]
    datasets = Omni3D(train_paths, filter_settings=fs)
    meta = register_and_store_model_metadata(datasets, cfg.output_dir, fs)
    if not cfg.datasets.category_names:
        cfg.datasets.category_names = tuple(meta.thing_classes)
    cfg.model.roi_heads.num_classes = len(meta.thing_classes)

    register_datasets(cfg, list(cfg.datasets.train) + list(cfg.datasets.test))
    priors = compute_priors(cfg, datasets, meta.thing_classes)
    return cfg, meta, priors


def do_test(cfg, model, variables, meta, storage=None, iteration=0):
    id_map_inv = {v: k for k, v in meta.thing_dataset_id_to_contiguous_id.items()}
    helper = Omni3DEvaluationHelper(
        list(cfg.datasets.test), meta.thing_classes, meta.thing_dataset_id_to_contiguous_id
    )
    infer_fn = jax.jit(lambda b: model.apply(variables, b, train=False))
    for name in cfg.datasets.test:
        records = get_dataset_dicts([name])
        loader = TestLoader(records, cfg, batch_size=cfg.test.batch_size)
        preds, timing = inference_on_dataset(infer_fn, loader, id_map_inv)
        logger.info(
            "%s: %d preds over %d images (%.3f im/s, %.4f s/iter compute)",
            name, len(preds), timing["images"], timing["images_per_s"],
            timing["s_per_iter_compute"],
        )
        gts = gts_from_records(records, id_map_inv)
        res = helper.evaluate(name, gts, preds)
        logger.info("%s: AP2D %.2f AP3D %.2f (@15 %.2f @25 %.2f @50 %.2f)",
                    name, res["AP2D"], res["AP3D"], res["AP3D@15"], res["AP3D@25"], res["AP3D@50"])
        if cfg.vis_period:
            # eval-sample dumps + error stats (reference train_net.py:95-117)
            from threedod.evaluation.inference import group_predictions_by_image
            from threedod.vis import visualize_from_instances

            id_map = meta.thing_dataset_id_to_contiguous_id
            contig = [
                {**p, "category_id": id_map.get(p["category_id"], p["category_id"])}
                for p in preds
            ]
            grouped = group_predictions_by_image(contig, records)
            log_str = visualize_from_instances(
                grouped, records, name, cfg.input.min_size_test,
                os.path.join(cfg.output_dir, name), list(meta.thing_classes),
                iteration, visualize_every=cfg.vis_period,
            )
            logger.info(log_str.rstrip())
        if storage is not None:
            storage.put_scalars(**{f"{name}/AP2D": res["AP2D"], f"{name}/AP3D": res["AP3D"]})
    results = helper.summarize_all()
    # persist structured results incl. per-category APs — the framework's
    # replacement for the reference's log-scraped result tables
    # (VisualiseGT.py search_file_backwards): tools/visualise_gt.py plots
    # consume <output_dir>/results.json
    import json as _json

    with open(os.path.join(cfg.output_dir, "results.json"), "w") as f:
        _json.dump(results, f, indent=1, default=float)
    return results


def fresh_state(cfg, trainer, sample, key):
    """init_state + ImageNet-trunk / weights_pretrain loading, as one unit.

    The reference rebuilds the *whole* model — including pretrained init —
    on every failed training attempt (train_net.py:456-493), so the retry
    path must apply the same weight loading as attempt 0, not just re-roll
    the random init.
    """
    state = trainer.init_state(key, sample)

    if not cfg.model.weights_pretrain and not cfg.model.weights:
        # ImageNet trunk init (reference `imagenet_pretrain = WEIGHTS_PRETRAIN
        # + WEIGHTS == ''`, backbone/resnet.py:60 etc.): load a cached
        # torchvision/DLA trunk checkpoint if one is present in the zoo dir.
        from threedod.utils.model_zoo import imagenet_trunk_path, load_trunk_weights

        trunk_path = imagenet_trunk_path(cfg.model.backbone)
        if trunk_path:
            loaded = load_trunk_weights(
                trunk_path,
                cfg.model.backbone,
                {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)},
            )
            state = state.replace(
                params=jax.tree.map(jnp.asarray, loaded["params"]),
                batch_stats=jax.tree.map(jnp.asarray, loaded["batch_stats"]),
            )
            logger.info("initialised %s trunk from %s", cfg.model.backbone, trunk_path)

    if cfg.model.weights_pretrain:
        # model-only load, no checkpointables (reference train_net.py:149-152)
        from threedod.utils.model_zoo import load_model_weights

        loaded = load_model_weights(
            cfg.model.weights_pretrain,
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)},
        )
        state = state.replace(
            params=jax.tree.map(jnp.asarray, loaded["params"]),
            # checkpoints without batch_stats (e.g. GN-only models saved by
            # older tools) keep the freshly initialized stats rather than
            # wiping them to {} — a BN-bearing model would fail at apply time
            batch_stats=jax.tree.map(
                jnp.asarray,
                loaded.get("batch_stats") or jax.device_get(state.batch_stats),
            ),
        )
        logger.info("loaded pretrain weights from %s", cfg.model.weights_pretrain)
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    cfg, meta, priors = setup(args)
    model = build_model(cfg, priors=priors)
    mesh = make_mesh_for_batch(cfg.solver.ims_per_batch)
    trainer = Trainer(cfg, model, mesh=mesh)

    train_dicts = get_dataset_dicts(cfg.datasets.train)
    # weak Cube R-CNN consumes depth/ground maps + precomputed object masks
    load_maps = cfg.model.meta_architecture == "RCNN3DCombined"
    k_steps = max(1, int(cfg.solver.steps_per_dispatch))
    loader = TrainLoader(
        train_dicts, cfg, seed=cfg.seed, load_maps=load_maps,
        steps_per_batch=k_steps,
    )
    sample = next(iter(loader))
    if k_steps > 1:
        # superbatch (K, B, ...) — init wants one step's batch
        from threedod.data.batch import split_superbatch

        sample = split_superbatch(sample, k_steps)[0]
    state = fresh_state(cfg, trainer, sample, jax.random.PRNGKey(cfg.seed))
    start_iter = 0

    ckpt = CheckpointManager(cfg.output_dir, cfg.solver.checkpoint_period, cfg.solver.max_iter)
    if args.resume or args.eval_only:
        abstract = {"state": jax.device_get(state), "iteration": 0}
        restored = ckpt.resume_or_load(abstract, resume=True)
        if restored is not None:
            state = jax.device_put(restored["state"])
            start_iter = int(restored["iteration"]) + 1
            logger.info("resumed from iteration %d", start_iter)
        elif cfg.model.weights:
            # no output-dir checkpoint: load MODEL.WEIGHTS — the reference's
            # DetectionCheckpointer.resume_or_load(cfg.MODEL.WEIGHTS)
            # (train_net.py:400-406). Accepts zoo .pth (converted through
            # convert_cubercnn_rcnn3d) or an orbax dir; this is the
            # one-command real-weights drill: point model.weights at
            # model_final.pth and run --eval-only (docs/MODEL_ZOO.md).
            from threedod.utils.model_zoo import load_model_weights

            loaded = load_model_weights(
                cfg.model.weights,
                {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)},
            )
            state = state.replace(
                params=jax.tree.map(jnp.asarray, loaded["params"]),
                batch_stats=jax.tree.map(
                    jnp.asarray,
                    loaded.get("batch_stats")
                    or jax.device_get(state.batch_stats),
                ),
            )
            logger.info("loaded eval weights from %s", cfg.model.weights)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.eval_only:
        results = do_test(cfg, model, variables, meta)
        print(results)
        return

    storage = EventStorage(cfg.output_dir, use_wandb=cfg.log)

    def eval_fn(st, it, storage_):
        v = {"params": st.params, "batch_stats": st.batch_stats}
        do_test(cfg, model, v, meta, storage_, it)

    attempt = 0
    while attempt < cfg.max_training_attempts:
        state, ok = trainer.fit(state, loader, start_iter=start_iter, eval_fn=eval_fn, storage=storage)
        if ok:
            break
        attempt += 1
        abstract = {"state": jax.device_get(state), "iteration": 0}
        restored = ckpt.resume_or_load(abstract, resume=True)
        if restored is not None:
            state = jax.device_put(restored["state"])
            start_iter = int(restored["iteration"]) + 1
        else:
            # No checkpoint yet: the reference rebuilds the model from
            # scratch on a failed attempt (train_net.py:456-493) — including
            # pretrained trunk/pretrain weights. Reusing the diverged
            # in-memory state would replay NaN parameters forever; vary the
            # init key per attempt so retries take a new trajectory.
            state = fresh_state(
                cfg, trainer, sample,
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), attempt),
            )
            start_iter = 0
            logger.info("attempt %d: no checkpoint yet — fresh re-init", attempt)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    results = do_test(cfg, model, variables, meta)
    print(results)


if __name__ == "__main__":
    main()
