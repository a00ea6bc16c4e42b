"""Data layer tests: synth fixture -> Omni3D loader -> mapper -> batches."""
import os

import numpy as np
import pytest

from threedod.config import Config, load_config, merge_from_list
from threedod.data import (
    CATALOG,
    Batch,
    DatasetMapper3D,
    Omni3D,
    TestLoader,
    TrainLoader,
    collate,
    compute_priors,
    generate_synth_dataset,
    get_dataset_dicts,
    get_filter_settings_from_cfg,
    get_omni3d_categories,
    load_omni3d_json,
    register_and_store_model_metadata,
    simple_register,
)
from threedod.data.synth import SYNTH_CATEGORIES


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("datasets"))
    generate_synth_dataset(root=root, splits=(("train", 6), ("test", 3)), write_maps=True)
    return root


@pytest.fixture(scope="module")
def cfg():
    c = Config()
    c.datasets.category_names = tuple(sorted(SYNTH_CATEGORIES))
    c.model.roi_heads.num_classes = len(SYNTH_CATEGORIES)
    c.shapes.max_gt = 16
    return c


@pytest.fixture(scope="module")
def registered(synth_root, cfg, tmp_path_factory):
    CATALOG.clear()
    fs = get_filter_settings_from_cfg(cfg)
    datasets = Omni3D(
        [os.path.join(synth_root, "Omni3D", "synth_train.json")], filter_settings=fs
    )
    outdir = str(tmp_path_factory.mktemp("out"))
    meta = register_and_store_model_metadata(datasets, outdir, fs)

    for split in ("synth_train", "synth_test"):
        records = load_omni3d_json(
            os.path.join(synth_root, "Omni3D", f"{split}.json"),
            synth_root,
            split,
            fs,
        )
        CATALOG.register(split, lambda r=records: r)
    return datasets, meta


class TestOmni3DLoader:
    def test_merge_and_filter(self, registered):
        datasets, meta = registered
        assert len(meta.thing_classes) == len(SYNTH_CATEGORIES)
        assert len(datasets.dataset["annotations"]) > 0
        # id map is contiguous 0..C-1
        assert sorted(meta.thing_dataset_id_to_contiguous_id.values()) == list(
            range(len(SYNTH_CATEGORIES))
        )

    def test_records(self, registered):
        records = CATALOG.get("synth_train")
        assert len(records) == 6
        r = records[0]
        assert os.path.exists(r["file_name"])
        assert "annotations" in r and len(r["annotations"]) >= 3
        a = r["annotations"][0]
        assert a["category_id"] >= 0
        assert len(a["bbox"]) == 4 and a["bbox"][2] > 0
        assert "depth_image_path" in r and os.path.exists(r["depth_image_path"])
        assert "ground_image_path" in r

    def test_categories_builtin(self):
        assert len(get_omni3d_categories("omni3d")) == 50
        assert len(get_omni3d_categories("omni3d_out")) == 11
        assert len(get_omni3d_categories("KITTI_train")) == 5
        assert "chair" in get_omni3d_categories("synth_train")


class TestMapper:
    def test_shapes_and_projection(self, registered, cfg):
        records = CATALOG.get("synth_train")
        mapper = DatasetMapper3D(cfg, is_train=False)
        s = mapper(records[0])
        assert s["image"].shape == (cfg.shapes.canvas_height, cfg.shapes.canvas_width, 3)
        nh, nw = s["image_hw"]
        assert nh <= cfg.shapes.canvas_height and nw <= cfg.shapes.canvas_width
        # projected 2D center (u,v) should be inside the resized image extent
        uv = s["gt_boxes3d"][:, :2]
        assert (uv[:, 0] > -nw * 0.5).all() and (uv[:, 0] < nw * 1.5).all()
        # z > 0
        assert (s["gt_boxes3d"][:, 2] > 0).all()
        # scale ratio consistency: orig_h / network_h
        assert abs(s["im_scale_ratio"] - s["height"] / nh) < 1e-6

    def test_flip_mirrors_pose(self, registered, cfg):
        records = CATALOG.get("synth_train")
        rng = np.random.RandomState(0)
        mapper = DatasetMapper3D(cfg, is_train=True, rng=rng)
        # force flip by trying until one happens; pose determinant stays +1
        for _ in range(20):
            s = mapper(records[0])
            dets = np.linalg.det(s["gt_poses"])
            np.testing.assert_allclose(dets, 1.0, atol=1e-4)

    def test_maps_loaded(self, registered, cfg):
        records = CATALOG.get("synth_train")
        mapper = DatasetMapper3D(cfg, is_train=False, load_maps=True)
        s = mapper(records[0])
        assert s["depth_map"].shape == (cfg.shapes.canvas_height, cfg.shapes.canvas_width)
        nh, nw = s["image_hw"]
        assert s["depth_map"][:nh, :nw].max() > 1.0  # depths in meters
        assert s["ground_map"].max() == 1.0


class TestLoaders:
    def test_train_loader_batches(self, registered, cfg):
        dicts = get_dataset_dicts(["synth_train"])
        loader = TrainLoader(dicts, cfg, batch_size=2, seed=0)
        it = iter(loader)
        batch = next(it)
        assert isinstance(batch, Batch)
        assert batch.image.shape == (2, cfg.shapes.canvas_height, cfg.shapes.canvas_width, 3)
        assert batch.gt.boxes2d.shape == (2, cfg.shapes.max_gt, 4)
        assert bool(batch.gt.valid.any())
        # valid slots have non-negative classes (synth has no ignores)
        valid = np.asarray(batch.gt.valid)
        classes = np.asarray(batch.gt.classes)
        assert (classes[valid] >= 0).all()

    def test_test_loader_padding(self, registered, cfg):
        dicts = get_dataset_dicts(["synth_test"])
        loader = TestLoader(dicts, cfg, batch_size=2)
        seen = 0
        for batch, n_real in loader:
            assert batch.image.shape[0] == 2
            seen += n_real
        assert seen == 3


class TestPriors:
    def test_compute_priors(self, registered, cfg):
        datasets, meta = registered
        priors = compute_priors(cfg, datasets, meta.thing_classes)
        C = len(meta.thing_classes)
        assert np.asarray(priors["priors_dims_per_cat"]).shape == (C, 2, 3)
        # chair mean height should be near the synth spec 0.95 (±25% jitter)
        ci = meta.thing_classes.index("chair")
        mean_dims = priors["priors_dims_per_cat"][ci][0]
        assert 0.6 < mean_dims[1] < 1.3

    def test_cluster_bins(self, registered, cfg):
        datasets, meta = registered
        priors = compute_priors(cfg, datasets, meta.thing_classes, n_bins=3)
        assert len(priors["priors_bins"]) == len(meta.thing_classes)
        cat, scales, zbins = priors["priors_bins"][0]
        assert len(scales) == 3 and len(zbins) == 3


class TestConfig:
    def test_defaults_and_overrides(self):
        c = Config()
        merge_from_list(c, ["model.backbone", "resnet34", "solver.base_lr=0.1"])
        assert c.model.backbone == "resnet34"
        assert c.solver.base_lr == 0.1

    def test_yaml_base_inheritance(self, tmp_path):
        base = tmp_path / "Base.yaml"
        base.write_text("model:\n  backbone: dla34\nsolver:\n  base_lr: 0.02\n")
        child = tmp_path / "Child.yaml"
        child.write_text("_BASE_: Base.yaml\nsolver:\n  base_lr: 0.04\n")
        cfg = load_config(str(child))
        assert cfg.model.backbone == "dla34"
        assert cfg.solver.base_lr == 0.04

    def test_unknown_key_raises(self, tmp_path):
        bad = tmp_path / "Bad.yaml"
        bad.write_text("model:\n  not_a_key: 1\n")
        with pytest.raises(KeyError):
            load_config(str(bad))


class TestObjectMaskPipeline:
    """Precomputed per-GT instance masks: synth emission -> loader path
    attach -> mapper quarter-grid load -> batch.gt.masks."""

    def test_synth_writes_and_mapper_loads(self, tmp_path):
        from threedod.config import Config
        from threedod.data import (
            generate_synth_dataset,
            get_filter_settings_from_cfg,
            load_omni3d_json,
        )
        from threedod.data.mapper import DatasetMapper3D
        from threedod.data.batch import collate

        root = str(tmp_path)
        generate_synth_dataset(root=root, splits=(("om_train", 2),), write_maps=True)
        assert os.path.isdir(os.path.join(root, "object_masks"))

        from threedod.data.synth import SYNTH_CATEGORIES

        cfg = Config()
        cfg.shapes.canvas_height = 96
        cfg.shapes.canvas_width = 128
        cfg.input.min_size_train = (96,)
        cfg.input.min_size_test = 96
        cfg.datasets.category_names = tuple(sorted(SYNTH_CATEGORIES))
        fs = get_filter_settings_from_cfg(cfg)
        from threedod.data import Omni3D, register_and_store_model_metadata

        ds = Omni3D([os.path.join(root, "Omni3D", "synth_om_train.json")], filter_settings=fs)
        register_and_store_model_metadata(ds, root, fs)
        records = load_omni3d_json(
            os.path.join(root, "Omni3D", "synth_om_train.json"), root, "synth_om_train", fs
        )
        assert records
        assert all("object_masks_path" in r for r in records)
        assert all("ann_id" in a for r in records for a in r["annotations"])

        mapper = DatasetMapper3D(cfg, is_train=True, load_maps=True)
        sample = mapper(records[0])
        gm = sample["gt_masks"]
        n_annos = len(records[0]["annotations"])
        assert gm.shape == (n_annos, 24, 32)  # canvas/4 grid
        # real hull masks, not box fills: at least one mask non-rectangular
        assert gm.max() == 1.0

        batch = collate([sample], max_gt=8)
        assert batch.gt.masks.shape == (1, 8, 24, 32)

    def test_missing_npz_falls_back_to_box_fill(self, tmp_path):
        from threedod.config import Config
        from threedod.data import (
            generate_synth_dataset,
            get_filter_settings_from_cfg,
            load_omni3d_json,
        )
        from threedod.data.mapper import DatasetMapper3D

        root = str(tmp_path)
        generate_synth_dataset(root=root, splits=(("om2_train", 1),), write_maps=True)
        # delete the mask assets -> loader won't attach the path
        import shutil

        shutil.rmtree(os.path.join(root, "object_masks"))
        from threedod.data.synth import SYNTH_CATEGORIES

        cfg = Config()
        cfg.shapes.canvas_height = 96
        cfg.shapes.canvas_width = 128
        cfg.input.min_size_train = (96,)
        cfg.input.min_size_test = 96
        cfg.datasets.category_names = tuple(sorted(SYNTH_CATEGORIES))
        fs = get_filter_settings_from_cfg(cfg)
        from threedod.data import Omni3D, register_and_store_model_metadata

        ds = Omni3D([os.path.join(root, "Omni3D", "synth_om2_train.json")], filter_settings=fs)
        register_and_store_model_metadata(ds, root, fs)
        records = load_omni3d_json(
            os.path.join(root, "Omni3D", "synth_om2_train.json"), root, "synth_om2_train", fs
        )
        assert records
        mapper = DatasetMapper3D(cfg, is_train=False, load_maps=True)
        sample = mapper(records[0])
        gm = sample["gt_masks"]
        # box-rectangle fallback: each mask's bounding box ~ its 2D box / 4
        for i, b in enumerate(sample["gt_boxes2d"]):
            ys, xs = np.nonzero(gm[i])
            if len(ys) == 0:
                continue
            assert abs(xs.min() - b[0] / 4) <= 1.5
            assert abs(xs.max() - (b[2] / 4 - 1)) <= 1.5


import jax.numpy as jnp


class TestWireDtypes:
    def test_uint8_and_prenormalized_float_paths_agree(self):
        from threedod.config import Config
        from threedod.data.batch import normalize_image

        cfg = Config()
        rng = np.random.RandomState(0)
        raw = rng.randint(0, 256, (2, 8, 10, 3)).astype(np.uint8)
        mean = np.asarray(cfg.model.pixel_mean, np.float32)
        std = np.asarray(cfg.model.pixel_std, np.float32)
        pre = (raw.astype(np.float32) - mean) / std
        a = np.asarray(normalize_image(jnp.asarray(raw), cfg.model))
        b = np.asarray(normalize_image(jnp.asarray(pre), cfg.model))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_uint8_canvas_padding_is_zero_in_normalized_space(self):
        # reference (Detectron2 ImageList) normalizes then zero-pads: the
        # pad region must be 0 after normalization, not (0 - mean) / std
        from threedod.config import Config
        from threedod.data.batch import normalize_image

        cfg = Config()
        rng = np.random.RandomState(1)
        raw = rng.randint(0, 256, (2, 8, 10, 3)).astype(np.uint8)
        raw[0, 6:, :, :] = 0  # canvas padding rows for image 0 (hw = 6x10)
        raw[1, :, 7:, :] = 0  # canvas padding cols for image 1 (hw = 8x7)
        hw = np.asarray([[6, 10], [8, 7]], np.int32)
        out = np.asarray(normalize_image(jnp.asarray(raw), cfg.model, jnp.asarray(hw)))
        assert np.all(out[0, 6:] == 0.0)
        assert np.all(out[1, :, 7:] == 0.0)
        # valid region matches the plain normalization, stored at the
        # model's compute dtype (bf16 for the default config since round 5
        # — the arithmetic is f32, only the store rounds)
        mean = np.asarray(cfg.model.pixel_mean, np.float32)
        std = np.asarray(cfg.model.pixel_std, np.float32)
        expect = (raw[0, :6].astype(np.float32) - mean) / std
        if cfg.model.dtype == "bfloat16":
            expect = np.asarray(jnp.asarray(expect).astype(jnp.bfloat16))
            assert out.dtype == np.dtype("float32") or str(out.dtype) == "bfloat16"
        np.testing.assert_allclose(
            out[0, :6].astype(np.float32), expect.astype(np.float32), atol=1e-5
        )

    def test_collate_ships_compact_dtypes(self):
        from threedod.config import Config
        from threedod.data.batch import collate

        cfg = Config()
        s = {
            "image": np.zeros((16, 16, 3), np.uint8),
            "image_hw": np.asarray([16, 16]),
            "K": np.eye(3, dtype=np.float32),
            "im_scale_ratio": 1.0,
            "image_id": 1,
            "gt_boxes2d": np.zeros((1, 4), np.float32),
            "gt_classes": np.zeros((1,), np.int32),
            "gt_boxes3d": np.zeros((1, 9), np.float32),
            "gt_poses": np.eye(3, dtype=np.float32)[None],
            "gt_masks": np.ones((1, 4, 4), np.float32),
            "depth_map": np.full((16, 16), 3.0, np.float32),
            "ground_map": np.ones((16, 16), np.float32),
        }
        batch = collate([s, s], max_gt=4, with_maps=True)
        assert batch.image.dtype == jnp.uint8
        assert batch.depth_map.dtype == jnp.float16
        assert batch.ground_map.dtype == jnp.uint8
        assert batch.gt.masks.dtype == jnp.uint8
