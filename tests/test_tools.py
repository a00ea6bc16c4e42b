"""Integration tests for the CLI drivers (train_net setup/do_test path,
eval_boxes MABO + pseudo-GT) on tiny synth data, CPU platform."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_tiny_cfg(path, root, outdir, extra=""):
    path.write_text(
        f"""
model:
  meta_architecture: RCNN3D
  backbone: shufflenet
  dtype: float32
  rpn:
    pre_nms_topk_train: 128
    pre_nms_topk_test: 128
    post_nms_topk_train: 64
    post_nms_topk_test: 64
    batch_size_per_image: 64
  roi_heads:
    num_classes: 10
    batch_size_per_image: 64
  roi_cube_head:
    number_of_proposals: 64
solver:
  ims_per_batch: 2
  max_iter: 2
  checkpoint_period: 100
  warmup_iters: 1
input:
  min_size_train: [96]
  min_size_test: 96
shapes:
  canvas_height: 96
  canvas_width: 128
  max_gt: 8
  roi_batch: 32
  nms_candidates: 64
  max_detections: 8
  ransac_hypotheses: 100
datasets:
  train: [synth_train]
  test: [synth_test]
test:
  eval_period: 0
output_dir: {outdir}
{extra}
"""
    )


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    from threedod.data import generate_synth_dataset

    generate_synth_dataset(root=str(root), splits=(("train", 4), ("test", 2)), write_maps=True)
    return root


def run_tool(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # the sitecustomize pins axon; strip it for subprocess CPU runs
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        f"import sys, runpy; sys.argv={args!r}; "
        f"runpy.run_path({args[0]!r}, run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1800,
    )


class TestTrainNetCLI:
    def test_train_and_eval(self, tiny_env, tmp_path):
        cfg = tmp_path / "tiny.yaml"
        outdir = tmp_path / "out"
        write_tiny_cfg(cfg, tiny_env, outdir)
        r = run_tool(
            [os.path.join(REPO, "tools/train_net.py"), "--config-file", str(cfg),
             "datasets.root", str(tiny_env)],
            cwd=str(tiny_env),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "AP2D" in r.stdout or "AP2D" in r.stderr
        assert (outdir / "metrics.json").exists()


class TestZooWeightsDrill:
    def test_eval_only_from_zoo_pth(self, tiny_env, tmp_path):
        """The one-command real-weights drill (docs/MODEL_ZOO.md): a
        reference-layout model_final.pth + `--eval-only
        model.weights=<pth>` must convert-on-load and produce an AP table
        — end-to-end through the CLI, using the converter-gate's fake
        checkpoint so nothing depends on real downloads."""
        torch = pytest.importorskip("torch")
        import jax
        import numpy as np

        from _fake_zoo import build_fake_sd
        from threedod.config import load_config
        from threedod.data.batch import Batch
        from threedod.models import build_model

        cfg_path = tmp_path / "tiny_dla.yaml"
        outdir = tmp_path / "out_zoo"
        write_tiny_cfg(cfg_path, tiny_env, outdir)
        cfg_path.write_text(
            cfg_path.read_text().replace("backbone: shufflenet", "backbone: dla34")
        )

        # shape a fake reference checkpoint from the same config's template
        cfg = load_config(str(cfg_path), [])
        cfg.model.dtype = "float32"
        model = build_model(cfg)
        import jax.numpy as jnp

        h, w = cfg.shapes.canvas_height, cfg.shapes.canvas_width
        K = np.tile(np.array([[[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]]], np.float32), (1, 1, 1))
        batch = Batch(
            image=jnp.zeros((1, h, w, 3)),
            image_hw=jnp.asarray([[h, w]], jnp.int32),
            K=jnp.asarray(K),
            im_scale_ratio=jnp.ones((1,)),
            image_id=jnp.zeros((1,), jnp.int32),
        )
        variables = jax.jit(lambda b: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, b, train=False
        ))(batch)
        sd = build_fake_sd(variables["params"], np.random.RandomState(3))
        pth = tmp_path / "model_final.pth"
        torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, str(pth))

        r = run_tool(
            [os.path.join(REPO, "tools/train_net.py"), "--config-file", str(cfg_path),
             "--eval-only", "datasets.root", str(tiny_env),
             f"model.weights={pth}"],
            cwd=str(tiny_env),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "loaded eval weights" in r.stderr or "loaded eval weights" in r.stdout
        results = json.loads((outdir / "results.json").read_text())
        vals = results["synth_test"]
        assert np.isfinite(vals["AP2D"]) and np.isfinite(vals["AP3D"])


class TestEvalBoxesCLI:
    def test_mabo(self, tiny_env, tmp_path):
        cfg = tmp_path / "tiny_boxnet.yaml"
        outdir = tmp_path / "out_boxnet"
        write_tiny_cfg(cfg, tiny_env, outdir, extra="plot:\n  eval: MABO\n  proposal_func: propose\n")
        cfg.write_text(cfg.read_text().replace("meta_architecture: RCNN3D", "meta_architecture: BoxNet"))
        r = run_tool(
            [os.path.join(REPO, "tools/eval_boxes.py"), "--config-file", str(cfg),
             "datasets.root", str(tiny_env)],
            cwd=str(tiny_env),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        out = r.stdout[r.stdout.index("{"):]
        res = json.loads(out)
        assert "MABO_combined" in res
        assert len(res["combinations_mean"]) == 26
        # best-possible curve value must be >= the first-pick value
        assert res["ABO_best_possible_combined"] >= res["MABO_combined"] - 1e-9

    def test_pseudo_gt_generation(self, tiny_env, tmp_path):
        cfg = tmp_path / "tiny_pgt.yaml"
        outdir = tmp_path / "out_pgt"
        write_tiny_cfg(cfg, tiny_env, outdir, extra="train:\n  pseudo_gt: pseudo\nplot:\n  proposal_func: propose\n")
        cfg.write_text(cfg.read_text().replace("meta_architecture: RCNN3D", "meta_architecture: BoxNet"))
        r = run_tool(
            [os.path.join(REPO, "tools/eval_boxes.py"), "--config-file", str(cfg),
             "--pseudo-gt-out", "synth_pseudo", "datasets.root", str(tiny_env)],
            cwd=str(tiny_env),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        out_json = os.path.join(str(tiny_env), "Omni3D", "synth_pseudo.json")
        assert os.path.exists(out_json)
        with open(out_json) as f:
            data = json.load(f)
        assert len(data["annotations"]) > 0
        a = data["annotations"][0]
        for key in ("center_cam", "dimensions", "R_cam", "bbox3D_cam", "score"):
            assert key in a


class TestKittiDemoCLI:
    def test_dataset_inference_json(self, tiny_env, tmp_path):
        cfg = tmp_path / "tiny_kd.yaml"
        outdir = tmp_path / "out_kd"
        write_tiny_cfg(cfg, tiny_env, outdir)
        demo_out = tmp_path / "kd"
        r = run_tool(
            [os.path.join(REPO, "tools/kitti_demo.py"), "--config-file", str(cfg),
             "--dataset", "synth_test", "--threshold", "0.0",
             "--output-dir", str(demo_out),
             "datasets.root", str(tiny_env)],
            cwd=str(tiny_env),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        out_json = demo_out / "synth_test_predictions.json"
        assert out_json.exists()
        data = json.loads(out_json.read_text())
        assert len(data) == 2  # synth_test has 2 images
        for entry in data:
            assert set(entry) >= {"image_id", "K", "width", "height", "predictions"}
            for p in entry["predictions"]:
                assert set(p) >= {"category", "score", "bbox", "center_cam",
                                  "dimensions", "pose", "corners3D"}


class TestWeakTrainCLI:
    def test_weak_train_with_maps_and_masks(self, tiny_env, tmp_path):
        """Weak Cube R-CNN end-to-end through the CLI: depth/ground maps +
        precomputed object masks load, segmentation loss is computed."""
        cfg = tmp_path / "tiny_weak.yaml"
        outdir = tmp_path / "out_weak"
        write_tiny_cfg(
            cfg, tiny_env, outdir,
            extra="loss_functions: [dims, iou, segmentation, z]\n",
        )
        cfg.write_text(cfg.read_text().replace(
            "meta_architecture: RCNN3D", "meta_architecture: RCNN3DCombined"))
        r = run_tool(
            [os.path.join(REPO, "tools/train_net.py"), "--config-file", str(cfg),
             "datasets.root", str(tiny_env)],
            cwd=str(tiny_env),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        metrics = (outdir / "metrics.json").read_text().strip().splitlines()
        rec = json.loads(metrics[-1])
        assert any("loss_seg" in k for k in rec), sorted(rec)
        assert all(np.isfinite(v) for k, v in rec.items() if k.startswith("loss"))


class TestGroundSegCLI:
    def test_heuristic_ground_masks(self, tiny_env, tmp_path):
        """generate_ground_segmentations end-to-end: prompted-box pipeline
        with the heuristic box source + random-init SAM, writes {id}.npz
        masks and the no_ground_idx.csv (filter_ground.py parity)."""
        out_dir = tmp_path / "ground_maps"
        csv_path = tmp_path / "no_ground_idx.csv"
        r = run_tool(
            [os.path.join(REPO, "tools", "generate_ground_segmentations.py"),
             "--dataset-json", os.path.join(str(tiny_env), "Omni3D", "synth_test.json"),
             "--image-root", str(tiny_env),
             "--out-dir", str(out_dir),
             "--no-ground-csv", str(csv_path),
             "--heuristic", "--img-size", "128"],
            cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert csv_path.exists()
        import csv as _csv

        with open(csv_path) as f:
            failures = [row for row in _csv.reader(f)][1:]
        masks = list(out_dir.glob("*.npz")) if out_dir.exists() else []
        # every image either got a mask or a recorded failure
        assert len(masks) + len(failures) == 2
        for m in masks:
            arr = np.load(m)["mask"]
            assert arr.dtype == np.uint8 and arr.ndim == 2


class TestFitProposalCoefs:
    def test_fits_linear_coefficients(self, tiny_env, tmp_path):
        """find_conditions.py parity: collects (median unprojection, gt
        center) pairs and least-squares fits the center-correction
        coefficients per axis."""
        r = run_tool(
            [os.path.join(REPO, "tools", "fit_proposal_coefs.py"),
             "--config-file", os.path.join(REPO, "configs", "BoxNet_Synth.yaml"),
             "--plot-dir", str(tmp_path / "plots"),
             "datasets.root", str(tiny_env)],
            cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        import re

        coefs = re.findall(r"([xyz]): gt = ([+-][\d.]+) \* median ([+-][\d.]+)", r.stdout)
        assert len(coefs) == 3, r.stdout
        for axis, a, b in coefs:
            assert 0.3 < float(a) < 3.0, (axis, a)
        assert (tmp_path / "plots" / "z_values_to_find.png").exists()


class TestRetryReinit:
    def test_failed_attempt_without_checkpoint_reinitializes(self, tiny_env, tmp_path):
        """Regression: a failed attempt before any checkpoint exists must NOT
        reuse the diverged in-memory state (it would replay NaN parameters
        forever) — the reference rebuilds the model (train_net.py:456-493)."""
        r = run_tool(
            [os.path.join(REPO, "tools", "train_net.py"),
             "--config-file", os.path.join(REPO, "configs", "Base_Synth.yaml"),
             "datasets.root", str(tiny_env),
             "output_dir", str(tmp_path / "out"),
             "solver.base_lr", "1e6",          # guaranteed explosion
             "solver.clip_gradients", "0.0",
             "solver.warmup_iters", "0",
             "solver.max_iter", "8",
             "solver.checkpoint_period", "4",
             "model.stabilize", "0.4",
             "max_training_attempts", "2",
             "test.eval_period", "0",
             "shapes.canvas_height", "128", "shapes.canvas_width", "160",
             "input.min_size_train", "[128]", "input.min_size_test", "128",
             "solver.ims_per_batch", "2"],
            cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        log = r.stderr + r.stdout
        assert log.count("!! Restarting training") >= 2, log[-1500:]
        # The diverged-state signature: a retry that inherited NaN params has
        # NaN loss at its FIRST step, so the rolling mean is still the 1e6
        # fallback (trainer.py recent_loss init). A *fresh* attempt with
        # warmup_iters=0 legitimately reaches NaN at step 1 (full lr=1e6
        # applied at step 0) — but against a FINITE rolling mean from its own
        # finite step 0. So: every "loss nan" skip must cite a finite rolling
        # mean, and the 1e6 fallback must never appear with NaN.
        import re as _re

        nan_skips = _re.findall(r"loss nan vs rolling mean ([\d.einf+-]+)", log)
        assert all(
            m != "1000000.00" and m.lower() != "inf" for m in nan_skips
        ), nan_skips
        assert "rolling mean 1000000.00" not in log, log[-1500:]


class TestVisualiseGTCLI:
    def test_stats_and_result_plots(self, tiny_env, tmp_path):
        # fake finished-run artifacts with per-category APs
        for d, base in (("run_a", 20.0), ("run_b", 8.0)):
            os.makedirs(tmp_path / d, exist_ok=True)
            res = {"synth_test": {
                "AP2D": base + 5, "AP3D": base,
                "percat2D": {c: base + i * 3 for i, c in enumerate(["chair", "table", "sofa"])},
                "percat3D": {c: base + i * 2 for i, c in enumerate(["chair", "table", "sofa"])},
            }}
            with open(tmp_path / d / "results.json", "w") as f:
                json.dump(res, f)
        out = tmp_path / "figs"
        r = run_tool(
            [os.path.join(REPO, "tools/visualise_gt.py"),
             "--dataset-json", str(tiny_env / "Omni3D" / "synth_train.json"),
             "--image-root", str(tiny_env),
             "--out-dir", str(out), "--max-images", "1",
             "--run-dirs", str(tmp_path / "run_a"), str(tmp_path / "run_b"),
             "--run-names", "base", "weak"],
            cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        # the reference's figure set (VisualiseGT.py:144-813)
        for fname in (
            "category_distribution.png", "2d_histogram.png", "center.png",
            "dimensions.png", "volume_distribution.png",
            "AP_vs_no_of_classes_all.png", "AP3D_vs_AP2D_all_standard.png",
            "AP3D_vs_AP2D_all_log.png",
        ):
            p = out / fname
            assert p.exists() and p.stat().st_size > 1000, fname


class TestDepthToPointcloud:
    def test_writes_parseable_ply(self, tmp_path):
        import numpy as np
        from PIL import Image

        img_dir = tmp_path / "imgs"
        os.makedirs(img_dir)
        rng = np.random.RandomState(0)
        Image.fromarray(rng.randint(0, 255, (28, 42, 3), np.uint8)).save(img_dir / "a.png")
        out = tmp_path / "pc"
        r = run_tool(
            [os.path.join(REPO, "tools/depth_to_pointcloud.py"),
             "--img-path", str(img_dir), "--outdir", str(out),
             "--encoder", "vits", "--random-weights", "--input-size", "56",
             "--focal-length-x", "40", "--focal-length-y", "40"],
            cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        ply = out / "a.ply"
        assert ply.exists()
        with open(ply, "rb") as f:
            blob = f.read()
        header, _, body = blob.partition(b"end_header\n")
        assert b"element vertex 1176" in header  # 28*42 pixels
        rec = np.frombuffer(body, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
        assert rec.shape == (1176,)
        assert np.isfinite(rec["xyz"]).all()
        # depth (z) strictly positive, colors match the input image
        assert (rec["xyz"][:, 2] > 0).all()
        src = np.asarray(Image.open(img_dir / "a.png")).reshape(-1, 3)
        np.testing.assert_array_equal(rec["rgb"], src)
