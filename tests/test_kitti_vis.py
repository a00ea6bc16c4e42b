"""KITTI interop + visualisation tests."""
import numpy as np
import jax.numpy as jnp

from threedod.data.kitti import (
    calculate_alpha,
    detection_to_kitti_line,
    export_predictions_to_kitti,
    make_dummy_dataset,
    pose_to_ry,
)
from threedod.geometry import cuboid_verts, euler_to_matrix
from threedod.vis import draw_scene_view, print_ap_analysis_table, print_omni_summary


class TestKitti:
    def test_alpha_golden_rows(self):
        """Golden values from the reference's own test (Omni_to_kitti.py:49-83)."""
        cases = [
            ([-3.67, 1.67, 6.05], -1.24, -0.72),
            ([-9.48, 2.08, 26.41], 1.77, 2.11),
            ([4.19, 1.46, 44.41], -1.35, -1.45),
            ([-6.41, 2.04, 46.74], 1.68, 1.82),
            ([0.28, 2.08, 17.74], -1.58, -1.59),
            ([-3.21, 1.97, 11.22], -0.13, 0.15),
        ]
        # the reference rows come from rounded KITTI labels; its own assert
        # (atol=0.01) is commented out — 0.03 absorbs the label rounding
        for loc, ry, expected in cases:
            assert abs(calculate_alpha(loc, ry) - expected) < 0.03, (loc, ry)

    def test_pose_to_ry_roundtrip(self):
        for ry in [-2.0, -0.5, 0.0, 0.7, 2.8]:
            R = np.asarray(euler_to_matrix(jnp.asarray([0.0, ry, 0.0])))
            # euler_to_matrix yaw convention: Ry(theta) rotates x->... check sign
            got = pose_to_ry(R)
            assert abs(np.arctan2(np.sin(got - ry), np.cos(got - ry))) < 1e-4 or \
                   abs(np.arctan2(np.sin(got + ry), np.cos(got + ry))) < 1e-4

    def test_kitti_line_format(self):
        line = detection_to_kitti_line(
            "car", [10, 20, 100, 80], [1.6, 1.5, 3.9], [2.0, 1.0, 15.0], np.eye(3), score=0.8
        )
        parts = line.split(" ")
        assert parts[0] == "Car"
        assert len(parts) == 16
        # y location shifted to bottom center (+h/2)
        assert abs(float(parts[12]) - (1.0 + 1.5 / 2)) < 1e-6

    def test_export_files(self, tmp_path):
        preds = [
            {
                "image_id": 7, "category_id": 1, "bbox": [0, 0, 50, 40], "score": 0.9,
                "dimensions": [1.6, 1.5, 3.9], "center_cam": [0, 1, 10],
                "pose": np.eye(3).tolist(),
            }
        ]
        out = export_predictions_to_kitti(preds, {1: "car"}, str(tmp_path / "kitti"))
        import os

        assert os.path.exists(os.path.join(out, "000007.txt"))

    def test_make_dummy(self, tmp_path):
        import json

        src = tmp_path / "src.json"
        src.write_text(json.dumps({"images": [{"id": 1}], "annotations": [{"id": 2}], "categories": []}))
        out = make_dummy_dataset(str(src), str(tmp_path / "dummy.json"))
        with open(out) as f:
            d = json.load(f)
        assert d["annotations"] == [] and len(d["images"]) == 1

    def test_copy_val_split(self, tmp_path):
        """kitti_split.py parity: copies listed stems, skips missing."""
        import os

        from threedod.data.kitti import copy_val_split

        src = tmp_path / "training" / "image_2"
        os.makedirs(src)
        for stem in ("000001", "000003"):
            (src / f"{stem}.png").write_bytes(b"img")
        (tmp_path / "val.txt").write_text("000001\n000002\n000003\n\n")
        copied = copy_val_split(
            str(tmp_path / "val.txt"), str(src), str(tmp_path / "val" / "image_2")
        )
        assert copied == ["000001.png", "000003.png"]  # 000002 missing -> skipped
        assert sorted(os.listdir(tmp_path / "val" / "image_2")) == copied

    def test_overwrite_pred_z_golden(self, tmp_path):
        """kitti_pred_overwrite_z.py parity: IoU>=0.7 matches donate gt z
        (field 13); skipped-gt categories must not shift the z assignment
        (the documented index-alignment fix)."""
        import os

        from threedod.data.kitti import overwrite_pred_z, overwrite_pred_z_dir

        def row(cat, trunc, box, z):
            x1, y1, x2, y2 = box
            return (
                f"{cat} {trunc:.2f} 0 -0.2 {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
                f"1.50 1.60 3.90 2.00 1.00 {z:.2f} 0.10"
            )

        # gt: a skipped DontCare FIRST, then two real cars
        gt = [
            row("DontCare", 0.0, (0, 0, 10, 10), 99.0),
            row("Car", 0.0, (10, 10, 110, 90), 17.30),
            row("Car", 1.0, (300, 50, 400, 120), 55.0),  # truncation 1.00 -> skipped
            row("Car", 0.0, (200, 40, 290, 100), 31.25),
        ]
        dt = [
            row("Car", 0.0, (12, 12, 108, 88), 5.0) + " 0.9",   # matches gt[1]
            row("Car", 0.0, (198, 41, 292, 99), 6.0) + " 0.8",  # matches gt[3]
            row("Car", 0.0, (600, 10, 650, 60), 7.0) + " 0.7",  # no match
        ]
        out = overwrite_pred_z([d + "\n" for d in dt], [g + "\n" for g in gt])
        zs = [o.split()[13] for o in out]
        assert zs == ["17.30", "31.25", "7.00"], zs
        # scores survive untouched
        assert [o.split()[15] for o in out] == ["0.9", "0.8", "0.7"]

        # directory driver rewrites in place
        pred_dir, gt_dir = tmp_path / "pred", tmp_path / "gt"
        os.makedirs(pred_dir), os.makedirs(gt_dir)
        (pred_dir / "000001.txt").write_text("\n".join(dt) + "\n")
        (gt_dir / "000001.txt").write_text("\n".join(gt) + "\n")
        (pred_dir / "000002.txt").write_text("")  # empty dt -> untouched
        (gt_dir / "000002.txt").write_text("\n".join(gt) + "\n")
        n = overwrite_pred_z_dir(str(pred_dir), str(gt_dir))
        assert n == 1
        got = (pred_dir / "000001.txt").read_text().splitlines()
        assert [g.split()[13] for g in got] == ["17.30", "31.25", "7.00"]


class TestVis:
    def test_draw_scene_view(self):
        img = np.zeros((96, 128, 3), np.uint8)
        K = np.array([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]])
        corners = np.asarray(cuboid_verts(jnp.asarray([[0.0, 0, 4, 1, 1, 1], [1.0, 0, 6, 1, 1, 1]])))
        out = draw_scene_view(img, K, corners, labels=[1, 2], scores=[0.9, 0.5])
        assert out.width == 128 + 96 and out.height == 96  # front + BEV
        assert np.asarray(out).sum() > 0  # something was drawn

    def test_tables(self, capsys):
        results = {
            "synth_test": {"AP2D": 50.0, "AP3D": 30.0, "AP3D@15": 40.0, "AP3D@25": 30.0,
                           "AP3D@50": 10.0, "AP3D_near": 35.0, "AP3D_med": 20.0, "AP3D_far": 5.0},
        }
        print_ap_analysis_table(results)
        print_omni_summary(results)
        out = capsys.readouterr().out
        assert "synth_test" in out and "30.00" in out
