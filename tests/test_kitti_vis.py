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
