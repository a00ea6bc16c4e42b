"""Scene-view rendering tests (VERDICT round-1 item 7).

Covers the host-side software rasterizer (threedod/vis/render.py), the
reference-parity draw_scene_view modes (cubercnn/vis/vis.py:210-546), and
the eval-time visualize_from_instances dumps (:76-198).
"""
from __future__ import annotations

import os

import numpy as np
import pytest

import jax.numpy as jnp

from threedod.geometry.cuboids import cuboid_verts
from threedod.vis import (
    draw_scene_view,
    euler2mat,
    get_color,
    render_cuboids,
    render_scene_views,
    so3_relative_angle,
    visualize_from_instances,
)

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
W, H = 640, 480


def _cross2(a, b):
    """2-D cross product (np.cross on 2-vectors is deprecated in numpy 2)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _corners(boxes, Rs=None):
    b = jnp.asarray(boxes, jnp.float32)
    r = None if Rs is None else jnp.asarray(Rs, jnp.float32)
    if r is None:
        r = jnp.tile(jnp.eye(3)[None], (len(boxes), 1, 1))
    return np.asarray(cuboid_verts(b, r))


def _hull_mask(pts2d, w, h):
    """Independent point-in-convex-hull rasterization (monotone chain)."""
    pts = sorted(map(tuple, pts2d))

    def half(pp):
        out = []
        for p in pp:
            while len(out) >= 2 and _cross2(
                np.subtract(out[-1], out[-2]), np.subtract(p, out[-2])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    hull = np.asarray(half(pts)[:-1] + half(list(reversed(pts)))[:-1])
    gx, gy = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    g = np.stack([gx.ravel(), gy.ravel()], -1)
    inside = np.ones(len(g), bool)
    for i in range(len(hull)):
        a, b = hull[i], hull[(i + 1) % len(hull)]
        inside &= (b[0] - a[0]) * (g[:, 1] - a[1]) - (b[1] - a[1]) * (g[:, 0] - a[0]) >= 0
    return inside.reshape(h, w)


class TestRasterizer:
    def test_silhouette_matches_projected_hull(self):
        corners = _corners([[0.5, 0.2, 6.0, 1.5, 1.2, 2.0]])
        rgb, sil, zbuf = render_cuboids(corners, [[0.8, 0.2, 0.2]], K, W, H)
        uv = (corners[0] @ K.T)
        uv = uv[:, :2] / uv[:, 2:3]
        want = _hull_mask(uv, W, H)
        iou = (sil & want).sum() / max((sil | want).sum(), 1)
        assert iou > 0.98, iou

    def test_occlusion_zbuffer(self):
        # near red box dead-center occludes far green box
        corners = _corners(
            [[0.0, 0.0, 4.0, 1.0, 1.0, 1.0], [0.0, 0.0, 9.0, 1.0, 1.0, 1.0]]
        )
        rgb, sil, zbuf = render_cuboids(
            corners, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], K, W, H
        )
        center = rgb[H // 2, W // 2]
        assert center[0] > center[1], center  # red wins at the shared pixel
        assert abs(zbuf[H // 2, W // 2] - 3.5) < 0.05  # near face of near box

    def test_shading_varies_by_face(self):
        # a rotated cube shows differently-lit faces
        Ry = euler2mat([0, np.pi / 5, 0])
        corners = _corners([[0.0, 0.0, 5.0, 2.0, 2.0, 2.0]], [Ry])
        rgb, sil, _ = render_cuboids(corners, [[0.5, 0.5, 0.9]], K, W, H)
        vals = rgb[sil][:, 2]
        assert vals.max() - vals.min() > 0.05  # not flat — lighting applied

    def test_near_plane_clipping(self):
        # box straddling the camera plane: must not crash and must still
        # cover pixels (the visible half)
        corners = _corners([[0.0, 0.0, 0.4, 1.0, 1.0, 2.0]])
        rgb, sil, _ = render_cuboids(corners, [[0.2, 0.8, 0.2]], K, W, H)
        assert sil.sum() > 100

    def test_empty_scene(self):
        rgb, sil, _ = render_cuboids(np.zeros((0, 8, 3)), [], K, W, H)
        assert not sil.any()


class TestSceneViews:
    def setup_method(self):
        self.img = np.full((H, W, 3), 90, np.uint8)
        self.corners = _corners(
            [[0.0, 0.5, 6.0, 1.5, 1.2, 2.0], [2.0, 0.5, 9.0, 1.0, 1.0, 1.0]]
        )

    def test_front_blend_only_inside_silhouette(self):
        front = render_scene_views(
            self.img, K, self.corners, mode="front", blend_weight=0.8
        )
        assert front.shape == (H, W, 3)
        changed = (front != self.img).any(-1)
        _, sil, _ = render_cuboids(
            self.corners, [[0.5, 0.5, 0.5]] * 2, K, W, H
        )
        # the untouched background stays exactly the input
        far_corner = changed[:40, :40]
        assert not far_corner.any()
        # and the box area is actually rendered
        assert changed[sil].mean() > 0.9

    def test_front_and_novel(self):
        front, novel = render_scene_views(
            self.img, K, self.corners, text=["a", "b"], mode="front_and_novel"
        )
        assert front.shape == (H, W, 3)
        assert novel.shape == (H, H, 3)  # scale defaults to image height
        # novel view has the ground grid (175-gray) and rendered boxes
        grid_px = (np.abs(novel.astype(int) - 175).max(-1) <= 8).sum()
        nonbg_px = (np.abs(novel.astype(int) - 225).max(-1) > 20).sum()
        assert grid_px > 200, grid_px
        assert nonbg_px > 2000, nonbg_px

    def test_novel_keeps_all_boxes_in_frame(self):
        # auto-zoom contract (vis.py:348-377): every projected vertex of
        # every box lands inside the novel canvas
        novel = render_scene_views(self.img, K, self.corners, mode="novel")
        scale = H
        R = euler2mat([np.pi / 3, 0, 0])
        allv = self.corners.reshape(-1, 3)
        center = (allv.min(0) + allv.max(0)) / 2
        # recompute the transform exactly as render_scene_views does
        from threedod.vis.vis import _auto_zoom

        K_novel = K.copy()
        K_novel[0, 2] *= scale / W
        K_novel[1, 2] *= scale / H
        vr = (R @ (allv - center).T).T
        zoom = _auto_zoom(vr, center[2], K_novel, scale)
        z = vr[:, 2] + center[2] * zoom
        u = K_novel[0, 0] * vr[:, 0] / z + K_novel[0, 2]
        v = K_novel[1, 1] * vr[:, 1] / z + K_novel[1, 2]
        assert (z > 0.25).all()
        assert (u >= 0).all() and (u < scale).all()
        assert (v >= 0).all() and (v < scale).all()

    def test_2d_only_mode(self):
        out = render_scene_views(self.img, K, self.corners, mode="2D_only")
        assert (out != self.img).any()

    def test_draw_scene_view_composite(self):
        out = draw_scene_view(
            self.img, K, self.corners, labels=[1, 2], scores=[0.9, 0.5]
        )
        assert out.height == H and out.width > W

    def test_behind_camera_box_does_not_crash(self):
        corners = _corners([[0.0, 0.0, -3.0, 1.0, 1.0, 1.0]])
        front = render_scene_views(self.img, K, corners, mode="front")
        assert front.shape == (H, W, 3)


class TestVisualizeFromInstances:
    def test_perfect_match_zero_errors(self, tmp_path):
        box3d = [0.5, 0.2, 6.0, 1.5, 1.2, 2.0]
        pose = np.eye(3).tolist()
        cen = np.asarray(K) @ np.array(box3d[:3])
        cen2d = (cen[:2] / cen[2]).tolist()
        inst = {
            "category_id": 0,
            "score": 0.95,
            "bbox": [200.0, 150.0, 120.0, 90.0],
            "center_2D": cen2d,
            "center_cam": box3d[:3],
            "dimensions": box3d[3:],
            "pose": pose,
        }
        anno = {
            "bbox": [200.0, 150.0, 120.0, 90.0],
            "category_id": 0,
            "center_cam": box3d[:3],
            "dimensions": box3d[3:],
            "pose": pose,
        }
        detections = [
            {"image_id": 0, "K": np.asarray(K).tolist(), "width": W, "height": H,
             "instances": [inst]}
        ]
        records = [{"image_id": 0, "file_name": "", "annotations": [anno]}]
        log = visualize_from_instances(
            detections, records, "synth", 512, str(tmp_path), ["chair"],
            visualize_every=1, score_thres=0.5,
        )
        assert "xy(0.00)" in log and "z(0.00)" in log and "ry(0.00)" in log, log
        assert os.path.exists(tmp_path / "vis" / "000000.jpg")
        # dump is non-trivial (boxes drawn on the placeholder canvas)
        from PIL import Image

        im = np.asarray(Image.open(tmp_path / "vis" / "000000.jpg"))
        assert im.std() > 1.0

    def test_known_errors(self, tmp_path):
        pose_gt = np.eye(3)
        pose_dt = euler2mat([0, np.pi / 6, 0])
        inst = {
            "category_id": 1,
            "score": 0.9,
            "bbox": [100.0, 100.0, 80.0, 60.0],
            "center_2D": [320.0, 240.0],
            "center_cam": [0.0, 0.0, 5.0],
            "dimensions": [1.0, 1.0, 1.0],
            "pose": pose_dt.tolist(),
        }
        anno = {
            "bbox": [105.0, 100.0, 80.0, 60.0],  # IoU ~0.88 -> matched
            "category_id": 1,
            "center_cam": [0.0, 0.0, 6.0],
            "dimensions": [1.2, 1.0, 1.0],
            "pose": pose_gt.tolist(),
        }
        detections = [
            {"image_id": 0, "K": np.asarray(K).tolist(), "width": W, "height": H,
             "instances": [inst]}
        ]
        records = [{"image_id": 0, "file_name": "", "annotations": [anno]}]
        log = visualize_from_instances(
            detections, records, "synth", 512, str(tmp_path), ["a", "b"],
            visualize_every=1000,
        )
        assert "z(1.00)" in log, log  # |5-6|
        assert "ry(0.52)" in log, log  # pi/6

    def test_so3_relative_angle(self):
        assert so3_relative_angle(np.eye(3), np.eye(3)) == pytest.approx(0.0)
        Rz = euler2mat([0, 0, 0.7])
        assert so3_relative_angle(np.eye(3), Rz) == pytest.approx(0.7, abs=1e-6)
