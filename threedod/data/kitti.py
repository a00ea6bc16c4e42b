"""KITTI interop: Omni3D <-> KITTI txt formats.

Parity targets: cubercnn/data/Omni_to_kitti.py (:20-166 incl. the
`calculate_alpha` observation-angle math and its golden test rows),
kitti_gt.py (GT export), make_dummy_dataset.py (annotation-free test json).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

KITTI_CLASS_MAP = {
    "pedestrian": "Pedestrian",
    "car": "Car",
    "cyclist": "Cyclist",
    "van": "Van",
    "truck": "Truck",
}


def perp_vector(x, z):
    """2D vector perpendicular to (x, z) (Omni_to_kitti.py:10-11)."""
    return np.array([z, -x])


def calculate_alpha(location, ry):
    """Observation angle alpha from location + yaw (Omni_to_kitti.py:20-47)."""
    ry = -ry
    x, _, z = location
    perpendicular = perp_vector(x, z)
    ry_vector = np.array([np.cos(ry), np.sin(ry)])
    dot = perpendicular[0] * ry_vector[0] + perpendicular[1] * ry_vector[1]
    det = perpendicular[0] * ry_vector[1] - perpendicular[1] * ry_vector[0]
    alpha = -np.arctan2(det, dot)
    if alpha > np.pi:
        alpha -= 2 * np.pi
    if alpha < -np.pi:
        alpha += 2 * np.pi
    return alpha


def pose_to_ry(R: np.ndarray) -> float:
    """KITTI rotation_y from a camera-frame rotation matrix.

    KITTI's ry is the yaw about the camera Y axis; recovered from the
    orientation of the box's local X axis in the XZ plane.
    """
    # local +X axis in camera coords is the first column
    x_axis = np.asarray(R)[:, 0]
    return float(-np.arctan2(x_axis[2], x_axis[0]))


def detection_to_kitti_line(category: str, bbox_xyxy, dims_whl, center_cam, R, score: Optional[float] = None, truncated=0.0, occluded=0) -> str:
    """One KITTI label line.

    KITTI dims order is (h, w, l); location is the BOTTOM center of the box;
    Omni3D center_cam is the geometric center -> shift y by +h/2.
    """
    w3d, h3d, l3d = dims_whl
    x, y, z = center_cam
    ry = pose_to_ry(R)
    alpha = calculate_alpha(center_cam, ry)
    fields = [
        KITTI_CLASS_MAP.get(category, category.capitalize()),
        f"{truncated:.2f}",
        str(occluded),
        f"{alpha:.2f}",
        f"{bbox_xyxy[0]:.2f}", f"{bbox_xyxy[1]:.2f}", f"{bbox_xyxy[2]:.2f}", f"{bbox_xyxy[3]:.2f}",
        f"{h3d:.2f}", f"{w3d:.2f}", f"{l3d:.2f}",
        f"{x:.2f}", f"{y + h3d / 2:.2f}", f"{z:.2f}",
        f"{ry:.2f}",
    ]
    if score is not None:
        fields.append(f"{score:.4f}")
    return " ".join(fields)


def export_predictions_to_kitti(predictions: List[dict], categories: Dict[int, str], out_dir: str, image_id_to_name=None):
    """COCO-style prediction records -> per-image KITTI txt files."""
    os.makedirs(out_dir, exist_ok=True)
    per_image: Dict[int, list] = {}
    for p in predictions:
        per_image.setdefault(p["image_id"], []).append(p)
    for image_id, preds in per_image.items():
        name = (
            image_id_to_name[image_id]
            if image_id_to_name
            else f"{image_id:06d}"
        )
        lines = []
        for p in preds:
            x, y, w, h = p["bbox"]
            lines.append(
                detection_to_kitti_line(
                    categories.get(p["category_id"], str(p["category_id"])),
                    [x, y, x + w, y + h],
                    p["dimensions"],
                    p["center_cam"],
                    np.asarray(p["pose"]),
                    score=p.get("score"),
                )
            )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    return out_dir


def export_gt_to_kitti(records: List[dict], categories: Dict[int, str], out_dir: str):
    """Dataset records -> KITTI GT label files (kitti_gt.py parity)."""
    os.makedirs(out_dir, exist_ok=True)
    for rec in records:
        lines = []
        for anno in rec.get("annotations", []):
            if anno["category_id"] < 0:
                continue
            x, y, w, h = anno["bbox"]
            lines.append(
                detection_to_kitti_line(
                    categories.get(anno["category_id"], "unknown"),
                    [x, y, x + w, y + h],
                    anno["dimensions"],
                    anno["center_cam"],
                    np.asarray(anno["pose"]),
                )
            )
        with open(os.path.join(out_dir, f"{rec['image_id']:06d}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    return out_dir


def make_dummy_dataset(src_json: str, out_json: str):
    """Annotation-free copy of a dataset json (make_dummy_dataset.py)."""
    with open(src_json) as f:
        data = json.load(f)
    data["annotations"] = []
    with open(out_json, "w") as f:
        json.dump(data, f)
    return out_json
