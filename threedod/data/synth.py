"""Synthetic Omni3D-format fixture dataset generator.

The reference relies on mini-splits of real datasets for testing
(datasetminify.py, make_dummy_dataset.py — SURVEY.md §4); this image has no
real datasets, so the framework ships a deterministic synthetic scene
generator that emits the exact Omni3D JSON schema plus rendered images,
analytic depth maps and ground masks. It exercises every data-layer code
path (filters, priors, mapper, weak-loss assets) and gives the evaluator a
non-trivial AP signal: objects are boxes standing on a floor plane, rendered
with flat shading, so a working detector can genuinely learn/score them.
"""
from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image, ImageDraw

# (name, (w3d, h3d, l3d) mean dims, color)
SYNTH_SPECS = [
    ("chair", (0.55, 0.95, 0.55), (200, 60, 60)),
    ("table", (1.10, 0.75, 1.60), (60, 160, 60)),
    ("sofa", (0.95, 0.85, 1.90), (60, 60, 200)),
    ("bed", (1.60, 0.65, 2.10), (200, 160, 60)),
    ("cabinet", (0.55, 1.20, 0.90), (160, 60, 200)),
    ("television", (0.15, 0.55, 0.90), (40, 40, 40)),
    ("lamp", (0.35, 1.40, 0.35), (230, 230, 90)),
    ("desk", (0.75, 0.76, 1.40), (120, 80, 40)),
    ("pillow", (0.25, 0.18, 0.55), (240, 240, 240)),
    ("bookcase", (0.35, 1.80, 1.00), (90, 50, 20)),
]
SYNTH_CATEGORIES = [s[0] for s in SYNTH_SPECS]

_VERT_SIGNS = np.array(
    [
        [-1, -1, -1], [+1, -1, -1], [+1, +1, -1], [-1, +1, -1],
        [-1, -1, +1], [+1, -1, +1], [+1, +1, +1], [-1, +1, +1],
    ],
    np.float64,
)
_QUADS = [
    [0, 3, 2, 1], [4, 5, 6, 7], [1, 2, 6, 5], [0, 4, 7, 3], [2, 3, 7, 6], [0, 1, 5, 4],
]


def _verts(center, dims, R):
    w, h, l = dims
    half = np.array([l, h, w]) * 0.5
    v = _VERT_SIGNS * half
    return v @ R.T + np.asarray(center)


def _yaw(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def _project(K, pts):
    p = pts @ K.T
    return p[:, :2] / p[:, 2:3], p[:, 2]


def generate_synth_dataset(
    root: str = "datasets",
    name: str = "synth",
    splits=(("train", 40), ("val", 8), ("test", 16)),
    im_h: int = 480,
    im_w: int = 640,
    seed: int = 7,
    write_maps: bool = True,
):
    """Write Omni3D jsons + images (+ depth/ground maps) under `root`."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "Omni3D"), exist_ok=True)
    os.makedirs(os.path.join(root, name, "images"), exist_ok=True)
    if write_maps:
        os.makedirs(os.path.join(root, "depth_maps"), exist_ok=True)
        os.makedirs(os.path.join(root, "ground_maps"), exist_ok=True)
        os.makedirs(os.path.join(root, "object_masks"), exist_ok=True)

    fx = fy = 1.1 * im_h
    cx, cy = im_w / 2.0, im_h / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    cam_height = 1.3  # camera is 1.3 m above the floor; floor plane y = +1.3

    categories = [{"id": i + 1, "name": n, "supercategory": ""} for i, n in enumerate(SYNTH_CATEGORIES)]

    img_id = 0
    ann_id = 0
    out_paths = {}
    for split, n_images in splits:
        images, annotations = [], []
        for _ in range(n_images):
            img_id += 1
            n_obj = rng.randint(3, 8)
            objs = []
            for _ in range(n_obj):
                ci = rng.randint(len(SYNTH_SPECS))
                cname, mean_dims, color = SYNTH_SPECS[ci]
                dims = np.asarray(mean_dims) * rng.uniform(0.8, 1.25, 3)
                z = rng.uniform(2.2, 7.0)
                # keep the object inside the frustum horizontally
                x_max = 0.75 * z * (im_w / 2) / fx
                x = rng.uniform(-x_max, x_max)
                y = cam_height - dims[1] / 2.0  # resting on the floor
                R = _yaw(rng.uniform(-np.pi, np.pi))
                objs.append((ci, cname, dims, color, np.array([x, y, z]), R))

            # painter's algorithm: far to near
            objs.sort(key=lambda o: -o[4][2])

            img = Image.new("RGB", (im_w, im_h), (150, 165, 180))
            draw = ImageDraw.Draw(img)
            # floor: everything below the horizon line v(y=cam_height, z->inf)=cy
            horizon = int(cy)
            draw.rectangle([0, horizon, im_w, im_h], fill=(110, 100, 90))

            if write_maps:
                vv = np.arange(im_h, dtype=np.float64)[:, None] + 0.5
                with np.errstate(divide="ignore"):
                    floor_z = fy * cam_height / np.maximum(vv - cy, 1e-6)
                depth = np.broadcast_to(np.where(vv > cy, floor_z, 60.0), (im_h, im_w)).copy()
                ground = (np.broadcast_to(vv > cy, (im_h, im_w))).copy()

            obj_masks, obj_mask_ids = [], []
            for ci, cname, dims, color, center, R in objs:
                v3 = _verts(center, dims, R)
                uv, z = _project(K, v3)
                # convex hull via PIL polygon of hull ordering
                from scipy.spatial import ConvexHull

                hull = ConvexHull(uv)
                poly = [tuple(uv[i]) for i in hull.vertices]
                shade = max(0.45, 1.0 - 0.09 * (center[2] - 2.0))
                fill = tuple(int(c * shade) for c in color)
                draw.polygon(poly, fill=fill, outline=tuple(int(c * 0.5) for c in color))

                if write_maps:
                    # rasterise hull mask for depth/ground updates; the same
                    # mask doubles as the per-object instance mask (what SAM
                    # produces for real data — generate_object_masks.py)
                    mask_img = Image.new("L", (im_w, im_h), 0)
                    ImageDraw.Draw(mask_img).polygon(poly, fill=1)
                    m = np.asarray(mask_img, bool)
                    depth[m] = center[2]
                    ground[m] = False
                    obj_masks.append(m)
                    obj_mask_ids.append(ann_id + 1)  # id assigned just below

                x1, y1 = uv.min(0)
                x2, y2 = uv.max(0)
                proj_box = [float(x1), float(y1), float(x2), float(y2)]
                tight = [
                    float(np.clip(x1, 0, im_w - 1)),
                    float(np.clip(y1, 0, im_h - 1)),
                    float(np.clip(x2, 0, im_w - 1)),
                    float(np.clip(y2, 0, im_h - 1)),
                ]
                area_full = max((x2 - x1) * (y2 - y1), 1e-6)
                area_vis = max((tight[2] - tight[0]) * (tight[3] - tight[1]), 0.0)
                truncation = 1.0 - area_vis / area_full

                ann_id += 1
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "dataset_id": 900,
                        "category_id": ci + 1,
                        "category_name": cname,
                        "valid3D": True,
                        "behind_camera": False,
                        "bbox2D_proj": proj_box,
                        "bbox2D_trunc": tight,
                        "bbox2D_tight": tight,
                        "bbox": [tight[0], tight[1], tight[2] - tight[0], tight[3] - tight[1]],
                        "center_cam": [float(c) for c in center],
                        "dimensions": [float(d) for d in dims],
                        "R_cam": [[float(x) for x in row] for row in R],
                        "pose": [[float(x) for x in row] for row in R],
                        "bbox3D_cam": [[float(x) for x in row] for row in v3],
                        "truncation": float(truncation),
                        "visibility": 1.0,
                        "lidar_pts": 100,
                        "segmentation_pts": 100,
                        "depth_error": 0.0,
                    }
                )

            file_path = f"{name}/images/{img_id:06d}.jpg"
            img.save(os.path.join(root, file_path), quality=90)
            if write_maps:
                np.savez_compressed(
                    os.path.join(root, "depth_maps", f"{img_id}.npz"),
                    depth=depth.astype(np.float32),
                )
                np.savez_compressed(
                    os.path.join(root, "ground_maps", f"{img_id}.npz"),
                    mask=ground.astype(np.uint8),
                )
                np.savez_compressed(
                    os.path.join(root, "object_masks", f"{img_id}.npz"),
                    masks=np.stack(obj_masks).astype(np.uint8)
                    if obj_masks else np.zeros((0, im_h, im_w), np.uint8),
                    ann_ids=np.asarray(obj_mask_ids, np.int64),
                )
            images.append(
                {
                    "id": img_id,
                    "dataset_id": 900,
                    "file_path": file_path,
                    "height": im_h,
                    "width": im_w,
                    "K": [[float(x) for x in row] for row in K],
                    "src_90_rotate": 0,
                    "src_flagged": False,
                }
            )

        data = {
            "info": {
                "id": 900,
                "source": "synthetic",
                "name": f"{name}_{split}",
                "split": split,
                "version": "1.0",
                "url": "",
            },
            "images": images,
            "categories": categories,
            "annotations": annotations,
        }
        out = os.path.join(root, "Omni3D", f"{name}_{split}.json")
        with open(out, "w") as f:
            json.dump(data, f)
        out_paths[split] = out

    return out_paths


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets")
    ap.add_argument("--train", type=int, default=40)
    ap.add_argument("--val", type=int, default=8)
    ap.add_argument("--test", type=int, default=16)
    ap.add_argument("--no-maps", action="store_true")
    args = ap.parse_args()
    paths = generate_synth_dataset(
        root=args.root,
        splits=(("train", args.train), ("val", args.val), ("test", args.test)),
        write_maps=not args.no_maps,
    )
    print(paths)
