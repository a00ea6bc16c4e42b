"""Static-shape batch contract — the TPU replacement for ragged Instances.

Every sample is padded to (canvas_h, canvas_w) pixels and `max_gt` ground-
truth slots with validity masks; a batch is a single pytree of fixed-shape
arrays, so the full train/eval step jit-compiles once. This is the central
architectural change vs the reference's Detectron2 ``Instances`` lists
(SURVEY.md §7 design stance).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GroundTruth:
    """Padded per-image ground truth.

    boxes2d are XYXY at *network* resolution. boxes3d rows are
    [u, v, z, w3d, h3d, l3d, x3d, y3d, z3d] (u, v at network resolution),
    matching the reference gt_boxes3D contract (dataset_mapper.py:258).
    classes: contiguous category id, or -1 for ignore-region annotations.
    valid: slot holds a real annotation (incl. ignores); padding is False.
    """

    boxes2d: jnp.ndarray  # (B, M, 4)
    classes: jnp.ndarray  # (B, M) int32
    boxes3d: jnp.ndarray  # (B, M, 9)
    poses: jnp.ndarray  # (B, M, 3, 3)
    valid: jnp.ndarray  # (B, M) bool
    # per-instance segmentation masks (SAM outputs in the weak pipeline),
    # kept at 1/4 canvas resolution: (B, M, H/4, W/4); None when unused
    masks: Optional[jnp.ndarray] = None

    @property
    def num_slots(self):
        return self.boxes2d.shape[1]


@struct.dataclass
class Batch:
    """One jit-able batch."""

    image: jnp.ndarray  # (B, H, W, 3): uint8 raw (loader path, device
    # normalizes) or float32 already mean/std-normalised (direct use)
    image_hw: jnp.ndarray  # (B, 2) int32 valid extent inside the canvas
    K: jnp.ndarray  # (B, 3, 3) original intrinsics
    im_scale_ratio: jnp.ndarray  # (B,) original_height / network_height
    image_id: jnp.ndarray  # (B,) int32
    gt: Optional[GroundTruth] = None
    depth_map: Optional[jnp.ndarray] = None  # (B, H, W)
    ground_map: Optional[jnp.ndarray] = None  # (B, H, W)

    @property
    def batch_size(self):
        return self.image.shape[0]


def normalize_image(image, model_cfg, image_hw=None):
    """Device-side (x - pixel_mean) / pixel_std for uint8 loader batches.

    Float inputs are assumed already normalised (tests/benches construct
    them directly); uint8 is the loader's compact wire format. When
    `image_hw` (B, 2) is given, the canvas region beyond each image's valid
    extent is zeroed *after* normalization — matching the reference's
    Detectron2 order (normalize then zero-pad via ImageList,
    rcnn3d.py:50 preprocess_image) and the direct-float path, where padding
    is zero in normalized space.
    """
    if image.dtype == jnp.uint8:
        mean = jnp.asarray(model_cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(model_cfg.pixel_std, jnp.float32)
        out = (image.astype(jnp.float32) - mean) / std
        if image_hw is not None:
            h, w = image.shape[1], image.shape[2]
            rows = jnp.arange(h)[None, :, None] < image_hw[:, 0, None, None]
            cols = jnp.arange(w)[None, None, :] < image_hw[:, 1, None, None]
            out = out * (rows & cols)[..., None]
        # store at the trunk's compute dtype: the first conv casts its
        # input anyway (bf16 trunks), so writing the normalized canvas in
        # f32 only doubled its HBM write+read (~0.8 ms/step "stem prep" in
        # the DESIGN 13 trace). The arithmetic stays f32; only the store
        # rounds — exactly what the conv's own cast produced before.
        if getattr(model_cfg, "dtype", "float32") == "bfloat16":
            out = out.astype(jnp.bfloat16)
        return out
    # already-normalised float inputs take the same store-dtype rule so the
    # two wire paths stay bit-identical for bf16 models
    if getattr(model_cfg, "dtype", "float32") == "bfloat16":
        return image.astype(jnp.bfloat16)
    return image


def collate(
    samples: list,
    max_gt: int,
    with_maps: bool = False,
    steps: Optional[int] = None,
    as_numpy: bool = False,
) -> Batch:
    """Stack mapper outputs (numpy dicts) into one padded Batch.

    ``steps=K`` builds a K-step *superbatch* for the trainer's chained
    dispatch: ``len(samples)`` must be K*B and every leaf gains a leading
    (K, B, ...) layout — a free reshape of the one stacking pass, not an
    extra copy. ``as_numpy`` keeps leaves as host numpy (the K-step path
    transfers at dispatch time via shard_superbatch so row-slicing tail
    steps stays free host-side).
    """
    b = len(samples)
    if steps:
        assert b % steps == 0, (b, steps)

    def wrap(a):
        if steps:
            a = a.reshape((steps, b // steps) + a.shape[1:])
        return a if as_numpy else jnp.asarray(a)

    image = np.stack([s["image"] for s in samples])  # uint8 from the mapper
    image_hw = np.stack([s["image_hw"] for s in samples]).astype(np.int32)
    K = np.stack([s["K"] for s in samples]).astype(np.float32)
    ratio = np.asarray([s["im_scale_ratio"] for s in samples], np.float32)
    image_id = np.asarray([s.get("image_id", -1) for s in samples], np.int32)

    gt = None
    if "gt_boxes2d" in samples[0]:
        boxes2d = np.zeros((b, max_gt, 4), np.float32)
        classes = np.full((b, max_gt), -1, np.int32)
        boxes3d = np.zeros((b, max_gt, 9), np.float32)
        poses = np.tile(np.eye(3, dtype=np.float32), (b, max_gt, 1, 1))
        valid = np.zeros((b, max_gt), bool)
        for i, s in enumerate(samples):
            n = min(len(s["gt_boxes2d"]), max_gt)
            if n:
                boxes2d[i, :n] = s["gt_boxes2d"][:n]
                classes[i, :n] = s["gt_classes"][:n]
                boxes3d[i, :n] = s["gt_boxes3d"][:n]
                poses[i, :n] = s["gt_poses"][:n]
                valid[i, :n] = True
        masks = None
        if "gt_masks" in samples[0] and samples[0]["gt_masks"] is not None:
            hm, wm = samples[0]["gt_masks"].shape[1:]
            m_arr = np.zeros((b, max_gt, hm, wm), np.uint8)
            for i, s in enumerate(samples):
                n = min(len(s["gt_masks"]), max_gt)
                if n:
                    m_arr[i, :n] = (np.asarray(s["gt_masks"][:n]) > 0.5).astype(np.uint8)
            masks = wrap(m_arr)
        gt = GroundTruth(
            boxes2d=wrap(boxes2d),
            classes=wrap(classes),
            boxes3d=wrap(boxes3d),
            poses=wrap(poses),
            valid=wrap(valid),
            masks=masks,
        )

    depth_map = ground_map = None
    if with_maps and "depth_map" in samples[0] and samples[0]["depth_map"] is not None:
        depth_map = wrap(np.stack([s["depth_map"] for s in samples]).astype(np.float16))
    if with_maps and "ground_map" in samples[0] and samples[0]["ground_map"] is not None:
        ground_map = wrap(np.stack([s["ground_map"] for s in samples]).astype(np.uint8))

    return Batch(
        image=wrap(image),
        image_hw=wrap(image_hw),
        K=wrap(K),
        im_scale_ratio=wrap(ratio),
        image_id=wrap(image_id),
        gt=gt,
        depth_map=depth_map,
        ground_map=ground_map,
    )


def split_superbatch(batch: Batch, k: int):
    """Row-slice a (K, B, ...) numpy superbatch into K single Batches.

    Used only for boundary-tail steps that can't fill a whole K-chain;
    numpy row views are free."""
    return [jax.tree_util.tree_map(lambda a: a[i], batch) for i in range(k)]
