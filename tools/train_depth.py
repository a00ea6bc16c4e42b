#!/usr/bin/env python
"""Fine-tune Depth-Anything-V2 for metric depth estimation.

Parity target: the reference's vendored depth trainer
(depth/metric_depth/train.py:1-211) — SiLog loss, AdamW with encoder/head
LR split, poly LR decay, random hflip, masked depth metrics, a single
overwritten 'latest' checkpoint. The reference's Hypersim/VKITTI2/KITTI
dataset classes are NOT vendored in the repo (train.py imports
dataset.hypersim etc., directory absent); the dataset contract here is an
NPZ folder: one .npz per sample with keys
  image      (H, W, 3) uint8 RGB
  depth      (H, W)    float metric depth
  valid_mask (H, W)    bool (optional; defaults to depth > 0)
plus a --synthetic mode that fabricates a tiny fixture set for smoke runs.

The DDP/SLURM/NCCL bringup (dist_helper.py:8-41, SyncBatchNorm train.py:95)
is replaced by the 1-D data mesh: run the same script under
`jax.distributed` on a multi-host slice and the batch shards over all chips.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from threedod.models.depth import DepthAnythingV2
from threedod.models.depth.dpt import IMAGENET_MEAN, IMAGENET_STD
from threedod.train.depth import DepthTrainer

logging.basicConfig(level=logging.INFO, format="[%(asctime)s][%(levelname)8s] %(message)s")
logger = logging.getLogger("train_depth")


def _normalize(img_u8: np.ndarray) -> np.ndarray:
    x = img_u8.astype(np.float32) / 255.0
    return (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(IMAGENET_STD, np.float32)


def _resize_nearest(x: np.ndarray, size: int) -> np.ndarray:
    ys = (np.arange(size) * x.shape[0] / size).astype(np.int64)
    xs = (np.arange(size) * x.shape[1] / size).astype(np.int64)
    return x[ys][:, xs]


class NpzFolderDataset:
    """Yields fixed-size batches from a folder of .npz samples."""

    def __init__(self, root: str, img_size: int, batch_size: int, seed: int = 0,
                 train: bool = True):
        self.files = sorted(glob.glob(os.path.join(root, "*.npz")))
        if not self.files:
            raise FileNotFoundError(f"no .npz samples under {root}")
        self.img_size = img_size
        self.batch_size = batch_size
        self.train = train
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return max(len(self.files) // self.batch_size, 1)

    def __iter__(self):
        order = self.rng.permutation(len(self.files)) if self.train else np.arange(len(self.files))
        s = self.img_size
        for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
            imgs, depths, masks = [], [], []
            for i in order[start : start + self.batch_size]:
                with np.load(self.files[i]) as z:
                    img = z["image"]
                    depth = z["depth"].astype(np.float32)
                    mask = z["valid_mask"].astype(bool) if "valid_mask" in z else depth > 0
                imgs.append(_normalize(_resize_nearest(img, s)))
                depths.append(_resize_nearest(depth, s))
                masks.append(_resize_nearest(mask.astype(np.uint8), s).astype(bool))
            yield {
                "image": np.stack(imgs),
                "depth": np.stack(depths),
                "valid_mask": np.stack(masks),
            }


class SyntheticDepthDataset:
    """Fabricated smooth-ramp depth fixtures (smoke tests, no data needed)."""

    def __init__(self, img_size: int, batch_size: int, n_batches: int = 4,
                 max_depth: float = 20.0, seed: int = 0):
        self.img_size, self.batch_size = img_size, batch_size
        self.n_batches = n_batches
        self.max_depth = max_depth
        self.seed = seed

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        rng = np.random.RandomState(self.seed)
        s, b = self.img_size, self.batch_size
        for _ in range(self.n_batches):
            img = rng.randint(0, 255, (b, s, s, 3), np.uint8)
            ramp = np.linspace(1.0, self.max_depth * 0.5, s, dtype=np.float32)
            depth = np.tile(ramp[None, :, None], (b, 1, s))
            depth *= rng.uniform(0.8, 1.2, (b, 1, 1)).astype(np.float32)
            mask = rng.rand(b, s, s) > 0.1
            yield {
                "image": np.stack([_normalize(im) for im in img]),
                "depth": depth,
                "valid_mask": mask,
            }


def main():
    ap = argparse.ArgumentParser(description="Depth Anything V2 metric-depth fine-tuning (TPU)")
    ap.add_argument("--encoder", default="vitl", choices=["vits", "vitb", "vitl"])
    ap.add_argument("--train-root", default="", help="folder of train .npz samples")
    ap.add_argument("--val-root", default="", help="folder of val .npz samples")
    ap.add_argument("--synthetic", action="store_true", help="fabricated fixture data")
    ap.add_argument("--img-size", default=518, type=int)
    ap.add_argument("--min-depth", default=0.001, type=float)
    ap.add_argument("--max-depth", default=20, type=float)
    ap.add_argument("--epochs", default=40, type=int)
    ap.add_argument("--bs", default=2, type=int, help="global batch size")
    ap.add_argument("--lr", default=0.000005, type=float)
    ap.add_argument("--pretrained-from", type=str, default="",
                    help="DA-V2 torch .pth; encoder ('pretrained.*') weights only, "
                         "as in train.py:98-99")
    ap.add_argument("--save-path", type=str, required=True)
    ap.add_argument("--seed", default=0, type=int)
    args = ap.parse_args()

    if args.img_size % 14:
        ap.error("--img-size must be a multiple of 14 (ViT patch size)")

    if args.synthetic:
        train_ds = SyntheticDepthDataset(args.img_size, args.bs, max_depth=args.max_depth,
                                         seed=args.seed)
        val_ds = SyntheticDepthDataset(args.img_size, args.bs, n_batches=2,
                                       max_depth=args.max_depth, seed=args.seed + 1)
    else:
        if not args.train_root:
            ap.error("--train-root required without --synthetic")
        train_ds = NpzFolderDataset(args.train_root, args.img_size, args.bs, args.seed)
        val_ds = (
            NpzFolderDataset(args.val_root, args.img_size, args.bs, train=False)
            if args.val_root else None
        )

    model = DepthAnythingV2(encoder=args.encoder, max_depth=args.max_depth)
    total_iters = args.epochs * len(train_ds)
    trainer = DepthTrainer(
        model, base_lr=args.lr, total_iters=total_iters,
        min_depth=args.min_depth, max_depth=args.max_depth,
    )

    sample = np.zeros((args.bs, args.img_size, args.img_size, 3), np.float32)
    state = trainer.init_state(jax.random.PRNGKey(args.seed), jnp.asarray(sample))

    if args.pretrained_from:
        from threedod.utils.convert_weights import (
            convert_depth_anything_v2, load_torch_checkpoint,
        )
        sd = load_torch_checkpoint(args.pretrained_from)
        converted = convert_depth_anything_v2(sd, args.encoder)
        # encoder-only load, strict=False semantics (train.py:98-99)
        params = dict(state.params)
        params["pretrained"] = jax.tree.map(
            lambda ref, new: jnp.asarray(new, ref.dtype),
            params["pretrained"], converted["pretrained"],
        )
        state = state.replace(params=params)
        logger.info("loaded encoder weights from %s", args.pretrained_from)

    logger.info(
        "devices=%d encoder=%s bs=%d iters/epoch=%d total_iters=%d",
        jax.device_count(), args.encoder, args.bs, len(train_ds), total_iters,
    )
    state, best = trainer.fit(
        state, train_ds, epochs=args.epochs, val_loader=val_ds,
        save_path=args.save_path, seed=args.seed,
    )
    logger.info("best: %s", {k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
