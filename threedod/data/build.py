"""Data loaders: repeat-factor sampling, dataset balancing, prefetch.

Parity targets: cubercnn/data/build.py —
  RepeatFactorTrainingSampler category rebalance (:158-203),
  optional dataset balancing (BALANCE_DATASETS, :97-144),
  test loader with batch size (:222-259).

The host pipeline is plain numpy + a background prefetch thread; all device
work happens inside the jitted step, so the loader only has to keep one
batch ahead (images are small at detection scale).
"""
from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import numpy as np

from .batch import Batch, collate
from .mapper import DatasetMapper3D
from .omni3d import CATALOG


def repeat_factors_from_category_frequency(dataset_dicts: List[dict], repeat_thresh: float) -> np.ndarray:
    """Per-image repeat factor r(I) = max_{c in I} max(1, sqrt(t / f(c)))."""
    category_freq: dict = {}
    for d in dataset_dicts:
        for anno in d["annotations"]:
            if anno["category_id"] >= 0:
                category_freq[anno["category_id"]] = category_freq.get(anno["category_id"], 0) + 1
    num_images = max(len(dataset_dicts), 1)
    for k in category_freq:
        category_freq[k] /= num_images

    rep = np.ones(len(dataset_dicts))
    for i, d in enumerate(dataset_dicts):
        cats = {a["category_id"] for a in d["annotations"] if a["category_id"] >= 0}
        if cats:
            rep[i] = max(
                max(1.0, math.sqrt(repeat_thresh / category_freq[c])) for c in cats
            )
    return rep


def balance_dataset_factors(dataset_dicts: List[dict]) -> np.ndarray:
    """Equalize per-source-dataset sampling probability (build.py:97-144)."""
    ids = np.asarray([d.get("dataset_id", 0) for d in dataset_dicts])
    factors = np.ones(len(dataset_dicts))
    unique, counts = np.unique(ids, return_counts=True)
    max_count = counts.max()
    for u, c in zip(unique, counts):
        factors[ids == u] = max_count / c
    return factors


class TrainLoader:
    """Infinite shuffled loader yielding padded Batches."""

    def __init__(
        self,
        dataset_dicts: List[dict],
        cfg,
        batch_size: Optional[int] = None,
        repeat_thresh: float = 0.1,
        balance_datasets: bool = False,
        load_maps: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        steps_per_batch: int = 1,
        transfer_fn=None,
    ):
        assert len(dataset_dicts) > 0, "empty dataset"
        self.dicts = dataset_dicts
        self.cfg = cfg
        self.batch_size = batch_size or cfg.solver.ims_per_batch
        self.max_gt = cfg.shapes.max_gt
        self.load_maps = load_maps
        # K>1: yield (K, B, ...) numpy superbatches for the trainer's
        # chained K-step dispatch (one stacking pass; transfer happens at
        # dispatch via shard_superbatch)
        self.steps_per_batch = max(1, int(steps_per_batch))
        # optional post-collate hook applied INSIDE the prefetch thread.
        # NOTE: do NOT use this for device_put over the axon relay — a
        # worker-thread transfer concurrent with main-thread compile/exec
        # RPCs wedges the relay client (observed as a full stall, round 5);
        # the trainer overlaps transfers by STAGING the next superbatch in
        # the main thread right after an async chain dispatch instead.
        self.transfer_fn = transfer_fn
        self.rng = np.random.RandomState(seed)
        self.mapper = DatasetMapper3D(cfg, is_train=True, load_maps=load_maps, rng=self.rng)

        weights = repeat_factors_from_category_frequency(dataset_dicts, repeat_thresh)
        if balance_datasets:
            weights = weights * balance_dataset_factors(dataset_dicts)
        self.probs = weights / weights.sum()
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._pool = ThreadPoolExecutor(max_workers=4)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        k = self.steps_per_batch
        while True:
            idx = self.rng.choice(len(self.dicts), size=k * self.batch_size, p=self.probs)
            samples = list(self._pool.map(lambda i: self.mapper(self.dicts[i]), idx))
            batch = collate(
                samples, self.max_gt, with_maps=self.load_maps,
                steps=k if k > 1 else None, as_numpy=k > 1,
            )
            if self.transfer_fn is not None:
                batch = self.transfer_fn(batch)
            self._queue.put(batch)

    def __iter__(self) -> Iterator[Batch]:
        while True:
            yield self._queue.get()


class TestLoader:
    """Sequential loader; pads the final batch by repeating the last sample."""

    __test__ = False  # not a pytest class

    def __init__(self, dataset_dicts: List[dict], cfg, batch_size: int = 1, load_maps: bool = False):
        self.dicts = dataset_dicts
        self.cfg = cfg
        self.batch_size = batch_size
        self.max_gt = cfg.shapes.max_gt
        self.load_maps = load_maps
        self.mapper = DatasetMapper3D(cfg, is_train=False, load_maps=load_maps)

    def __len__(self):
        return math.ceil(len(self.dicts) / self.batch_size)

    def __iter__(self):
        for start in range(0, len(self.dicts), self.batch_size):
            chunk = self.dicts[start : start + self.batch_size]
            n_real = len(chunk)
            while len(chunk) < self.batch_size:
                chunk = chunk + [chunk[-1]]
            samples = [self.mapper(d) for d in chunk]
            batch = collate(samples, self.max_gt, with_maps=self.load_maps)
            yield batch, n_real


def get_dataset_dicts(names, filter_settings=None) -> List[dict]:
    """Concatenate registered datasets' records."""
    out = []
    for name in names:
        out.extend(CATALOG.get(name))
    return out
