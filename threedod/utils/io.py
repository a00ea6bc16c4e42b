"""General I/O helpers.

Parity target: cubercnn/util/util.py — json/pickle/image I/O, list_files,
ETA formatting (the 10k-color palette lives in vis.get_color).
"""
from __future__ import annotations

import glob
import json
import os
import pickle
import time
from typing import Any


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def save_json(path: str, data: Any):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f)


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(path: str, data: Any):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)


def list_files(base_dir: str, file_pattern: str = "*"):
    """Sorted files matching base_dir/file_pattern (util.py list_files)."""
    return sorted(glob.glob(os.path.join(base_dir, file_pattern)))


def file_parts(path: str):
    """(dir, stem, ext) — util.py file_parts."""
    base = os.path.dirname(path)
    name, ext = os.path.splitext(os.path.basename(path))
    return base, name, ext


class ETA:
    """Simple running ETA estimator (util.py compute_eta contract)."""

    def __init__(self, total: int):
        self.total = total
        self.start = time.time()

    def __call__(self, done: int) -> str:
        if done == 0:
            return "?"
        rate = (time.time() - self.start) / done
        rem = rate * (self.total - done)
        h, rem = divmod(int(rem), 3600)
        m, s = divmod(rem, 60)
        return f"{h}h{m:02d}m{s:02d}s"
