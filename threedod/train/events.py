"""Metrics bus: scalar storage + terminal/JSONL writers.

Parity target: detectron2 EventStorage + default_writers as used by the
reference (train_net.py:140, 318-320): scalars accumulate each iteration and
flush every 20 iters to the terminal and `metrics.json` (JSONL).
"""
from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict, deque
from typing import Dict

logger = logging.getLogger(__name__)


class EventStorage:
    def __init__(self, output_dir: str, window: int = 20, use_wandb: bool = False, project: str = "threedod"):
        self.output_dir = output_dir
        self.window = window
        self.iter = 0
        self._history = defaultdict(lambda: deque(maxlen=window))
        self._latest: Dict[str, float] = {}
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, "metrics.json"), "a")
        self._t_start = time.time()
        self._t_last_flush = self._t_start
        # optional wandb mirroring (reference train_net.py:33,376-379 behind
        # cfg.log); silently disabled when the package is absent.
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, dir=output_dir)
                self._wandb = wandb
            except Exception:
                logger.warning("wandb requested but unavailable; logging to JSONL only")

    def put_scalars(self, **kwargs):
        for k, v in kwargs.items():
            v = float(v)
            self._history[k].append(v)
            self._latest[k] = v

    def median(self, key: str) -> float:
        vals = sorted(self._history[key])
        return vals[len(vals) // 2] if vals else 0.0

    def flush(self, max_iter: int | None = None):
        record = {"iteration": self.iter}
        record.update({k: self.median(k) for k in sorted(self._history)})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(record, step=self.iter)

        now = time.time()
        it_s = self.window / max(now - self._t_last_flush, 1e-6)
        self._t_last_flush = now
        eta = ""
        if max_iter and it_s > 0:
            secs = (max_iter - self.iter) / it_s
            eta = f" eta: {int(secs // 3600)}h{int(secs % 3600 // 60):02d}m"
        main = {
            k: v for k, v in record.items()
            if k in ("total_loss", "lr") or k.endswith("loss_cls") or k.startswith("Cube/loss")
        }
        parts = " ".join(f"{k}: {v:.4g}" for k, v in main.items())
        logger.info("iter %d%s %s (%.2f it/s)", self.iter, eta, parts, it_s)

    def close(self):
        self._jsonl.close()
