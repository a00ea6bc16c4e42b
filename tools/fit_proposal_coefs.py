#!/usr/bin/env python
"""Re-fit the proposal sampler's linear center-correction coefficients.

Parity target: ProposalNetwork/proposals/find_conditions.py — the reference
derived the constants in `propose()` (x: 1.15x, y: 1.1y, z: 0.85z + 0.35;
proposals.py:385-396) by hand-logging (median unprojection, gt center)
pairs to txt files and least-squares fitting them. This tool runs that
workflow end-to-end on any registered dataset with depth maps: collect the
per-GT-box raw depth-grid medians, fit `gt = a * median + b` per axis, and
report the coefficients (with optional scatter plots).

Usage:
  python tools/fit_proposal_coefs.py --config-file configs/BoxNet_Synth.yaml \
      [--plot-dir output/coef_fit]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--grid-points", type=int, default=16)
    ap.add_argument("--plot-dir", default="")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from train_net import setup
    from threedod.data import get_dataset_dicts
    from threedod.proposals.proposals import _depth_grid_centers

    cfg, meta, priors = setup(args)
    dicts = get_dataset_dicts(cfg.datasets.train)

    pairs = {"x": [], "y": [], "z": []}
    grid = jax.jit(_depth_grid_centers, static_argnums=(3,))
    for d in dicts:
        dp = d.get("depth_image_path")
        if not dp or not os.path.exists(dp):
            continue
        with np.load(dp) as z:
            depth = jnp.asarray(z["depth"] if "depth" in z else z[z.files[0]], jnp.float32)
        K = jnp.asarray(d["K"], jnp.float32)
        for ann in d["annotations"]:
            if ann.get("category_id", -1) < 0:
                continue
            box = np.asarray(ann["bbox"], np.float32)
            box = np.array([box[0], box[1], box[0] + box[2], box[1] + box[3]], np.float32)
            cx, cy, cz = ann["center_cam"]
            dims = ann.get("dimensions", [0.0, 0.0, 0.0])
            x, y, zt = grid(jnp.asarray(box), depth, K, args.grid_points)
            pairs["x"].append((float(jnp.median(x)), cx))
            pairs["y"].append((float(jnp.median(y)), cy))
            # the z condition is logged against the l/2-shifted median
            pairs["z"].append((float(jnp.median(zt)) + float(dims[2]) / 2.0, cz))

    if not pairs["x"]:
        print("no (median, gt) pairs collected — dataset has no depth maps?")
        return 1

    print(f"{len(pairs['x'])} GT boxes")
    for axis in ("x", "y", "z"):
        arr = np.asarray(pairs[axis], np.float64)
        A = np.stack([arr[:, 0], np.ones(len(arr))], axis=1)
        (a, b), *_ = np.linalg.lstsq(A, arr[:, 1], rcond=None)
        resid = arr[:, 1] - (a * arr[:, 0] + b)
        print(f"{axis}: gt = {a:+.4f} * median {b:+.4f}   (rms {resid.std():.3f} m)")
        if args.plot_dir:
            os.makedirs(args.plot_dir, exist_ok=True)
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure()
            plt.scatter(arr[:, 0], arr[:, 1], s=4)
            xs = np.linspace(arr[:, 0].min(), arr[:, 0].max(), 50)
            plt.plot(xs, a * xs + b, "r")
            plt.xlabel(f"median unprojected {axis}")
            plt.ylabel(f"gt center {axis}")
            plt.savefig(
                os.path.join(args.plot_dir, f"{axis}_values_to_find.png"),
                dpi=150, bbox_inches="tight",
            )
            plt.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
