#!/usr/bin/env python
"""GT visualisation + dataset statistics + result plots.

Parity target: VisualiseGT.py (reference repo root):
  - GT 3D-box drawing over dataset images (plot_scene/show_data, :89-143)
  - category_distribution (:144-179): category histogram png
  - spatial_statistics (:180-257): 2D box-centre heatmap png
  - vol_over_cat (:484-539): per-category volume 5-95% interval plot
  - gt_stats / gt_stats_in_terms_of_sigma (:540-748): centre xyz and
    dimension whl histograms, with normal-fit overlays
  - AP_vs_no_of_classes (:258-317) and AP3D_vs_AP2D (:318-381): per-run
    result scatter plots. The reference scrapes log.txt backwards
    (search_file_backwards, :382-413); this framework persists structured
    per-category AP in <run>/results.json (tools/train_net.py do_test), so
    the plots consume that artifact instead of log text.

Usage:
  python tools/visualise_gt.py --dataset-json datasets/Omni3D/synth_train.json \
      [--out-dir output/gt_vis] [--max-images 8] [--stats-only] \
      [--run-dirs output/run_a output/run_b --run-names base weak]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from threedod.vis import draw_scene_view, get_color

COLOR = "#348ABD"


# ---------------------------------------------------------------- statistics


def category_distribution(annotations, out_dir, thing_classes=None):
    """Category-count bar plot (VisualiseGT.py:144-179). Returns the
    count dict sorted descending."""
    names = [a.get("category_name", str(a["category_id"])) for a in annotations]
    if thing_classes:
        counts = {c: 0 for c in thing_classes}
        for n in names:
            if n in counts:
                counts[n] += 1
    else:
        counts = dict(Counter(names))
    counts = dict(sorted(counts.items(), key=lambda x: x[1], reverse=True))
    plt.figure(figsize=(14, 5))
    plt.bar(list(counts.keys()), list(counts.values()), color=COLOR)
    plt.xticks(rotation=60, size=9)
    plt.title("Category Distribution")
    plt.savefig(os.path.join(out_dir, "category_distribution.png"), dpi=150, bbox_inches="tight")
    plt.close()
    return counts


def spatial_statistics(images, annotations, out_dir, std_size=(120, 160)):
    """2D box-centre heatmap over standardized image coords
    (VisualiseGT.py:180-257)."""
    dims_by_img = {im["id"]: (im["width"], im["height"]) for im in images}
    grid = np.zeros(std_size)
    outliers = 0
    for a in annotations:
        if a.get("ignore"):
            continue
        w0, h0 = dims_by_img.get(a["image_id"], (None, None))
        if w0 is None:
            continue
        x, y, bw, bh = a["bbox"] if "bbox" in a else a["bbox2D_tight"]
        xm = int((x + bw / 2) * std_size[1] / w0)
        ym = int((y + bh / 2) * std_size[0] / h0)
        if 0 <= xm < std_size[1] and 0 <= ym < std_size[0]:
            grid[ym, xm] += 1
        else:
            outliers += 1
    if grid.max() > 0:
        grid = grid / grid.max()
        grid[0, 0] = 0.0
        if grid.max() > 0:
            grid = grid / grid.max()
    plt.figure()
    plt.imshow(grid, cmap="gray_r", vmin=0, vmax=1)
    plt.xticks([])
    plt.yticks([])
    plt.title("Histogram of 2D box centre points")
    plt.savefig(os.path.join(out_dir, "2d_histogram.png"), dpi=150, bbox_inches="tight")
    plt.close()
    return outliers


def gt_stats(annotations, out_dir, sigma_overlay=True):
    """Centre xyz + dimension whl histograms with optional normal-fit
    overlay (VisualiseGT.py:540-748)."""
    centers = np.asarray([a["center_cam"] for a in annotations], np.float64)
    dims = np.asarray([a["dimensions"] for a in annotations], np.float64)
    if len(centers):
        centers = centers[centers[:, 0] != -1].T
        dims = dims[dims[:, 0] != -1].T
    for arr, labels, fname, title in (
        (centers, ["x", "y", "z"], "center.png", "Center Distribution in Meters"),
        (dims, ["w", "h", "l"], "dimensions.png", "Dimensions Distribution in Meters"),
    ):
        if arr.size == 0:
            continue
        fig, axes = plt.subplots(1, 3, figsize=(18, 5))
        for i in range(3):
            axes[i].hist(arr[i], color=COLOR, bins=20, density=sigma_overlay)
            axes[i].set_xlabel(labels[i])
            axes[i].set_ylabel("Count" if not sigma_overlay else "Density")
            if sigma_overlay and arr[i].std() > 0:
                mu, sigma = arr[i].mean(), arr[i].std()
                x = np.linspace(mu - 3 * sigma, mu + 3 * sigma, 100)
                pdf = np.exp(-0.5 * ((x - mu) / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi))
                axes[i].plot(x, pdf, color="orange")
                ylim = axes[i].get_ylim()[1]
                axes[i].vlines([mu - sigma, mu + sigma], 0, ylim, linestyle="--", color="gray")
        fig.suptitle(title)
        plt.savefig(os.path.join(out_dir, fname), dpi=150, bbox_inches="tight")
        plt.close()


def vol_over_cat(annotations, out_dir):
    """Per-category volume mean + 5-95% normal interval
    (VisualiseGT.py:484-539)."""
    vols = defaultdict(list)
    for a in annotations:
        v = float(np.prod(a["dimensions"]))
        if v > 0:
            vols[a.get("category_name", str(a["category_id"]))].append(v)
    if not vols:
        return
    keys = list(vols.keys())
    means = np.array([np.mean(vols[k]) for k in keys])
    stds = np.array([np.std(vols[k]) for k in keys])
    z = 1.6448536269514722  # norm.ppf(0.95)
    plt.figure(figsize=(14, 5))
    for i, (m, s) in enumerate(zip(means, stds)):
        plt.vlines(i, max(0.0, m - z * s), m + z * s, color="gray", linewidth=2)
        plt.plot([i], [m], marker="o", color=COLOR)
    plt.xticks(np.arange(len(keys)), keys, rotation=60, size=9)
    plt.xlabel("Category")
    plt.ylabel("Volume")
    plt.title("Category Volume Distribution")
    plt.savefig(os.path.join(out_dir, "volume_distribution.png"), dpi=150, bbox_inches="tight")
    plt.close()


# ---------------------------------------------------------------- result plots


def _load_percat(run_dir):
    """Per-category AP table from a finished run's results.json
    (written by tools/train_net.py do_test / tools/eval_boxes.py)."""
    path = os.path.join(run_dir, "results.json")
    with open(path) as f:
        results = json.load(f)
    # first dataset entry that carries per-category APs
    for name, res in results.items():
        if isinstance(res, dict) and "percat3D" in res:
            return res.get("percat2D", {}), res["percat3D"]
    raise ValueError(f"no percat APs in {path}")


def ap_vs_category_count(run_dirs, run_names, counts, out_dir,
                         sec_per_instance=(114.0, 10.15)):
    """AP3D vs class-wise annotation time (VisualiseGT.py:258-317): x =
    category instance count x seconds-per-instance (full 3D annotation for
    the first run, weak 2D for the rest), point size = AP2D, with linear
    fits."""
    fig, ax = plt.subplots(figsize=(12, 8))
    for ri, (rd, rn) in enumerate(zip(run_dirs, run_names)):
        percat2d, percat3d = _load_percat(rd)
        cats = [c for c in percat3d if c in counts]
        if not cats:
            continue
        scale = sec_per_instance[0] if ri == 0 else sec_per_instance[1]
        time_h = np.array([counts[c] * scale / 3600.0 for c in cats])
        ap3 = np.array([percat3d[c] for c in cats])
        ap2 = np.array([percat2d.get(c, 0.0) for c in cats])
        ax.scatter(time_h, ap3, s=np.maximum(ap2 * 2, 4), alpha=0.5, label=rn)
        for t, a3, c in zip(time_h, ap3, cats):
            ax.text(t, a3, c, fontsize=a3 * 0.3 + 3)
        if len(cats) > 1 and time_h.std() > 0:
            r = np.corrcoef(time_h, ap3)[0, 1]
            fit = np.polyfit(time_h, ap3, 1)
            order = np.argsort(time_h)
            ax.plot(time_h[order], np.poly1d(fit)(time_h[order]), "--", alpha=0.5,
                    label=f"{rn} fit (R={r:.2f})")
    ax.set_xlabel("Annotation time (h)")
    ax.set_ylabel("AP3D")
    ax.set_xscale("log")
    ax.set_title("AP3D vs class-wise annotation time")
    ax.legend(title="point size = AP2D")
    plt.savefig(os.path.join(out_dir, "AP_vs_no_of_classes_all.png"), dpi=150, bbox_inches="tight")
    plt.close()


def ap3d_vs_ap2d(run_dirs, run_names, out_dir, mode="standard"):
    """Per-category AP3D-vs-AP2D scatter across runs
    (VisualiseGT.py:318-381)."""
    fig, ax = plt.subplots(figsize=(12, 8))
    for rd, rn in zip(run_dirs, run_names):
        percat2d, percat3d = _load_percat(rd)
        cats = list(percat3d.keys())
        ap2 = np.array([percat2d.get(c, 0.0) for c in cats]) + 0.001
        ap3 = np.array([percat3d[c] for c in cats]) + 0.001
        s = np.maximum(ap2 * 2, 4) if mode == "standard" else None
        ax.scatter(ap2, ap3, alpha=0.5, label=rn, s=s)
        for x, y, c in zip(ap2, ap3, cats):
            ax.text(x, y, c, fontsize=(y * 0.3 + 3) if mode == "standard" else 7)
    ax.plot((0, 70), (0, 70), "--", color=COLOR, alpha=0.3, label="AP2D=AP3D")
    if mode == "log":
        ax.set_xscale("log")
        ax.set_yscale("log")
    ax.set_xlabel("AP2D")
    ax.set_ylabel("AP3D")
    ax.set_title("AP in 3D vs AP in 2D")
    ax.legend()
    plt.savefig(os.path.join(out_dir, f"AP3D_vs_AP2D_all_{mode}.png"), dpi=150, bbox_inches="tight")
    plt.close()


# ---------------------------------------------------------------------- main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-json", required=True)
    ap.add_argument("--image-root", default="datasets")
    ap.add_argument("--out-dir", default="output/gt_vis")
    ap.add_argument("--max-images", type=int, default=8)
    ap.add_argument("--stats-only", action="store_true")
    ap.add_argument("--run-dirs", nargs="*", default=[],
                    help="finished run dirs containing results.json")
    ap.add_argument("--run-names", nargs="*", default=[])
    args = ap.parse_args()

    with open(args.dataset_json) as f:
        data = json.load(f)
    os.makedirs(args.out_dir, exist_ok=True)

    annotations = data["annotations"]
    counts = Counter(a.get("category_name", str(a["category_id"])) for a in annotations)
    depths = np.asarray([a["center_cam"][2] for a in annotations])
    dims = np.asarray([a["dimensions"] for a in annotations])
    print(f"images: {len(data['images'])}  annotations: {len(annotations)}")
    print("category counts:", dict(counts.most_common()))
    if len(depths):
        print(f"depth: mean {depths.mean():.2f} m, p10 {np.percentile(depths, 10):.2f}, p90 {np.percentile(depths, 90):.2f}")
        print(f"dims (whl) mean: {dims.mean(0).round(2).tolist()}")

    category_distribution(annotations, args.out_dir)
    spatial_statistics(data["images"], annotations, args.out_dir)
    gt_stats(annotations, args.out_dir)
    vol_over_cat(annotations, args.out_dir)
    print(f"dataset-stat figures -> {args.out_dir}")

    if args.run_dirs:
        names = args.run_names or [os.path.basename(d.rstrip("/")) for d in args.run_dirs]
        ap_vs_category_count(args.run_dirs, names, counts, args.out_dir)
        ap3d_vs_ap2d(args.run_dirs, names, args.out_dir)
        ap3d_vs_ap2d(args.run_dirs, names, args.out_dir, mode="log")
        print(f"result plots for {len(args.run_dirs)} runs -> {args.out_dir}")

    if args.stats_only:
        return

    per_image = {}
    for a in annotations:
        per_image.setdefault(a["image_id"], []).append(a)

    for im in data["images"][: args.max_images]:
        annos = per_image.get(im["id"], [])
        if not annos:
            continue
        img = np.asarray(Image.open(os.path.join(args.image_root, im["file_path"])).convert("RGB"))
        corners = np.asarray([a["bbox3D_cam"] for a in annos])
        labels = [a["category_name"] for a in annos]
        out = draw_scene_view(img, np.asarray(im["K"]), corners, labels=labels)
        path = os.path.join(args.out_dir, f"gt_{im['id']:06d}.jpg")
        out.save(path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
