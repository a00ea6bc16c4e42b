#!/usr/bin/env python
"""Mine training logs for AP curves and loss plots.

Parity target: results.py + VisualiseGT.py's log-parsing plot functions
(search_file_backwards etc.) — but instead of regexing terminal logs, this
framework's EventStorage writes structured metrics.json (JSONL), so mining
is a clean read. Outputs PNG plots via matplotlib when available, else CSV.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def load_metrics(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", default="output/metrics.json")
    ap.add_argument("--keys", nargs="*", default=["total_loss", "lr"])
    ap.add_argument("--out-dir", default="output/plots")
    args = ap.parse_args()

    rows = load_metrics(args.metrics)
    if not rows:
        print("no metrics found")
        return
    os.makedirs(args.out_dir, exist_ok=True)

    # AP keys are auto-included when present
    keys = list(args.keys) + sorted(
        {k for r in rows for k in r if k.endswith("/AP2D") or k.endswith("/AP3D")}
    )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for key in keys:
            xs = [r["iteration"] for r in rows if key in r]
            ys = [r[key] for r in rows if key in r]
            if not xs:
                continue
            plt.figure(figsize=(6, 4))
            plt.plot(xs, ys)
            plt.xlabel("iteration")
            plt.ylabel(key)
            plt.title(key)
            plt.grid(alpha=0.3)
            fname = os.path.join(args.out_dir, key.replace("/", "_") + ".png")
            plt.savefig(fname, dpi=110, bbox_inches="tight")
            plt.close()
            print(f"wrote {fname}")
    except ImportError:
        out = os.path.join(args.out_dir, "metrics.csv")
        with open(out, "w") as f:
            f.write("iteration," + ",".join(keys) + "\n")
            for r in rows:
                f.write(
                    str(r["iteration"]) + ","
                    + ",".join(str(r.get(k, "")) for k in keys) + "\n"
                )
        print(f"matplotlib unavailable; wrote {out}")


if __name__ == "__main__":
    main()
