#!/usr/bin/env python
"""Overwrite predicted z with matched-GT z in KITTI-format prediction txts.

For every prediction file, any GT 2D box overlapping a detection at IoU >=
0.7 donates its z (txt field 13) — the reference's depth-oracle ablation.

Parity: cubercnn/data/kitti_pred_overwrite_z.py (hard-coded paths there
become flags; see threedod.data.kitti.overwrite_pred_z for the documented
index-alignment fix vs the reference).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threedod.data.kitti import overwrite_pred_z_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--pred-dir", default="output/kitti_val_ours_K/KITTI_formatted_predictions"
    )
    ap.add_argument("--gt-dir", default="datasets/label_2_omni")
    ap.add_argument("--iou-thresh", type=float, default=0.7)
    args = ap.parse_args()
    n = overwrite_pred_z_dir(args.pred_dir, args.gt_dir, args.iou_thresh)
    print(f"rewrote {n} prediction files")


if __name__ == "__main__":
    main()
