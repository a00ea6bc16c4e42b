#!/usr/bin/env python
"""Copy the KITTI validation-split images into their own folder.

Parity: cubercnn/data/kitti_split.py (hard-coded paths there become flags).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threedod.data.kitti import copy_val_split


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--val-file", default="datasets/val.txt")
    ap.add_argument("--src-folder", default="datasets/KITTI_object/training/image_2")
    ap.add_argument("--dest-folder", default="datasets/KITTI_object/val/image_2")
    ap.add_argument("--ext", default=".png")
    args = ap.parse_args()
    copied = copy_val_split(args.val_file, args.src_folder, args.dest_folder, args.ext)
    print(f"copied {len(copied)} images to {args.dest_folder}")


if __name__ == "__main__":
    main()
