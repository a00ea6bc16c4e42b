"""GroundingDINO (open-vocabulary text-prompted detector) — TPU-native.

Replaces the reference's GroundingDINO git submodule (.gitmodules:1-3) in
the ground-segmentation asset pipeline
(cubercnn/data/generate_ground_segmentations.py:137-164).
"""
from .bert import BertEncoder
from .deformable import MSDeformAttn, ms_deform_sample
from .model import GroundingDINO, best_box_for_prompt
from .swin import SwinT

__all__ = [
    "BertEncoder",
    "GroundingDINO",
    "MSDeformAttn",
    "SwinT",
    "best_box_for_prompt",
    "ms_deform_sample",
]
