"""Typed configuration system.

Replaces the reference's detectron2/YACS ``CfgNode`` (cubercnn/config/
config.py:4-187) with plain dataclasses: every key is typed, defaulted, and
discoverable; YAML files support `_BASE_` inheritance and CLI dot-path
overrides (``KEY.SUBKEY=value``) for parity with the reference workflow.

TPU-specific additions live in ``ShapesConfig``: the static padded shapes
that replace Detectron2's ragged ``Instances`` contract (canvas size, max
GT instances, max detections, proposal counts) — these are what make the
whole model jit-compilable.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Tuple


@dataclass
class SolverConfig:
    type: str = "sgd"  # sgd | adam | adamw (+ "+amsgrad")
    ims_per_batch: int = 32
    base_lr: float = 0.02
    steps: Tuple[int, ...] = (19200, 25600)
    max_iter: int = 32000
    weight_decay: float = 1e-4
    momentum: float = 0.9
    nesterov: bool = False  # detectron2 SOLVER.NESTEROV default
    gamma: float = 0.1
    warmup_iters: int = 1000
    warmup_factor: float = 1.0 / 1000
    clip_gradients: float = 0.0  # 0 = off; else clip norm value
    checkpoint_period: int = 4000
    # host-loop batching: chain this many train steps inside ONE jitted
    # dispatch (lax.scan over a (K, B, ...) superbatch). Amortizes the
    # per-call host/relay round-trip K-fold; semantics are identical to K
    # sequential steps (stabilizer state rides TrainState through the
    # chain). 1 = classic one-step dispatch.
    steps_per_dispatch: int = 1


@dataclass
class InputConfig:
    # train-time shortest-edge sizes are sampled from this list
    min_size_train: Tuple[int, ...] = tuple(range(256, 641, 16))
    min_size_test: int = 512
    max_size_train: int = 4096
    max_size_test: int = 4096
    random_flip: bool = True
    format: str = "BGR"  # raw channel order fed to pixel mean/std


@dataclass
class DatasetsConfig:
    train: Tuple[str, ...] = ("SUNRGBD_train_mini",)
    test: Tuple[str, ...] = ("SUNRGBD_test_mini",)
    category_names: Tuple[str, ...] = ()
    ignore_names: Tuple[str, ...] = ("dontcare", "ignore", "void")
    truncation_thres: float = 0.99
    visibility_thres: float = 0.01
    min_height_thres: float = 0.00
    max_height_thres: float = 1.50
    max_depth: float = 1e8
    modal_2d_boxes: bool = False
    trunc_2d_boxes: bool = True
    root: str = "datasets"


@dataclass
class RPNConfig:
    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5", "p6")
    anchor_sizes: Tuple[Tuple[int, ...], ...] = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    iou_thresholds: Tuple[float, float] = (0.05, 0.05)  # bg, fg thresholds
    batch_size_per_image: int = 256
    positive_fraction: float = 1.0
    pre_nms_topk_train: int = 2000  # per level
    pre_nms_topk_test: int = 1000
    post_nms_topk_train: int = 1000
    post_nms_topk_test: int = 1000
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    ignore_threshold: float = 0.5
    objectness_uncertainty: str = "IoUness"  # 'none' | 'IoUness'
    loss_weight_cls: float = 1.0
    loss_weight_loc: float = 1.0
    boundary_thresh: float = -1.0


@dataclass
class ROIHeadsConfig:
    name: str = "ROIHeads3D"  # ROIHeads3D | ROIHeads3DScore | ROIHeadsBoxer
    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5", "p6")
    num_classes: int = 38
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    iou_thresholds: Tuple[float, float] = (0.5, 0.5)
    score_thresh_test: float = 0.01
    nms_thresh_test: float = 0.5
    proposal_append_gt: bool = True


@dataclass
class ROIBoxHeadConfig:
    num_fc: int = 2
    fc_dim: int = 1024
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 0
    smooth_l1_beta: float = 0.0
    box_reg_loss_type: str = "smooth_l1"


@dataclass
class CubeHeadConfig:
    name: str = "CubeHead"
    num_fc: int = 2
    fc_dim: int = 1024
    shared_fc: bool = True
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 0
    z_type: str = "direct"  # direct | sigmoid | log | clusters
    pose_type: str = "6d"  # 6d | quaternion | euler
    cluster_bins: int = 1
    use_confidence: float = 1.0
    inverse_z_weight: bool = False
    virtual_depth: bool = True
    virtual_focal: float = 512.0
    disentangled_loss: bool = True
    chamfer_pose: bool = True
    allocentric_pose: bool = True
    dims_priors_enabled: bool = True
    dims_priors_func: str = "exp"  # exp | sigmoid
    scale_roi_boxes: float = 0.0
    number_of_proposals: int = 1000  # proposal method
    loss_w_3d: float = 1.0
    loss_w_xy: float = 1.0
    loss_w_z: float = 1.0
    loss_w_dims: float = 1.0
    loss_w_pose: float = 1.0
    loss_w_joint: float = 1.0
    # weak-loss weights (reference config.py:119-127)
    loss_w_normal_vec: float = 20.0
    loss_w_iou: float = 1.0
    loss_w_seg: float = 2.5
    loss_w_depth: float = 1.0


@dataclass
class ModelConfig:
    meta_architecture: str = "RCNN3D"  # RCNN3D | RCNN3DCombined | BoxNet
    backbone: str = "dla34"  # dla34|dla46_c|...|resnet18/34/50/101|densenet121|mnasnet|shufflenet
    fpn_out_channels: int = 256
    pixel_mean: Tuple[float, ...] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, ...] = (57.375, 57.120, 58.395)
    use_bn: bool = True
    freeze_bn: bool = False
    stabilize: float = 0.02  # divergence-retry threshold; 0 = off
    depth_on: bool = False
    dtype: str = "bfloat16"  # compute dtype for backbone/heads ('float32' to disable)
    rpn: RPNConfig = field(default_factory=RPNConfig)
    roi_heads: ROIHeadsConfig = field(default_factory=ROIHeadsConfig)
    roi_box_head: ROIBoxHeadConfig = field(default_factory=ROIBoxHeadConfig)
    roi_cube_head: CubeHeadConfig = field(default_factory=CubeHeadConfig)
    weights: str = ""
    weights_pretrain: str = ""


@dataclass
class ShapesConfig:
    """Static padded shapes — the TPU replacement for ragged Instances."""

    canvas_height: int = 512
    canvas_width: int = 672
    max_gt: int = 64  # max GT instances per image (padded/masked)
    max_detections: int = 100  # TEST.DETECTIONS_PER_IMAGE
    roi_batch: int = 512  # sampled ROIs per image (train)
    nms_candidates: int = 1024  # class-flattened candidates entering final NMS
    ransac_hypotheses: int = 1000


@dataclass
class TestConfig:
    eval_period: int = 16000
    visibility_thres: float = 1 / 3.0
    truncation_thres: float = 1 / 3.0
    detections_per_image: int = 100
    batch_size: int = 1


@dataclass
class PlotConfig:
    """Proposal-method experiment routing (reference PLOT block)."""

    output_dir: str = ""
    eval: str = ""  # 'MABO' | 'AP' | 'IoU3D' | ''
    mode2d: str = ""  # 'GT' | 'PRED'
    scoring_func: str = ""
    proposal_func: str = "propose"
    number_of_proposals: int = 1000


@dataclass
class TrainBlockConfig:
    pseudo_gt: str = "learn"  # 'learn' | 'pseudo'


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    input: InputConfig = field(default_factory=InputConfig)
    datasets: DatasetsConfig = field(default_factory=DatasetsConfig)
    shapes: ShapesConfig = field(default_factory=ShapesConfig)
    test: TestConfig = field(default_factory=TestConfig)
    plot: PlotConfig = field(default_factory=PlotConfig)
    train: TrainBlockConfig = field(default_factory=TrainBlockConfig)
    # weak-supervision loss menu (reference cfg.loss_functions, config.py:186)
    loss_functions: Tuple[str, ...] = (
        "dims", "pose_alignment", "pose_ground", "iou", "z", "z_pseudo_gt_patch", "depth",
    )
    output_dir: str = "output"
    seed: int = 12
    vis_period: int = 0
    log: bool = False
    version: int = 2
    max_training_attempts: int = 10


def _to_dict(cfg) -> dict:
    if dataclasses.is_dataclass(cfg):
        return {f.name: _to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    return cfg


def asdict(cfg: Config) -> dict:
    return _to_dict(cfg)


def _set_by_path(cfg, path: str, value):
    """Set a dotted path like 'model.roi_heads.num_classes' (case-insensitive)."""
    parts = path.lower().split(".")
    obj = cfg
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise KeyError(f"config has no section '{p}' (in '{path}')")
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise KeyError(f"config has no key '{leaf}' (in '{path}')")
    current = getattr(obj, leaf)
    setattr(obj, leaf, _coerce(value, current))


def _coerce(value, current):
    import ast

    if isinstance(value, str):
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            # bare-word lists like "[dims,iou,z]" are not Python literals —
            # split them by hand when the target field is a sequence
            if isinstance(current, (list, tuple)) and value.startswith("[") and value.endswith("]"):
                value = [p.strip().strip("'\"") for p in value[1:-1].split(",") if p.strip()]
    if isinstance(current, tuple) and isinstance(value, (list, tuple)):
        return tuple(value)
    if isinstance(current, bool):
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if isinstance(current, float) and isinstance(value, (int, float)):
        return float(value)
    if isinstance(current, int) and isinstance(value, (int, float)) and not isinstance(value, bool):
        return int(value)
    return value


def merge_from_list(cfg: Config, opts: List[str]) -> Config:
    """CLI override pairs: ['model.backbone', 'resnet34', ...] or 'a.b=c'."""
    flat: List[Tuple[str, str]] = []
    i = 0
    while i < len(opts):
        if "=" in opts[i]:
            k, v = opts[i].split("=", 1)
            flat.append((k, v))
            i += 1
        else:
            flat.append((opts[i], opts[i + 1]))
            i += 2
    for k, v in flat:
        _set_by_path(cfg, k, v)
    return cfg
