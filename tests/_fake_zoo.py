"""Shared builder for reference-shaped fake Cube R-CNN zoo checkpoints.

Emits a `model_final.pth`-layout state dict (exact detectron2
GeneralizedRCNN key names and torch tensor layouts) by inverting the
converter's documented mapping from a flax RCNN3D param template. Used by
the converter integrity gate (tests/test_convert_zoo.py) and the
one-command real-weights drill (tests/test_tools.py).
"""
from __future__ import annotations

import numpy as np


def _inv_linear(tree, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(tree["kernel"]).T.copy()
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"]).copy()


def _inv_linear_chw(tree, prefix, res, c, out):
    k = np.asarray(tree["kernel"])  # (res*res*c, out) in HWC order
    k = k.reshape(res, res, c, -1).transpose(2, 0, 1, 3).reshape(res * res * c, -1)
    out[f"{prefix}.weight"] = k.T.copy()
    out[f"{prefix}.bias"] = np.asarray(tree["bias"]).copy()


def _inv_conv(tree, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(tree["kernel"]).transpose(3, 2, 0, 1).copy()
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"]).copy()


def build_fake_sd(params, rng, backbone="dla34", res=7, cfp=256):
    """flax RCNN3D params template -> d2-layout state dict with random
    values (trunk tensors come from the reference's own torch DLA module
    for exact `backbone.bottom_up.*` naming)."""
    from test_convert_backbones import _torch_dla

    sd = {}
    tdla = _torch_dla(backbone)
    for k, v in tdla.state_dict().items():
        if k.startswith("fc.") or k.startswith("conv_last"):
            continue  # classifier head, not part of the detector trunk
        sd[f"backbone.bottom_up.{k}"] = v.numpy()

    for name, tree in params["backbone"]["fpn"].items():
        kind, lvl = name.split("_p")
        t = {
            "kernel": rng.randn(*np.shape(tree["kernel"])).astype(np.float32),
            "bias": rng.randn(*np.shape(tree["bias"])).astype(np.float32),
        }
        _inv_conv(t, f"backbone.fpn_{kind}{lvl}", sd)
    for name in ("conv", "objectness_logits", "anchor_deltas"):
        tree = params["rpn_head"][name]
        t = {
            "kernel": rng.randn(*np.shape(tree["kernel"])).astype(np.float32),
            "bias": rng.randn(*np.shape(tree["bias"])).astype(np.float32),
        }
        _inv_conv(t, f"proposal_generator.rpn_head.{name}", sd)

    rh = params["roi_heads"]
    for name, tree in rh["box_head"].items():
        t = {
            "kernel": rng.randn(*np.shape(tree["kernel"])).astype(np.float32),
            "bias": rng.randn(*np.shape(tree["bias"])).astype(np.float32),
        }
        if name == "fc1":
            _inv_linear_chw(t, f"roi_heads.box_head.{name}", res, cfp, sd)
        else:
            _inv_linear(t, f"roi_heads.box_head.{name}", sd)
    for name in ("cls_score", "bbox_pred"):
        tree = rh["box_predictor"][name]
        t = {
            "kernel": rng.randn(*np.shape(tree["kernel"])).astype(np.float32),
            "bias": rng.randn(*np.shape(tree["bias"])).astype(np.float32),
        }
        _inv_linear(t, f"roi_heads.box_predictor.{name}", sd)

    branch_map = {
        "shared": "feature_generator",
        "xy": "feature_generator_XY",
        "dims": "feature_generator_dims",
        "pose": "feature_generator_pose",
        "z": "feature_generator_Z",
        "conf": "feature_generator_conf",
    }
    for name, tree in rh.get("cube_head", {}).items():
        t = {
            "kernel": rng.randn(*np.shape(tree["kernel"])).astype(np.float32),
            "bias": rng.randn(*np.shape(tree["bias"])).astype(np.float32),
        }
        if name.startswith("bbox_3D"):
            _inv_linear(t, f"roi_heads.cube_head.{name}", sd)
        else:
            branch, fc = name.rsplit("_", 1)
            tprefix = f"roi_heads.cube_head.{branch_map[branch]}.{fc}"
            if fc == "fc1":
                _inv_linear_chw(t, tprefix, res, cfp, sd)
            else:
                _inv_linear(t, tprefix, sd)
    for prior in ("priors_dims_per_cat", "priors_z_scales", "priors_z_stats"):
        if prior in rh:
            sd[f"roi_heads.{prior}"] = rng.rand(*np.shape(rh[prior])).astype(np.float32)
    return sd
