"""PyTorch checkpoint -> flax params converters.

Covers the external model weights the reference downloads
(download_models.sh / depth/download_models.sh): Depth-Anything-V2 metric
checkpoints (DINOv2 ViT + DPT head) and torchvision-style ResNet trunks.
Conversions are pure key/layout mapping:
  Linear   (out, in)        -> kernel (in, out)
  Conv2d   (O, I, kh, kw)   -> kernel (kh, kw, I, O)
  ConvT2d  (I, O, kh, kw)   -> kernel (kh, kw, O, I) with transpose_kernel
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x):
    return np.asarray(x)


def linear(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv_transpose(sd, prefix):
    # torch ConvTranspose2d weight: (in, out, kh, kw). flax ConvTranspose
    # with transpose_kernel=True expects (kh, kw, out, in).
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def layernorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def batchnorm_params(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def batchnorm_stats(sd, prefix):
    return {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])}


def convert_dinov2(sd: Dict, prefix: str = "pretrained", depth: int = 12) -> Dict:
    """DINOv2 ViT params -> flax tree for models.depth.dinov2."""
    p = {
        "cls_token": _t(sd[f"{prefix}.cls_token"]),
        "pos_embed": _t(sd[f"{prefix}.pos_embed"]),
        "patch_embed": conv(sd, f"{prefix}.patch_embed.proj"),
        "norm": layernorm(sd, f"{prefix}.norm"),
    }
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        p[f"block{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "norm2": layernorm(sd, f"{b}.norm2"),
            "attn": {"qkv": linear(sd, f"{b}.attn.qkv"), "proj": linear(sd, f"{b}.attn.proj")},
            "mlp": {"fc1": linear(sd, f"{b}.mlp.fc1"), "fc2": linear(sd, f"{b}.mlp.fc2")},
            "ls1_gamma": _t(sd[f"{b}.ls1.gamma"]),
            "ls2_gamma": _t(sd[f"{b}.ls2.gamma"]),
        }
    return p


def convert_dpt_head(sd: Dict, prefix: str = "depth_head") -> Dict:
    p = {}
    for i in range(4):
        p[f"project{i}"] = conv(sd, f"{prefix}.projects.{i}")
    p["resize0"] = conv_transpose(sd, f"{prefix}.resize_layers.0")
    p["resize1"] = conv_transpose(sd, f"{prefix}.resize_layers.1")
    p["resize3"] = conv(sd, f"{prefix}.resize_layers.3")
    for i in range(4):
        p[f"layer{i + 1}_rn"] = conv(sd, f"{prefix}.scratch.layer{i + 1}_rn")
    for i in range(1, 5):
        rn = f"{prefix}.scratch.refinenet{i}"
        block = {
            "resConfUnit2": {
                "conv1": conv(sd, f"{rn}.resConfUnit2.conv1"),
                "conv2": conv(sd, f"{rn}.resConfUnit2.conv2"),
            },
            "out_conv": conv(sd, f"{rn}.out_conv"),
        }
        # refinenet4 never uses resConfUnit1 (no residual input) but the
        # torch module still has the weights; keep them when present.
        if f"{rn}.resConfUnit1.conv1.weight" in sd and i != 4:
            block["resConfUnit1"] = {
                "conv1": conv(sd, f"{rn}.resConfUnit1.conv1"),
                "conv2": conv(sd, f"{rn}.resConfUnit1.conv2"),
            }
        p[f"refinenet{i}"] = block
    p["output_conv1"] = conv(sd, f"{prefix}.scratch.output_conv1")
    p["output_conv2_0"] = conv(sd, f"{prefix}.scratch.output_conv2.0")
    p["output_conv2_2"] = conv(sd, f"{prefix}.scratch.output_conv2.2")
    return p


def convert_depth_anything_v2(state_dict: Dict, encoder: str = "vits") -> Dict:
    """Full DA-V2 checkpoint -> flax params for models.depth.DepthAnythingV2."""
    depth = {"vits": 12, "vitb": 12, "vitl": 24}[encoder]
    sd = {k: v for k, v in state_dict.items()}
    return {
        "pretrained": convert_dinov2(sd, "pretrained", depth),
        "depth_head": convert_dpt_head(sd, "depth_head"),
    }


def _fold_conv_bn(sd, prefix, eps=1e-5):
    """Conv2d_BN (conv 'c' + BatchNorm 'bn') -> biased flax conv params."""
    w = _t(sd[f"{prefix}.c.weight"])                 # (O, I/g, kh, kw)
    g = _t(sd[f"{prefix}.bn.weight"])
    b = _t(sd[f"{prefix}.bn.bias"])
    mean = _t(sd[f"{prefix}.bn.running_mean"])
    var = _t(sd[f"{prefix}.bn.running_var"])
    scale = g / np.sqrt(var + eps)
    return {
        "conv": {
            "kernel": w.transpose(2, 3, 1, 0) * scale,
            "bias": b - mean * scale,
        }
    }


def convert_tinyvit(state_dict: Dict, depths=(2, 2, 6, 2), prefix: str = "image_encoder.") -> Dict:
    """sam_hq_vit_tiny.pth image-encoder layout (MobileSAM TinyViT-5M,
    the reference's `vit_tiny` fallback —
    generate_ground_segmentations.py:14-18) -> flax params for
    threedod.models.tinyvit.TinyViT. Conv2d_BN pairs fold into biased
    convs (inference-only encoder)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    out: Dict = {
        "patch_conv1": _fold_conv_bn(sd, "patch_embed.seq.0"),
        "patch_conv2": _fold_conv_bn(sd, "patch_embed.seq.2"),
        "neck_conv1": {"kernel": _t(sd["neck.0.weight"]).transpose(2, 3, 1, 0)},
        "neck_ln1": {"weight": _t(sd["neck.1.weight"]), "bias": _t(sd["neck.1.bias"])},
        "neck_conv2": {"kernel": _t(sd["neck.2.weight"]).transpose(2, 3, 1, 0)},
        "neck_ln2": {"weight": _t(sd["neck.3.weight"]), "bias": _t(sd["neck.3.bias"])},
    }
    for j in range(depths[0]):
        out[f"layer0_block{j}"] = {
            c: _fold_conv_bn(sd, f"layers.0.blocks.{j}.{c}")
            for c in ("conv1", "conv2", "conv3")
        }
    for i in (0, 1, 2):
        out[f"merge{i}"] = {
            c: _fold_conv_bn(sd, f"layers.{i}.downsample.{c}")
            for c in ("conv1", "conv2", "conv3")
        }
    for i in (1, 2, 3):
        for j in range(depths[i]):
            b = f"layers.{i}.blocks.{j}"
            out[f"layer{i}_block{j}"] = {
                "attn": {
                    "norm": layernorm(sd, f"{b}.attn.norm"),
                    "qkv": linear(sd, f"{b}.attn.qkv"),
                    "proj": linear(sd, f"{b}.attn.proj"),
                    "attention_biases": _t(sd[f"{b}.attn.attention_biases"]),
                },
                "local_conv": _fold_conv_bn(sd, f"{b}.local_conv"),
                "mlp_norm": layernorm(sd, f"{b}.mlp.norm"),
                "mlp_fc1": linear(sd, f"{b}.mlp.fc1"),
                "mlp_fc2": linear(sd, f"{b}.mlp.fc2"),
            }
    return out


def convert_sam(state_dict: Dict, depth: int = 12, hq: bool = None) -> Dict:
    """Official SAM checkpoint (sam_vit_b_01ec64.pth layout) -> flax params
    for threedod.models.sam.Sam. Also converts SAM-HQ checkpoints
    (sam_hq_vit_b.pth, the variant the reference loads —
    generate_ground_segmentations.py:11-18): HQ is auto-detected from the
    `mask_decoder.hf_token.weight` key, or forced with `hq=`; the target
    model must then be built with ``Sam(hq=True)``."""
    sd = state_dict
    if hq is None:
        hq = "mask_decoder.hf_token.weight" in sd
    enc = {
        "patch_embed": conv(sd, "image_encoder.patch_embed.proj"),
        "pos_embed": _t(sd["image_encoder.pos_embed"]),  # already (1, H, W, C)
        "neck0": conv(sd, "image_encoder.neck.0"),
        "neck1": {"weight": _t(sd["image_encoder.neck.1.weight"]), "bias": _t(sd["image_encoder.neck.1.bias"])},
        "neck2": conv(sd, "image_encoder.neck.2"),
        "neck3": {"weight": _t(sd["image_encoder.neck.3.weight"]), "bias": _t(sd["image_encoder.neck.3.bias"])},
    }
    for i in range(depth):
        b = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "norm2": layernorm(sd, f"{b}.norm2"),
            "attn": {
                "qkv": linear(sd, f"{b}.attn.qkv"),
                "proj": linear(sd, f"{b}.attn.proj"),
                "rel_pos_h": _t(sd[f"{b}.attn.rel_pos_h"]),
                "rel_pos_w": _t(sd[f"{b}.attn.rel_pos_w"]),
            },
            "mlp_lin1": linear(sd, f"{b}.mlp.lin1"),
            "mlp_lin2": linear(sd, f"{b}.mlp.lin2"),
        }

    prompt = {
        "pe_gaussian": _t(sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": np.concatenate(
            [_t(sd[f"prompt_encoder.point_embeddings.{i}.weight"]) for i in range(4)], axis=0
        ),
        "not_a_point_embed": _t(sd["prompt_encoder.not_a_point_embed.weight"]),
        "no_mask_embed": _t(sd["prompt_encoder.no_mask_embed.weight"]),
    }

    def two_way(prefix):
        return {
            "q_proj": linear(sd, f"{prefix}.q_proj"),
            "k_proj": linear(sd, f"{prefix}.k_proj"),
            "v_proj": linear(sd, f"{prefix}.v_proj"),
            "out_proj": linear(sd, f"{prefix}.out_proj"),
        }

    dec = {
        "iou_token": _t(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": _t(sd["mask_decoder.mask_tokens.weight"]),
        "final_attn": two_way("mask_decoder.transformer.final_attn_token_to_image"),
        "norm_final": layernorm(sd, "mask_decoder.transformer.norm_final_attn"),
        "upscale_conv1": conv_transpose(sd, "mask_decoder.output_upscaling.0"),
        "upscale_norm": {
            "weight": _t(sd["mask_decoder.output_upscaling.1.weight"]),
            "bias": _t(sd["mask_decoder.output_upscaling.1.bias"]),
        },
        "upscale_conv2": conv_transpose(sd, "mask_decoder.output_upscaling.3"),
    }
    for i in range(2):
        t = f"mask_decoder.transformer.layers.{i}"
        dec[f"l{i}_self_attn"] = two_way(f"{t}.self_attn")
        dec[f"l{i}_cross_t2i"] = two_way(f"{t}.cross_attn_token_to_image")
        dec[f"l{i}_cross_i2t"] = two_way(f"{t}.cross_attn_image_to_token")
        dec[f"l{i}_norm1"] = layernorm(sd, f"{t}.norm1")
        dec[f"l{i}_norm2"] = layernorm(sd, f"{t}.norm2")
        dec[f"l{i}_norm3"] = layernorm(sd, f"{t}.norm3")
        dec[f"l{i}_norm4"] = layernorm(sd, f"{t}.norm4")
        dec[f"l{i}_mlp1"] = linear(sd, f"{t}.mlp.lin1")
        dec[f"l{i}_mlp2"] = linear(sd, f"{t}.mlp.lin2")
    for i in range(4):
        h = f"mask_decoder.output_hypernetworks_mlps.{i}"
        dec[f"hyper{i}_0"] = linear(sd, f"{h}.layers.0")
        dec[f"hyper{i}_1"] = linear(sd, f"{h}.layers.1")
        dec[f"hyper{i}_2"] = linear(sd, f"{h}.layers.2")
    for i in range(3):
        dec[f"iou_mlp_{i}"] = linear(sd, f"mask_decoder.iou_prediction_head.layers.{i}")

    if hq:
        dec["hf_token"] = _t(sd["mask_decoder.hf_token.weight"])
        for i in range(3):
            dec[f"hf_mlp_{i}"] = linear(sd, f"mask_decoder.hf_mlp.layers.{i}")
        # the three Sequential(conv/ConvT, LayerNorm2d, GELU, conv/ConvT)
        # stacks of MaskDecoderHQ (sam-hq mask_decoder_hq.py __init__)
        dec["compress_vit_conv1"] = conv_transpose(sd, "mask_decoder.compress_vit_feat.0")
        dec["compress_vit_norm"] = {
            "weight": _t(sd["mask_decoder.compress_vit_feat.1.weight"]),
            "bias": _t(sd["mask_decoder.compress_vit_feat.1.bias"]),
        }
        dec["compress_vit_conv2"] = conv_transpose(sd, "mask_decoder.compress_vit_feat.3")
        dec["encoder_conv1"] = conv_transpose(sd, "mask_decoder.embedding_encoder.0")
        dec["encoder_norm"] = {
            "weight": _t(sd["mask_decoder.embedding_encoder.1.weight"]),
            "bias": _t(sd["mask_decoder.embedding_encoder.1.bias"]),
        }
        dec["encoder_conv2"] = conv_transpose(sd, "mask_decoder.embedding_encoder.3")
        dec["mask_conv1"] = conv(sd, "mask_decoder.embedding_maskfeature.0")
        dec["mask_norm"] = {
            "weight": _t(sd["mask_decoder.embedding_maskfeature.1.weight"]),
            "bias": _t(sd["mask_decoder.embedding_maskfeature.1.bias"]),
        }
        dec["mask_conv2"] = conv(sd, "mask_decoder.embedding_maskfeature.3")

    return {"image_encoder": enc, "prompt_encoder": prompt, "mask_decoder": dec}


def convert_dla(state_dict: Dict, variables: Dict) -> Dict:
    """DLA ImageNet checkpoint (dl.yf.io/dla/models layout, the torch model at
    reference dla.py:233-330) -> flax variables for models.backbones.dla.DLA.

    `variables` is a template from `DLA.init` (random weights) giving the
    module structure; every ConvBN leaf is filled from the torch state dict
    by translating its flax path to the torch module name:
      base_layer            -> base_layer.0 / .1
      level0_i, level1_i    -> level{0,1}.{3i} / .{3i+1}   (conv,bn,relu seq)
      levelK.tree*/convJ    -> levelK.tree*.convJ / .bnJ   (block convs)
      .../root/conv         -> ....root.conv / .bn
      .../project           -> ....project.0 / .1
    The torch model also carries *unused* `project` weights at outer
    (levels>1) Tree nodes (dla.py:210-221: the projected residual is ignored
    by nested trees, which recompute their own) — those keys are skipped, as
    are the classifier head fc.* keys.
    """
    sd = state_dict

    def cb_names(path):
        """flax ConvBN path -> (torch conv prefix, torch bn prefix)."""
        head = path[0]
        if head == "base_layer":
            return "base_layer.0", "base_layer.1"
        if head.startswith("level0_") or head.startswith("level1_"):
            lvl, i = head.split("_")
            return f"{lvl}.{3 * int(i)}", f"{lvl}.{3 * int(i) + 1}"
        parts = list(path)
        last = parts[-1]
        if last == "project":
            base = ".".join(parts[:-1])
            return f"{base}.project.0", f"{base}.project.1"
        if last == "conv" and len(parts) >= 2 and parts[-2] == "root":
            base = ".".join(parts[:-1])
            return f"{base}.conv", f"{base}.bn"
        if last.startswith("conv"):
            base = ".".join(parts[:-1])
            return f"{base}.{last}", f"{base}.bn{last[4:]}"
        raise KeyError(f"unrecognised DLA ConvBN path {path}")

    def walk(tpl, path, kind):
        # a ConvBN subtree: {'conv': {...}} in params, {'bn': {...}} in both
        if kind == "params" and set(tpl) <= {"conv", "bn"} and "kernel" in tpl.get("conv", {}):
            cname, bname = cb_names(path)
            return {"conv": conv(sd, cname), "bn": batchnorm_params(sd, bname)}
        if kind == "batch_stats" and set(tpl) == {"bn"}:
            _, bname = cb_names(path)
            return {"bn": batchnorm_stats(sd, bname)}
        return {k: walk(v, path + (k,), kind) for k, v in tpl.items()}

    return {
        "params": walk(variables["params"], (), "params"),
        "batch_stats": walk(variables["batch_stats"], (), "batch_stats"),
    }


def linear_chw(sd: Dict, prefix: str, h: int, w: int, c: int) -> Dict:
    """Linear whose torch input was a CHW-flattened pooled block.

    detectron2 flattens pooled ROI features channel-first (C, H, W); this
    framework pools NHWC and flattens (H, W, C) — the fc weight columns
    must be permuted accordingly (box_head.fc1 and cube_head *fc1)."""
    wt = _t(sd[f"{prefix}.weight"])  # (out, C*H*W)
    out_dim = wt.shape[0]
    wt = wt.reshape(out_dim, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, out_dim)
    return {"kernel": wt, "bias": _t(sd[f"{prefix}.bias"])}


def convert_roi_heads(sd: Dict, roi_params: Dict, res: int = 7, cfp: int = 256) -> Dict:
    """ROI-head slice of the Cube R-CNN zoo mapping: d2 naming
    (roi_heads.box_head.fc{1,2}, roi_heads.box_predictor.{cls_score,
    bbox_pred}, roi_heads.cube_head.* per cube_head.py:56-149,
    roi_heads.priors_*) -> flax params for models.ROIHeads3D.

    `roi_params` is the flax template subtree (RCNN3D.init()["params"]
    ["roi_heads"]) giving which cube-head FC stacks / priors exist.
    Shared with convert_cubercnn_rcnn3d and the detector-head numeric
    parity suite (tests/test_heads_parity.py)."""
    box_head = {"fc1": linear_chw(sd, "roi_heads.box_head.fc1", res, res, cfp)}
    for name in roi_params["box_head"]:
        if name != "fc1":
            box_head[name] = linear(sd, f"roi_heads.box_head.{name}")
    box_predictor = {
        "cls_score": linear(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": linear(sd, "roi_heads.box_predictor.bbox_pred"),
    }

    branch_map = {
        "shared": "feature_generator",
        "xy": "feature_generator_XY",
        "dims": "feature_generator_dims",
        "pose": "feature_generator_pose",
        "z": "feature_generator_Z",
        "conf": "feature_generator_conf",
    }
    cube_head = {}
    for name in roi_params.get("cube_head", {}):
        if name.startswith("bbox_3D"):
            cube_head[name] = linear(sd, f"roi_heads.cube_head.{name}")
        else:
            branch, fc = name.rsplit("_", 1)  # shared_fc1 -> (shared, fc1)
            tprefix = f"roi_heads.cube_head.{branch_map[branch]}.{fc}"
            if fc == "fc1":
                cube_head[name] = linear_chw(sd, tprefix, res, res, cfp)
            else:
                cube_head[name] = linear(sd, tprefix)

    roi_heads = {
        "box_head": box_head,
        "box_predictor": box_predictor,
    }
    if cube_head:
        roi_heads["cube_head"] = cube_head
    for prior in ("priors_dims_per_cat", "priors_z_scales", "priors_z_stats"):
        if prior in roi_params and f"roi_heads.{prior}" in sd:
            roi_heads[prior] = _t(sd[f"roi_heads.{prior}"])
        elif prior in roi_params:
            roi_heads[prior] = roi_params[prior]  # keep template

    return roi_heads


def convert_cubercnn_rcnn3d(
    state_dict: Dict,
    variables: Dict,
    pooler_resolution: int = 7,
    fpn_channels: int = 256,
) -> Dict:
    """Full Cube R-CNN zoo checkpoint (cubercnn:// .pth, detectron2
    GeneralizedRCNN layout with DLA-FPN) -> flax variables for RCNN3D.

    Reference naming: backbone.bottom_up.* (DLA trunk, dla.py:233-330),
    backbone.fpn_lateral{2..6}/fpn_output{2..6} (d2 FPN over IN_FEATURES
    p2..p6, configs/Base.yaml:44), proposal_generator.rpn_head.{conv,
    objectness_logits,anchor_deltas}, roi_heads.box_head.fc{1,2},
    roi_heads.box_predictor.{cls_score,bbox_pred}, roi_heads.cube_head.*
    (cube_head.py:56-149), roi_heads.priors_* (roi_heads.py:93-95,752-760).

    `variables` is a template from RCNN3D.init giving the module structure
    (which cube-head FC stacks exist, cluster bins, etc.).
    """
    sd = state_dict
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    res = pooler_resolution
    cfp = fpn_channels

    # --- trunk (DLA) ----------------------------------------------------
    trunk_sd = {
        k[len("backbone.bottom_up."):]: v
        for k, v in sd.items()
        if k.startswith("backbone.bottom_up.")
    }
    trunk = convert_dla(
        trunk_sd,
        {
            "params": params["backbone"]["trunk"],
            "batch_stats": bstats.get("backbone", {}).get("trunk", {}),
        },
    )

    # --- FPN --------------------------------------------------------------
    fpn = {}
    for name in params["backbone"]["fpn"]:
        kind, lvl = name.split("_p")  # lateral_p2 -> ("lateral", "2")
        fpn[name] = conv(sd, f"backbone.fpn_{kind}{lvl}")

    # --- RPN head -----------------------------------------------------------
    rpn_head = {
        "conv": conv(sd, "proposal_generator.rpn_head.conv"),
        "objectness_logits": conv(sd, "proposal_generator.rpn_head.objectness_logits"),
        "anchor_deltas": conv(sd, "proposal_generator.rpn_head.anchor_deltas"),
    }

    # --- ROI heads ------------------------------------------------------------
    roi_heads = convert_roi_heads(sd, params["roi_heads"], res, cfp)

    out_params = {
        "backbone": {"trunk": trunk["params"], "fpn": fpn},
        "rpn_head": rpn_head,
        "roi_heads": roi_heads,
    }
    out = {"params": out_params}
    if bstats:
        out["batch_stats"] = {"backbone": {"trunk": trunk["batch_stats"]}}
    return out


def load_torch_checkpoint(path: str) -> Dict:
    """Load a .pth state dict to numpy without needing CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# torchvision trunk converters (reference backbone/{resnet,densenet,mnasnet,
# shufflenet}.py wrap torchvision models; these map the official torchvision
# state-dict naming onto the flax trunks in models/backbones/)
# ---------------------------------------------------------------------------

def _cb(sd, conv_prefix, bn_prefix):
    """(params, stats) subtrees for a ConvBN leaf from torch conv+bn names."""
    p = {"conv": conv(sd, conv_prefix), "bn": batchnorm_params(sd, bn_prefix)}
    s = {"bn": batchnorm_stats(sd, bn_prefix)}
    return p, s


def convert_resnet(state_dict: Dict, name: str) -> Dict:
    """torchvision resnet{18,34,50,101} state dict -> flax ResNet variables.

    Key map (reference backbone/resnet.py:32-39 re-exposes the torchvision
    modules unchanged): conv1/bn1 -> stem; layer{s}.{i}.conv{k}/bn{k} ->
    layer{s}_{i}.conv{k}; layer{s}.{i}.downsample.{0,1} -> ...downsample.
    Classifier fc.* keys are ignored.
    """
    from ..models.backbones.resnet import _RESNET_SPECS

    sd = state_dict
    spec = _RESNET_SPECS[name]
    params, stats = {}, {}
    params["stem"], stats["stem"] = _cb(sd, "conv1", "bn1")
    n_convs = 3 if spec["bottleneck"] else 2
    for stage, n_blocks in enumerate(spec["block_counts"]):
        for i in range(n_blocks):
            t = f"layer{stage + 1}.{i}"
            f = f"layer{stage + 1}_{i}"
            p, s = {}, {}
            for k in range(1, n_convs + 1):
                p[f"conv{k}"], s[f"conv{k}"] = _cb(sd, f"{t}.conv{k}", f"{t}.bn{k}")
            if f"{t}.downsample.0.weight" in sd:
                p["downsample"], s["downsample"] = _cb(
                    sd, f"{t}.downsample.0", f"{t}.downsample.1"
                )
            params[f], stats[f] = p, s
    return {"params": params, "batch_stats": stats}


def convert_densenet(state_dict: Dict, block_counts=(6, 12, 24, 16)) -> Dict:
    """torchvision densenet121 state dict -> flax DenseNet variables.

    Reference backbone/densenet.py:14-15 uses `densenet121(...).features`;
    naming: features.conv0/norm0, features.denseblock{b}.denselayer{l}.
    {norm1,conv1,norm2,conv2}, features.transition{t}.{norm,conv},
    features.norm5. Classifier keys are ignored.
    """
    sd = state_dict
    params, stats = {}, {}
    params["stem"], stats["stem"] = _cb(sd, "features.conv0", "features.norm0")
    for b, n_layers in enumerate(block_counts):
        for li in range(n_layers):
            t = f"features.denseblock{b + 1}.denselayer{li + 1}"
            f = f"block{b + 1}_layer{li + 1}"
            params[f] = {
                "norm1": batchnorm_params(sd, f"{t}.norm1"),
                "conv1": conv(sd, f"{t}.conv1"),
                "norm2": batchnorm_params(sd, f"{t}.norm2"),
                "conv2": conv(sd, f"{t}.conv2"),
            }
            stats[f] = {
                "norm1": batchnorm_stats(sd, f"{t}.norm1"),
                "norm2": batchnorm_stats(sd, f"{t}.norm2"),
            }
        if b != len(block_counts) - 1:
            t = f"features.transition{b + 1}"
            params[f"trans{b + 1}_norm"] = batchnorm_params(sd, f"{t}.norm")
            stats[f"trans{b + 1}_norm"] = batchnorm_stats(sd, f"{t}.norm")
            params[f"trans{b + 1}_conv"] = conv(sd, f"{t}.conv")
    params["norm5"] = batchnorm_params(sd, "features.norm5")
    stats["norm5"] = batchnorm_stats(sd, "features.norm5")
    return {"params": params, "batch_stats": stats}


_MNASNET_STAGES = [(24, 3), (40, 3), (80, 3), (96, 2), (192, 4), (320, 1)]


def convert_mnasnet(state_dict: Dict) -> Dict:
    """torchvision mnasnet1_0 state dict -> flax MNASNet variables.

    Reference backbone/mnasnet.py:14-15 uses `mnasnet1_0(...).layers`;
    naming: layers.{0,1}/{3,4}/{6,7} (stem convs+bns), layers.{8+s}.{b}.
    layers.{0,1}/{3,4}/{6,7} (inverted-residual expand/depthwise/project).
    The final 1280-ch conv (layers.14+) and classifier are ignored.
    """
    sd = state_dict
    params, stats = {}, {}
    for i, nm in enumerate(["stem0", "stem1", "stem2"]):
        params[nm], stats[nm] = _cb(sd, f"layers.{3 * i}", f"layers.{3 * i + 1}")
    for si, (_, n_blocks) in enumerate(_MNASNET_STAGES):
        for bi in range(n_blocks):
            t = f"layers.{8 + si}.{bi}.layers"
            f = f"stage{si}_{bi}"
            p, s = {}, {}
            p["expand"], s["expand"] = _cb(sd, f"{t}.0", f"{t}.1")
            p["depthwise"], s["depthwise"] = _cb(sd, f"{t}.3", f"{t}.4")
            p["project"], s["project"] = _cb(sd, f"{t}.6", f"{t}.7")
            params[f], stats[f] = p, s
    return {"params": params, "batch_stats": stats}


_SHUFFLENET_STAGES = [(116, 4), (232, 8), (464, 4)]


def convert_shufflenet(state_dict: Dict) -> Dict:
    """torchvision shufflenet_v2_x1_0 state dict -> flax ShuffleNetV2.

    Reference backbone/shufflenet.py:14-20: conv1.{0,1}, stage{2,3,4}.{b}.
    branch1.{0,1,2,3} (stride-2 units only: dw conv, bn, 1x1 conv, bn) and
    branch2.{0,1,3,4,5,6} (1x1, bn, dw, bn, 1x1, bn). conv5 exists in the
    checkpoint but is unused by the reference forward (p5 = stage4 output)
    and is skipped here.
    """
    sd = state_dict
    params, stats = {}, {}
    params["stem"], stats["stem"] = _cb(sd, "conv1.0", "conv1.1")
    for si, (_, n_blocks) in enumerate(_SHUFFLENET_STAGES):
        for bi in range(n_blocks):
            t = f"stage{si + 2}.{bi}"
            f = f"stage{si + 2}_{bi}"
            p, s = {}, {}
            if bi == 0:  # stride-2 unit: branch1 present
                p["b1_dw"], s["b1_dw"] = _cb(sd, f"{t}.branch1.0", f"{t}.branch1.1")
                p["b1_conv"], s["b1_conv"] = _cb(sd, f"{t}.branch1.2", f"{t}.branch1.3")
            p["b2_conv1"], s["b2_conv1"] = _cb(sd, f"{t}.branch2.0", f"{t}.branch2.1")
            p["b2_dw"], s["b2_dw"] = _cb(sd, f"{t}.branch2.3", f"{t}.branch2.4")
            p["b2_conv2"], s["b2_conv2"] = _cb(sd, f"{t}.branch2.5", f"{t}.branch2.6")
            params[f], stats[f] = p, s
    return {"params": params, "batch_stats": stats}


def _packed_mha(sd, prefix, dim):
    """torch nn.MultiheadAttention (packed in_proj) -> q/k/v/out Dense trees."""
    w = _t(sd[f"{prefix}.in_proj_weight"])
    b = _t(sd[f"{prefix}.in_proj_bias"])
    return {
        "q": {"kernel": w[:dim].T, "bias": b[:dim]},
        "k": {"kernel": w[dim : 2 * dim].T, "bias": b[dim : 2 * dim]},
        "v": {"kernel": w[2 * dim :].T, "bias": b[2 * dim :]},
        "out": linear(sd, f"{prefix}.out_proj"),
    }


def _box_mlp(sd, prefix):
    return {
        "fc1": linear(sd, f"{prefix}.layers.0"),
        "fc2": linear(sd, f"{prefix}.layers.1"),
        "fc3": linear(sd, f"{prefix}.layers.2"),
    }


def convert_groundingdino(
    state_dict: Dict,
    depths=(2, 2, 6, 2),
    enc_layers: int = 6,
    dec_layers: int = 6,
    bert_layers: int = 12,
) -> Dict:
    """Official GroundingDINO swinT_OGC checkpoint -> flax GroundingDINO.

    Key layout per the official repository (groundingdino/models/GroundingDINO):
    backbone.0.* (Swin-T), bert.* (HF bert-base), feat_map, input_proj.{i},
    transformer.{level_embed, encoder.{layers,text_layers,fusion_layers},
    enc_output(_norm), enc_out_bbox_embed, tgt_embed, decoder.{layers,
    ref_point_head, norm}}, bbox_embed.{i}. The model has no BatchNorm, so
    the result is {'params': ...} only. Numeric parity is structural-only in
    this image (no checkpoint available; see models/gdino/model.py docstring).
    """
    if any(k.startswith("module.") for k in state_dict.keys()):
        state_dict = {k.removeprefix("module."): v for k, v in state_dict.items()}
    sd = state_dict
    p: Dict = {}

    # ---- Swin-T backbone
    bb = {"patch_embed": conv(sd, "backbone.0.patch_embed.proj"),
          "patch_norm": layernorm(sd, "backbone.0.patch_embed.norm")}
    for s, depth in enumerate(depths):
        for b in range(depth):
            t = f"backbone.0.layers.{s}.blocks.{b}"
            bb[f"stage{s}_block{b}"] = {
                "norm1": layernorm(sd, f"{t}.norm1"),
                "attn": {
                    "qkv": linear(sd, f"{t}.attn.qkv"),
                    "proj": linear(sd, f"{t}.attn.proj"),
                    "relative_position_bias_table": _t(
                        sd[f"{t}.attn.relative_position_bias_table"]
                    ),
                },
                "norm2": layernorm(sd, f"{t}.norm2"),
                "mlp_fc1": linear(sd, f"{t}.mlp.fc1"),
                "mlp_fc2": linear(sd, f"{t}.mlp.fc2"),
            }
        if s != len(depths) - 1:
            t = f"backbone.0.layers.{s}.downsample"
            bb[f"downsample{s}"] = {
                "norm": layernorm(sd, f"{t}.norm"),
                "reduction": {"kernel": _t(sd[f"{t}.reduction.weight"]).T},
            }
        if f"backbone.0.norm{s}.weight" in sd:  # out_indices norms
            bb[f"out_norm{s}"] = layernorm(sd, f"backbone.0.norm{s}")
    p["backbone"] = bb

    # ---- BERT
    bert = {
        "word_embeddings": {"embedding": _t(sd["bert.embeddings.word_embeddings.weight"])},
        "position_embeddings": {"embedding": _t(sd["bert.embeddings.position_embeddings.weight"])},
        "token_type_embeddings": {"embedding": _t(sd["bert.embeddings.token_type_embeddings.weight"])},
        "embeddings_norm": layernorm(sd, "bert.embeddings.LayerNorm"),
    }
    for i in range(bert_layers):
        t = f"bert.encoder.layer.{i}"
        bert[f"layer{i}"] = {
            "q": linear(sd, f"{t}.attention.self.query"),
            "k": linear(sd, f"{t}.attention.self.key"),
            "v": linear(sd, f"{t}.attention.self.value"),
            "attn_out": linear(sd, f"{t}.attention.output.dense"),
            "attn_norm": layernorm(sd, f"{t}.attention.output.LayerNorm"),
            "ffn_in": linear(sd, f"{t}.intermediate.dense"),
            "ffn_out": linear(sd, f"{t}.output.dense"),
            "ffn_norm": layernorm(sd, f"{t}.output.LayerNorm"),
        }
    p["bert"] = bert
    p["feat_map"] = linear(sd, "feat_map")

    for i in range(4):
        p[f"input_proj{i}"] = conv(sd, f"input_proj.{i}.0")
        p[f"input_gn{i}"] = {
            "scale": _t(sd[f"input_proj.{i}.1.weight"]),
            "bias": _t(sd[f"input_proj.{i}.1.bias"]),
        }
    p["level_embed"] = _t(sd["transformer.level_embed"])

    def deform(prefix):
        return {
            "sampling_offsets": linear(sd, f"{prefix}.sampling_offsets"),
            "attention_weights": linear(sd, f"{prefix}.attention_weights"),
            "value_proj": linear(sd, f"{prefix}.value_proj"),
            "output_proj": linear(sd, f"{prefix}.output_proj"),
        }

    for i in range(enc_layers):
        te = f"transformer.encoder.text_layers.{i}"
        fu = f"transformer.encoder.fusion_layers.{i}"
        de = f"transformer.encoder.layers.{i}"
        p[f"enc{i}"] = {
            "fusion": {
                "layer_norm_v": layernorm(sd, f"{fu}.layer_norm_v"),
                "layer_norm_l": layernorm(sd, f"{fu}.layer_norm_l"),
                "v_proj": linear(sd, f"{fu}.attn.v_proj"),
                "l_proj": linear(sd, f"{fu}.attn.l_proj"),
                "values_v_proj": linear(sd, f"{fu}.attn.values_v_proj"),
                "values_l_proj": linear(sd, f"{fu}.attn.values_l_proj"),
                "out_v_proj": linear(sd, f"{fu}.attn.out_v_proj"),
                "out_l_proj": linear(sd, f"{fu}.attn.out_l_proj"),
                "gamma_v": _t(sd[f"{fu}.gamma_v"]),
                "gamma_l": _t(sd[f"{fu}.gamma_l"]),
            },
            "text_attn": _packed_mha(sd, f"{te}.self_attn", 256),
            "text_norm": layernorm(sd, f"{te}.norm1"),
            "text_ffn": {
                "fc1": linear(sd, f"{te}.linear1"),
                "fc2": linear(sd, f"{te}.linear2"),
                "norm": layernorm(sd, f"{te}.norm2"),
            },
            "deform": deform(f"{de}.self_attn"),
            "vis_norm": layernorm(sd, f"{de}.norm1"),
            "vis_ffn": {
                "fc1": linear(sd, f"{de}.linear1"),
                "fc2": linear(sd, f"{de}.linear2"),
                "norm": layernorm(sd, f"{de}.norm2"),
            },
        }

    p["enc_output"] = linear(sd, "transformer.enc_output")
    p["enc_output_norm"] = layernorm(sd, "transformer.enc_output_norm")
    p["enc_bbox"] = _box_mlp(sd, "transformer.enc_out_bbox_embed")
    p["tgt_embed"] = _t(sd["transformer.tgt_embed.weight"])
    p["ref_point_head_fc1"] = linear(sd, "transformer.decoder.ref_point_head.layers.0")
    p["ref_point_head_fc2"] = linear(sd, "transformer.decoder.ref_point_head.layers.1")

    for i in range(dec_layers):
        t = f"transformer.decoder.layers.{i}"
        p[f"dec{i}"] = {
            "self_attn": _packed_mha(sd, f"{t}.self_attn", 256),
            # official layer norms by role: norm2 follows self-attn, norm1
            # follows the deformable image cross-attn, norm3 the FFN
            "norm1": layernorm(sd, f"{t}.norm2"),
            "ca_text": _packed_mha(sd, f"{t}.ca_text", 256),
            "catext_norm": layernorm(sd, f"{t}.catext_norm"),
            "cross_attn": deform(f"{t}.cross_attn"),
            "norm2": layernorm(sd, f"{t}.norm1"),
            "ffn": {
                "fc1": linear(sd, f"{t}.linear1"),
                "fc2": linear(sd, f"{t}.linear2"),
                "norm": layernorm(sd, f"{t}.norm3"),
            },
        }
        p[f"bbox_embed{i}"] = _box_mlp(sd, f"bbox_embed.{i}")
    p["decoder_norm"] = layernorm(sd, "transformer.decoder.norm")
    return {"params": p}
