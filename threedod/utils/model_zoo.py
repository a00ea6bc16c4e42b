"""Model-zoo path handling.

Parity target: cubercnn/util/model_zoo.py:6-26 (`CubeRCNNHandler`): resolves
`cubercnn://` paths to the public fbaipublicfiles checkpoint URLs. This
environment has zero egress, so resolution maps to a local cache directory
(`$THREEDOD_ZOO_DIR`, default `datasets/zoo/`); the URL table is kept so a
user with network access can fetch the same files, and torch checkpoints
placed there convert through utils.convert_weights.
"""
from __future__ import annotations

import os

PREFIX = "cubercnn://"
BASE_URL = "https://dl.fbaipublicfiles.com/cubercnn"

ZOO = {
    "omni3d/cubercnn_DLA34_FPN.pth": f"{BASE_URL}/omni3d/cubercnn_DLA34_FPN.pth",
    "omni3d/cubercnn_Res34_FPN.pth": f"{BASE_URL}/omni3d/cubercnn_Res34_FPN.pth",
    "omni3d_in/cubercnn_DLA34_FPN.pth": f"{BASE_URL}/omni3d_in/cubercnn_DLA34_FPN.pth",
    "omni3d_out/cubercnn_DLA34_FPN.pth": f"{BASE_URL}/omni3d_out/cubercnn_DLA34_FPN.pth",
}


def zoo_dir() -> str:
    return os.environ.get("THREEDOD_ZOO_DIR", os.path.join("datasets", "zoo"))


def load_model_weights(path: str, variables: dict) -> dict:
    """Model-only weight load (reference MODEL.WEIGHTS_PRETRAIN semantics,
    train_net.py:149-152): resolves cubercnn:// paths, converts torch .pth
    zoo checkpoints (full detectron2 Cube R-CNN layout) through
    convert_weights, or restores an orbax checkpoint carrying
    {'state': {'params': ..., 'batch_stats': ...}} or raw variables.

    Returns a new `variables` dict; raises on missing files."""
    local = resolve(path)
    if local.endswith((".pth", ".pt", ".pkl")):
        from .convert_weights import convert_cubercnn_rcnn3d, load_torch_checkpoint

        sd = load_torch_checkpoint(local)
        return convert_cubercnn_rcnn3d(sd, variables)
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(local))
    if "state" in restored:
        restored = restored["state"]
    out = {"params": restored["params"]}
    if "batch_stats" in restored and restored["batch_stats"]:
        out["batch_stats"] = restored["batch_stats"]
    return out


def resolve(path: str) -> str:
    """cubercnn://name -> local cached file path (raises if absent)."""
    if not path.startswith(PREFIX):
        return path
    rel = path[len(PREFIX):]
    local = os.path.join(zoo_dir(), rel)
    if not os.path.exists(local):
        url = ZOO.get(rel, f"{BASE_URL}/{rel}")
        raise FileNotFoundError(
            f"zoo checkpoint '{rel}' not cached at {local}. This environment "
            f"has no network egress; download {url} elsewhere and place it "
            f"there, then convert with threedod.utils.convert_weights."
        )
    return local


def load_trunk_weights(path: str, backbone_name: str, variables: dict) -> dict:
    """ImageNet trunk-only weight load (the reference builds torchvision
    trunks with `pretrained=imagenet_pretrain` — backbone/resnet.py:17-27,
    densenet.py:14, mnasnet.py:14, shufflenet.py:14, dla.py:330-415).

    `path` is a torch .pth state dict for the matching torchvision/DLA
    trunk; the converted weights are grafted under backbone/trunk of
    `variables`. Returns a new variables dict.
    """
    from . import convert_weights as cw

    sd = cw.load_torch_checkpoint(resolve(path))
    if backbone_name.startswith("dla"):
        trunk_tpl = {
            "params": variables["params"]["backbone"]["trunk"],
            "batch_stats": variables["batch_stats"]["backbone"]["trunk"],
        }
        conv = cw.convert_dla(sd, trunk_tpl)
    elif backbone_name.startswith("resnet"):
        conv = cw.convert_resnet(sd, backbone_name)
    elif backbone_name.startswith("densenet"):
        conv = cw.convert_densenet(sd)
    elif backbone_name.startswith("mnasnet"):
        conv = cw.convert_mnasnet(sd)
    elif backbone_name.startswith("shufflenet"):
        conv = cw.convert_shufflenet(sd)
    else:
        raise ValueError(f"no trunk converter for backbone '{backbone_name}'")

    out = {k: dict(v) for k, v in variables.items()}
    import jax

    for col in ("params", "batch_stats"):
        tpl = variables[col]["backbone"]["trunk"]
        got = conv[col]
        jax.tree_util.tree_map(
            lambda a, b: None, tpl, got
        )  # structural check: raises on mismatch
        bb = dict(out[col]["backbone"])
        bb["trunk"] = got
        out[col] = {**out[col], "backbone": bb}
    return out


def imagenet_trunk_path(backbone_name: str) -> str | None:
    """Conventional cache location for ImageNet trunk checkpoints
    (datasets/zoo/imagenet/<backbone>.pth); None if absent."""
    p = os.path.join(zoo_dir(), "imagenet", f"{backbone_name}.pth")
    return p if os.path.exists(p) else None
