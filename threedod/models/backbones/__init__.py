import jax.numpy as jnp

from .dla import DLA, build_dla
from .fpn import FPN, STRIDES, BackboneWithFPN
from .resnet import ResNet, build_resnet


def build_backbone(name: str, fpn_out_channels: int = 256, dtype=jnp.float32) -> BackboneWithFPN:
    """Registry-style builder (parity: reference build_backbone rcnn3d.py:905)."""
    if name.startswith("dla"):
        trunk = build_dla(name, dtype=dtype)
    elif name.startswith("resnet"):
        trunk = build_resnet(name, dtype=dtype)
    elif name.startswith("densenet"):
        from .densenet import build_densenet

        trunk = build_densenet(name, dtype=dtype)
    elif name.startswith("mnasnet"):
        from .mnasnet import build_mnasnet

        trunk = build_mnasnet(name, dtype=dtype)
    elif name.startswith("shufflenet"):
        from .shufflenet import build_shufflenet

        trunk = build_shufflenet(name, dtype=dtype)
    else:
        raise ValueError(f"unknown backbone '{name}'")
    return BackboneWithFPN(trunk=trunk, out_channels=fpn_out_channels, dtype=dtype)
