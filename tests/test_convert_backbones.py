"""Weight-converter parity: torch DLA checkpoint layout -> flax DLA.

The reference vendors the full torch DLA model (cubercnn/modeling/backbone/
dla.py:40-415, torch-only once detectron2 is stubbed). Strongest possible
test without downloaded weights: random-init the torch trunk, convert its
state_dict with convert_dla, and require the flax DLA to reproduce the torch
feature maps at every pyramid level.
"""
import sys
import types

import numpy as np
import pytest

# --- stub detectron2 so the reference dla.py imports --------------------
def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


import torch

_stub("detectron2")
_stub("detectron2.utils")
_stub("detectron2.utils.comm", is_main_process=lambda: True)
_stub("detectron2.layers", ShapeSpec=object)
_stub("detectron2.modeling")
_stub("detectron2.modeling.backbone", Backbone=torch.nn.Module)


class _Registry:
    def register(self, *a, **k):
        def deco(fn):
            return fn

        return deco(a[0]) if a and callable(a[0]) else deco


_stub("detectron2.modeling.backbone.build", BACKBONE_REGISTRY=_Registry())
_stub("detectron2.modeling.backbone.fpn", FPN=object)

import importlib.util


def _load_reference_dla():
    """Load reference dla.py directly (the backbone package __init__ needs
    torchvision, which isn't in the image)."""
    spec = importlib.util.spec_from_file_location(
        "_ref_dla", "/root/reference/cubercnn/modeling/backbone/dla.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


import jax
import jax.numpy as jnp

from threedod.models.backbones.dla import build_dla
from threedod.utils.convert_weights import convert_dla


def _torch_dla(name):
    torch_dla = _load_reference_dla()

    torch.manual_seed(0)
    model = getattr(torch_dla, name)(pretrained=False)
    model.eval()
    # randomize BN stats away from (0, 1) so the test exercises them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)
    return model


def _torch_levels(model, x_nchw):
    """Reproduce the trunk's level outputs (dla.py forward, return_levels)."""
    with torch.no_grad():
        y = model.base_layer(x_nchw)
        y = model.level0(y)
        y = model.level1(y)
        outs = {}
        y = model.level2(y); outs["p2"] = y
        y = model.level3(y); outs["p3"] = y
        y = model.level4(y); outs["p4"] = y
        y = model.level5(y); outs["p5"] = y
    return {k: v.numpy().transpose(0, 2, 3, 1) for k, v in outs.items()}


@pytest.mark.parametrize("name", ["dla34", "dla46_c", "dla102"])
def test_dla_converter_feature_parity(name):
    tm = _torch_dla(name)
    flax_model = build_dla(name)

    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = jax.jit(flax_model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = convert_dla(sd, variables)

    got = jax.jit(lambda v, x: flax_model.apply(v, x, train=False))(
        converted, jnp.asarray(x)
    )
    want = _torch_levels(tm, torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for lvl in ("p2", "p3", "p4", "p5"):
        g, w = np.asarray(got[lvl]), want[lvl]
        assert g.shape == w.shape, (lvl, g.shape, w.shape)
        err = np.abs(g - w).max() / max(np.abs(w).max(), 1e-6)
        assert err < 2e-4, f"{name} {lvl}: rel err {err}"


def test_dla_converter_consumes_all_keys():
    """Conv-weight counts must match exactly (both the torch and the flax
    trunk materialise the outer-Tree projects, used or not; only the torch
    classifier fc.* has no flax counterpart and it is 2-D). Guards against
    silent key drops in the converter path mapping."""
    tm = _torch_dla("dla34")
    flax_model = build_dla("dla34")
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(flax_model.init)(jax.random.PRNGKey(0), x)

    n_torch_conv = sum(1 for k, v in tm.state_dict().items() if k.endswith("weight") and v.dim() == 4)
    leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    n_flax_conv = sum(1 for p, v in leaves if v.ndim == 4)
    assert n_torch_conv == n_flax_conv
