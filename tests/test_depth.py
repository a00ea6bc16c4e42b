"""Depth-Anything-V2 flax port: numerical parity vs the reference torch model.

The reference torch DINOv2 + DPT (depth/metric_depth/depth_anything_v2/) is
importable with torch only (cv2/torchvision stubbed), so the strongest test
possible without downloaded weights runs here: random-init the torch model,
convert its state_dict, and require the flax port to reproduce its output.
"""
import importlib.machinery
import sys
import types

import numpy as np
import pytest

# --- stub out cv2 / torchvision so the reference dpt.py imports ------------
class _AnyAttrModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return 0


for name in ("cv2", "torchvision", "torchvision.transforms"):
    if name not in sys.modules:
        mod = _AnyAttrModule(name)
        if name == "torchvision.transforms":
            mod.Compose = lambda x: x
        # A bare ModuleType has __spec__=None, which makes
        # importlib.util.find_spec(name) raise ValueError for any later
        # importer probing availability (transformers does this for cv2
        # during test_gdino_parity collection). Give the stub a real spec.
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod

sys.path.insert(0, "/root/reference/depth/metric_depth")

import jax
import jax.numpy as jnp
import torch

from threedod.models.depth import DepthAnythingV2, build_dinov2, preprocess_image
from threedod.models.depth.dinov2 import INTERMEDIATE_LAYER_IDX
from threedod.utils.convert_weights import convert_depth_anything_v2, convert_dinov2


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    from depth_anything_v2.dpt import DepthAnythingV2 as TorchDAv2

    model = TorchDAv2(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384], max_depth=20.0
    )
    model.eval()
    return model


class TestDepthParity:
    def test_dinov2_parity(self, torch_model):
        sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
        params = convert_dinov2(sd, "pretrained", depth=12)

        x = np.random.RandomState(0).randn(1, 3, 126, 126).astype(np.float32)
        with torch.no_grad():
            t_out = torch_model.pretrained.get_intermediate_layers(
                torch.from_numpy(x), INTERMEDIATE_LAYER_IDX["vits"], return_class_token=True
            )

        vit = build_dinov2("vits")
        (feats, hp, wp), _ = vit.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            INTERMEDIATE_LAYER_IDX["vits"],
            method=lambda m, xx, ids: (m.get_intermediate_layers(xx, ids), 0),
        )
        assert (hp, wp) == (9, 9)
        for (jp, jc), (tp, tc) in zip(feats, t_out):
            np.testing.assert_allclose(np.asarray(jp), tp.numpy(), atol=2e-4, rtol=1e-3)
            np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=2e-4, rtol=1e-3)

    def test_full_depth_parity(self, torch_model):
        sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
        params = convert_depth_anything_v2(sd, "vits")

        x = np.random.RandomState(1).randn(1, 3, 126, 126).astype(np.float32)
        with torch.no_grad():
            t_depth = torch_model(torch.from_numpy(x)).numpy()

        model = DepthAnythingV2(encoder="vits", max_depth=20.0)
        j_depth = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        assert j_depth.shape == t_depth.shape
        np.testing.assert_allclose(np.asarray(j_depth), t_depth, atol=5e-3, rtol=1e-2)

    def test_preprocess_shapes(self):
        img = jnp.asarray(np.random.rand(480, 640, 3).astype(np.float32))
        x = preprocess_image(img, input_size=266)
        assert x.shape[1] % 14 == 0 and x.shape[2] % 14 == 0
        assert x.shape[1] >= 266 - 14

    def test_depth_positive_and_bounded(self, torch_model):
        sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
        params = convert_depth_anything_v2(sd, "vits")
        model = DepthAnythingV2(encoder="vits", max_depth=20.0)
        x = jnp.asarray(np.random.RandomState(2).randn(1, 126, 126, 3).astype(np.float32))
        d = np.asarray(model.apply({"params": params}, x))
        assert (d >= 0).all() and (d <= 20.0).all()
