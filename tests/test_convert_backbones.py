"""Weight-converter parity: torch DLA checkpoint layout -> flax DLA.

The reference vendors the full torch DLA model (cubercnn/modeling/backbone/
dla.py:40-415, torch-only once detectron2 is stubbed). Strongest possible
test without downloaded weights: random-init the torch trunk, convert its
state_dict with convert_dla, and require the flax DLA to reproduce the torch
feature maps at every pyramid level.
"""
import importlib.machinery
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
    # avoid __spec__=None, which breaks importlib.util.find_spec(name) for
    # any later availability probe (see tests/test_depth.py)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
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


class TestCubeRCNNZooConverter:
    """convert_cubercnn_rcnn3d: full detectron2-layout checkpoint -> RCNN3D."""

    def _template(self):
        from threedod.config import Config
        from threedod.data.batch import Batch
        from threedod.models import build_model

        cfg = Config()
        cfg.shapes.canvas_height = 96
        cfg.shapes.canvas_width = 128
        cfg.shapes.max_detections = 8
        cfg.shapes.nms_candidates = 64
        cfg.model.rpn.pre_nms_topk_test = 64
        cfg.model.rpn.post_nms_topk_test = 32
        cfg.model.roi_heads.num_classes = 5
        cfg.model.dtype = "float32"
        model = build_model(cfg)
        batch = Batch(
            image=jnp.zeros((1, 96, 128, 3)),
            image_hw=jnp.asarray([[96, 128]]),
            K=jnp.asarray([[[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]]]),
            im_scale_ratio=jnp.ones((1,)),
            image_id=jnp.zeros((1,), jnp.int32),
        )
        variables = jax.jit(
            lambda b: model.init(
                {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
                b, train=False,
            )
        )(batch)
        return model, batch, variables

    def _fake_zoo_sd(self, variables):
        """Fabricate a d2-layout state dict with torch shapes derived from
        the flax template (inverse of the converter's transposes)."""
        rng = np.random.RandomState(0)
        tm = _torch_dla("dla34")
        sd = {f"backbone.bottom_up.{k}": v.numpy() for k, v in tm.state_dict().items()}

        def t_conv(flax_kernel, prefix, bias=True):
            kh, kw, ci, co = flax_kernel.shape
            sd[f"{prefix}.weight"] = rng.randn(co, ci, kh, kw).astype(np.float32)
            if bias:
                sd[f"{prefix}.bias"] = rng.randn(co).astype(np.float32)

        def t_linear(flax_kernel, prefix):
            ci, co = flax_kernel.shape
            sd[f"{prefix}.weight"] = rng.randn(co, ci).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.randn(co).astype(np.float32)

        p = variables["params"]
        for name, leaf in p["backbone"]["fpn"].items():
            kind, lvl = name.split("_p")
            t_conv(leaf["kernel"], f"backbone.fpn_{kind}{lvl}")
        for name in ("conv", "objectness_logits", "anchor_deltas"):
            t_conv(p["rpn_head"][name]["kernel"], f"proposal_generator.rpn_head.{name}")
        for name, leaf in p["roi_heads"]["box_head"].items():
            t_linear(leaf["kernel"], f"roi_heads.box_head.{name}")
        for name in ("cls_score", "bbox_pred"):
            t_linear(p["roi_heads"]["box_predictor"][name]["kernel"],
                     f"roi_heads.box_predictor.{name}")
        branch_map = {"shared": "feature_generator", "xy": "feature_generator_XY",
                      "dims": "feature_generator_dims", "pose": "feature_generator_pose",
                      "z": "feature_generator_Z", "conf": "feature_generator_conf"}
        for name, leaf in p["roi_heads"]["cube_head"].items():
            if name.startswith("bbox_3D"):
                t_linear(leaf["kernel"], f"roi_heads.cube_head.{name}")
            else:
                branch, fc = name.rsplit("_", 1)
                t_linear(leaf["kernel"], f"roi_heads.cube_head.{branch_map[branch]}.{fc}")
        for prior in ("priors_dims_per_cat", "priors_z_scales", "priors_z_stats"):
            if prior in p["roi_heads"]:
                sd[f"roi_heads.{prior}"] = rng.rand(*p["roi_heads"][prior].shape).astype(np.float32) + 0.5
        return sd

    def test_structure_and_forward(self):
        from threedod.utils.convert_weights import convert_cubercnn_rcnn3d

        model, batch, variables = self._template()
        sd = self._fake_zoo_sd(variables)
        converted = convert_cubercnn_rcnn3d(sd, variables)

        # tree structure + shapes identical to the template
        ref_leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
        got = dict(jax.tree_util.tree_leaves_with_path(converted["params"]))
        assert len(ref_leaves) == len(got)
        for path, leaf in ref_leaves:
            assert np.asarray(got[path]).shape == leaf.shape, path

        # transposes: fpn lateral kernel equals torch weight transposed
        w = sd["backbone.fpn_lateral2.weight"]
        np.testing.assert_array_equal(
            np.asarray(converted["params"]["backbone"]["fpn"]["lateral_p2"]["kernel"]),
            w.transpose(2, 3, 1, 0),
        )
        # priors came from the checkpoint
        np.testing.assert_array_equal(
            np.asarray(converted["params"]["roi_heads"]["priors_dims_per_cat"]),
            sd["roi_heads.priors_dims_per_cat"],
        )

        # the converted model runs end-to-end
        converted = jax.tree.map(jnp.asarray, converted)
        det = jax.jit(lambda v, b: model.apply(v, b, train=False))(converted, batch)
        assert np.isfinite(np.asarray(det.scores)).all()

    def test_chw_flatten_permutation(self):
        """fc1 numerics: torch Linear on a CHW-flattened pooled block must
        equal flax Dense (converted kernel) on the HWC flattening."""
        from threedod.utils.convert_weights import linear_chw

        torch.manual_seed(0)
        h = w = 7
        c, out = 16, 32
        lin = torch.nn.Linear(c * h * w, out)
        x_hwc = np.random.RandomState(1).randn(3, h, w, c).astype(np.float32)
        x_chw = torch.from_numpy(x_hwc.transpose(0, 3, 1, 2).reshape(3, -1))
        with torch.no_grad():
            want = lin(x_chw).numpy()
        sd = {"fc1.weight": lin.weight.detach().numpy(), "fc1.bias": lin.bias.detach().numpy()}
        p = linear_chw(sd, "fc1", h, w, c)
        got = x_hwc.reshape(3, -1) @ p["kernel"] + p["bias"]
        np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# torchvision trunks: parity vs exact-naming torch stand-ins
# (_torchvision_ref.py — torchvision itself is not in the image)
# ---------------------------------------------------------------------------
from _torchvision_ref import (  # noqa: E402
    TVDenseNet,
    TVMNASNet,
    TVShuffleNetV2,
    randomize_bn_stats,
    tv_resnet,
)
from threedod.models.backbones.densenet import build_densenet  # noqa: E402
from threedod.models.backbones.mnasnet import build_mnasnet  # noqa: E402
from threedod.models.backbones.resnet import build_resnet  # noqa: E402
from threedod.models.backbones.shufflenet import build_shufflenet  # noqa: E402
from threedod.utils.convert_weights import (  # noqa: E402
    convert_densenet,
    convert_mnasnet,
    convert_resnet,
    convert_shufflenet,
)


def _parity(torch_model, flax_model, converted, size=64, tol=2e-4):
    torch_model.eval()
    x = np.random.RandomState(1).randn(1, size, size, 3).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = jax.jit(lambda v, x: flax_model.apply(v, x, train=False))(
        converted, jnp.asarray(x)
    )
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        w = want[lvl].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got[lvl])
        assert g.shape == w.shape, (lvl, g.shape, w.shape)
        err = np.abs(g - w).max() / max(np.abs(w).max(), 1e-6)
        assert err < tol, f"{lvl}: rel err {err}"


@pytest.mark.parametrize("name", ["resnet18", "resnet34", "resnet50"])
def test_resnet_converter_feature_parity(name):
    torch.manual_seed(3)
    tm = randomize_bn_stats(tv_resnet(name), seed=3)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    _parity(tm, build_resnet(name), convert_resnet(sd, name))


def test_densenet_converter_feature_parity():
    torch.manual_seed(4)
    tm = randomize_bn_stats(TVDenseNet(), seed=4)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    _parity(tm, build_densenet("densenet121"), convert_densenet(sd))


def test_mnasnet_converter_feature_parity():
    torch.manual_seed(5)
    tm = randomize_bn_stats(TVMNASNet(), seed=5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    _parity(tm, build_mnasnet(), convert_mnasnet(sd))


def test_shufflenet_converter_feature_parity():
    torch.manual_seed(6)
    tm = randomize_bn_stats(TVShuffleNetV2(), seed=6)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    _parity(tm, build_shufflenet(), convert_shufflenet(sd))


@pytest.mark.parametrize(
    "build, convert",
    [
        (lambda: build_resnet("resnet34"), lambda sd: convert_resnet(sd, "resnet34")),
        (lambda: build_densenet("densenet121"), convert_densenet),
        (build_mnasnet, convert_mnasnet),
        (build_shufflenet, convert_shufflenet),
    ],
    ids=["resnet34", "densenet121", "mnasnet", "shufflenet"],
)
def test_torchvision_converters_match_init_structure(build, convert):
    """Converted tree must match the flax init tree leaf-for-leaf in both
    paths and shapes (catches silently missing/mis-shaped params)."""
    builders = {
        "resnet34": lambda: tv_resnet("resnet34"),
        "densenet121": TVDenseNet,
        "mnasnet": TVMNASNet,
        "shufflenet": TVShuffleNetV2,
    }
    flax_model = build()
    x = jnp.zeros((1, 64, 64, 3))
    template = jax.eval_shape(
        lambda: flax_model.init(jax.random.PRNGKey(0), x)
    )
    # recover which torch net pairs with this converter from param shape
    for tname, tbuild in builders.items():
        tm = tbuild()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        try:
            converted = convert(sd)
        except KeyError:
            continue
        tleaves = jax.tree_util.tree_leaves_with_path(template)
        cpaths = {
            jax.tree_util.keystr(p): l.shape
            for p, l in jax.tree_util.tree_leaves_with_path(converted)
        }
        want = {jax.tree_util.keystr(p): l.shape for p, l in tleaves}
        assert cpaths == want, (
            tname,
            sorted(set(want) - set(cpaths))[:5],
            sorted(set(cpaths) - set(want))[:5],
        )
        return
    raise AssertionError("no torch stand-in matched this converter")


def test_load_trunk_weights_grafts_into_backbone(tmp_path):
    """End-to-end ImageNet-trunk init: torch .pth on disk -> grafted flax
    variables for BackboneWithFPN (the reference's pretrained=True path)."""
    from threedod.models.backbones import build_backbone
    from threedod.utils.model_zoo import load_trunk_weights

    torch.manual_seed(7)
    tm = randomize_bn_stats(tv_resnet("resnet18"), seed=7)
    pth = tmp_path / "resnet18.pth"
    torch.save(tm.state_dict(), pth)

    bb = build_backbone("resnet18", fpn_out_channels=32)
    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    variables = jax.jit(bb.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    # wrap in the model-level layout load_trunk_weights expects
    wrapped = {
        "params": {"backbone": variables["params"]},
        "batch_stats": {"backbone": variables["batch_stats"]},
    }
    loaded = load_trunk_weights(str(pth), "resnet18", wrapped)
    stem = loaded["params"]["backbone"]["trunk"]["stem"]["conv"]["kernel"]
    want = tm.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(stem), want, atol=1e-7)
    # FPN params untouched
    assert "fpn" in loaded["params"]["backbone"]


# ---------------------------------------------------------------------------
# block-space (space-to-depth) stem: exact equivalence to the native layout
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_resnet_fast_stem_equivalence(name):
    """The b=4 block-space ResNet stem (7x7 s2 block conv + block-layout
    3x3 s2 maxpool) must compute exactly what the native ConvBN + max_pool
    path computes, in eval and train modes, with an identical param tree."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from threedod.models.backbones.resnet import build_resnet

    fast = dataclasses.replace(build_resnet(name), fast_stem=True, parent=None, name=None)
    slow = dataclasses.replace(build_resnet(name), fast_stem=False, parent=None, name=None)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 96, 3), jnp.float32)
    variables = jax.jit(lambda x: fast.init({"params": jax.random.PRNGKey(0)}, x, train=False))(x)
    sv = jax.jit(lambda x: slow.init({"params": jax.random.PRNGKey(0)}, x, train=False))(x)
    assert jax.tree.structure(sv) == jax.tree.structure(variables)

    of = fast.apply(variables, x, train=False)
    os_ = slow.apply(variables, x, train=False)
    for k in of:
        np.testing.assert_allclose(np.asarray(of[k]), np.asarray(os_[k]), atol=2e-4, rtol=1e-4)

    tf, mf = fast.apply(variables, x, train=True, mutable=["batch_stats"])
    ts, ms = slow.apply(variables, x, train=True, mutable=["batch_stats"])
    for k in tf:
        np.testing.assert_allclose(np.asarray(tf[k]), np.asarray(ts[k]), atol=2e-3, rtol=1e-2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=5e-3),
        mf, ms,
    )


def test_densenet_fast_stem_equivalence():
    """DenseNet's block-space stem must match its native path exactly."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from threedod.models.backbones.densenet import build_densenet

    fast = dataclasses.replace(build_densenet("densenet121"), fast_stem=True, parent=None, name=None)
    slow = dataclasses.replace(build_densenet("densenet121"), fast_stem=False, parent=None, name=None)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 64, 96, 3), jnp.float32)
    variables = jax.jit(lambda x: fast.init({"params": jax.random.PRNGKey(0)}, x, train=False))(x)
    sv = jax.jit(lambda x: slow.init({"params": jax.random.PRNGKey(0)}, x, train=False))(x)
    assert jax.tree.structure(sv) == jax.tree.structure(variables)
    of = fast.apply(variables, x, train=False)
    os_ = slow.apply(variables, x, train=False)
    for k in of:
        np.testing.assert_allclose(np.asarray(of[k]), np.asarray(os_[k]), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("name", ["dla34", "dla46_c"])
def test_dla_fast_stem_equivalence(name):
    """The b=4 block-space stem (and DLA34's block-layout level2) must
    compute exactly what the native-layout ConvBN path computes — the block
    kernels are rearrangements of the same weights, so outputs agree to
    float32 reassociation noise, in both eval and train modes (including
    the running-stat updates)."""
    import jax
    import jax.numpy as jnp

    from threedod.models.backbones.dla import build_dla

    fast = build_dla(name)
    import dataclasses
    slow = dataclasses.replace(build_dla(name), fast_stem=False, parent=None, name=None)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 96, 3), jnp.float32)
    variables = jax.jit(lambda x: fast.init({"params": jax.random.PRNGKey(0)}, x, train=False))(x)

    # param trees must be identical between the two paths
    sv = jax.jit(lambda x: slow.init({"params": jax.random.PRNGKey(0)}, x, train=False))(x)
    assert jax.tree.structure(sv) == jax.tree.structure(variables)

    of = fast.apply(variables, x, train=False)
    os_ = slow.apply(variables, x, train=False)
    for k in of:
        np.testing.assert_allclose(np.asarray(of[k]), np.asarray(os_[k]), atol=2e-4, rtol=1e-4)

    tf, mf = fast.apply(variables, x, train=True, mutable=["batch_stats"])
    ts, ms = slow.apply(variables, x, train=True, mutable=["batch_stats"])
    for k in tf:
        # train-mode normalization amplifies f32 reduction-order noise
        # through rsqrt(var) of a small batch; stats below stay tight
        np.testing.assert_allclose(np.asarray(tf[k]), np.asarray(ts[k]), atol=2e-3, rtol=1e-2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=5e-3),
        mf, ms,
    )
