"""Fused trunk conv kernels (ops/fused_conv.py): interpret-mode parity of the
Pallas kernels against the XLA references, and end-to-end fused-vs-unfused
equivalence of the DLA/ResNet eval paths (FORCE_INTERPRET exercises the fused
branches on CPU; on TPU the same code runs the compiled kernels)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedod.ops import fused_conv
from threedod.ops.fused_conv import (
    basic_block_reference,
    fused_basic_block,
    fused_tree_tail,
    tree_tail_reference,
)


def _rand_bb(rng, c):
    return tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (
            rng.randn(3, 3, c, c) * 0.05,
            rng.randn(c) * 0.1,
            rng.randn(3, 3, c, c) * 0.05,
            rng.randn(c) * 0.1,
        )
    )


@pytest.mark.parametrize(
    "B,H,W,C,ht",
    [(1, 8, 12, 8, 8), (2, 16, 12, 8, 8), (1, 32, 21, 16, 16)],
)
def test_fused_basic_block_parity(B, H, W, C, ht):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    w1, b1, w2, b2 = _rand_bb(rng, C)
    ref = basic_block_reference(x, w1, b1, w2, b2)
    got = fused_basic_block(x, w1, b1, w2, b2, interpret=True, ht=ht)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize(
    "two_blocks,n_children,incl,rres",
    [
        (False, 0, False, False),
        (False, 1, False, False),
        (True, 1, True, False),
        (True, 0, False, True),
    ],
)
def test_fused_tree_tail_parity(two_blocks, n_children, incl, rres):
    rng = np.random.RandomState(1)
    B, H, W, C, child_c = 2, 16, 12, 8, 4
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    children = tuple(
        jnp.asarray(rng.randn(B, H, W, child_c).astype(np.float32) * 0.5)
        for _ in range(n_children)
    )
    bb_a = _rand_bb(rng, C) if two_blocks else None
    bb_b = _rand_bb(rng, C)
    ctot = 2 * C + child_c * n_children + (C if incl else 0)
    wr = jnp.asarray(rng.randn(ctot, C).astype(np.float32) * 0.05)
    br = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    kw = dict(two_blocks=two_blocks, include_input_child=incl, root_residual=rres)
    ref = tree_tail_reference(x, children, bb_a, bb_b, wr, br, **kw)
    got = fused_tree_tail(x, children, bb_a, bb_b, wr, br, interpret=True, ht=8, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize(
    "B,H2,W2,cin,cout,proj,pool,ht",
    [
        (1, 16, 24, 8, 16, True, True, 8),
        (2, 32, 22, 8, 16, True, True, 8),
        (1, 16, 24, 16, 16, False, True, 8),
        (1, 16, 24, 8, 16, True, False, 8),  # resnet downsample semantics
    ],
)
def test_fused_block_down_parity(B, H2, W2, cin, cout, proj, pool, ht):
    from threedod.ops.fused_conv import block_down_reference, fused_block_down

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, H2, W2, cin).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, cout, cout).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    wp = jnp.asarray(rng.randn(1, 1, cin, cout).astype(np.float32) * 0.05) if proj else None
    bp = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1) if proj else None
    ref = block_down_reference(x, w1, b1, w2, b2, wp, bp, pool_residual=pool)
    got = fused_block_down(
        x, w1, b1, w2, b2, wp, bp, pool_residual=pool, interpret=True, ht=ht
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.fixture
def force_interpret():
    fused_conv.FORCE_INTERPRET = True
    try:
        yield
    finally:
        fused_conv.FORCE_INTERPRET = False


def test_dla34_fused_eval_equivalence(force_interpret):
    """DLA34 eval: the fused tail path must match the stock path exactly
    (both f32 here; on TPU both run bf16)."""
    from threedod.models.backbones.dla import build_dla

    trunk = build_dla("dla34", dtype=jnp.float32)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 128, 96, 3).astype(np.float32))
    variables = trunk.init(jax.random.PRNGKey(0), x, train=True)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    fused_conv.FORCE_INTERPRET = False
    ref = trunk.apply(variables, x, train=False)
    fused_conv.FORCE_INTERPRET = True
    assert fused_conv.fused_conv_available() and fused_conv.kernel_interpret()
    got = trunk.apply(variables, x, train=False)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=2e-4,
            err_msg=f"level {k}",
        )


def test_resnet34_fused_eval_equivalence(force_interpret):
    from threedod.models.backbones.resnet import build_resnet

    trunk = build_resnet("resnet34", dtype=jnp.float32)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 128, 96, 3).astype(np.float32))
    variables = trunk.init(jax.random.PRNGKey(0), x, train=True)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    fused_conv.FORCE_INTERPRET = False
    ref = trunk.apply(variables, x, train=False)
    fused_conv.FORCE_INTERPRET = True
    got = trunk.apply(variables, x, train=False)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=2e-4,
            err_msg=f"level {k}",
        )


def test_dla34_fused_paths_actually_engage(force_interpret):
    """Guard against the fused branch silently never triggering: at a
    128x96 input, levels 2-4 tails and the resnet-style stride-1 blocks
    must be eligible."""
    assert fused_conv.pick_row_tile(32, 24, 64) == 32
    assert fused_conv.pick_row_tile(16, 12, 128, two_blocks=True) == 16
    assert fused_conv.pick_row_tile(8, 6, 256) == 8
    assert fused_conv.pick_row_tile(4, 3, 512) is None  # falls back cleanly


def test_fused_conv_relu_head_parity():
    from threedod.ops.fused_conv import conv_relu_head_reference, fused_conv_relu_head

    rng = np.random.RandomState(5)
    B, H, W, C, n_out = 2, 16, 11, 32, 15
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    wc = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
    bc = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    wh = jnp.asarray(rng.randn(C, n_out).astype(np.float32) * 0.05)
    bh = jnp.asarray(rng.randn(n_out).astype(np.float32) * 0.1)
    ref = conv_relu_head_reference(x, wc, bc, wh, bh)
    got = fused_conv_relu_head(x, wc, bc, wh, bh, interpret=True, ht=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_rpn_head_fused_eval_equivalence(force_interpret):
    from threedod.models.rpn import RPNHead

    head = RPNHead(num_anchors=3, dtype=jnp.float32)
    rng = np.random.RandomState(6)
    feats = {
        "p2": jnp.asarray(rng.randn(1, 32, 24, 256).astype(np.float32) * 0.5),
        "p3": jnp.asarray(rng.randn(1, 16, 12, 256).astype(np.float32) * 0.5),
    }
    variables = head.init(jax.random.PRNGKey(0), feats, train=True)

    fused_conv.FORCE_INTERPRET = False
    ref_l, ref_r = head.apply(variables, feats, train=False)
    fused_conv.FORCE_INTERPRET = True
    got_l, got_r = head.apply(variables, feats, train=False)
    for k in feats:
        np.testing.assert_allclose(np.asarray(got_l[k]), np.asarray(ref_l[k]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_r[k]), np.asarray(ref_r[k]), atol=2e-4)


def test_fpn_fused_eval_equivalence(force_interpret):
    from threedod.models.backbones.fpn import FPN

    fpn = FPN(out_channels=32, dtype=jnp.float32)
    rng = np.random.RandomState(8)
    feats = {
        "p2": jnp.asarray(rng.randn(1, 64, 84, 16).astype(np.float32) * 0.5),
        "p3": jnp.asarray(rng.randn(1, 32, 42, 24).astype(np.float32) * 0.5),
        "p4": jnp.asarray(rng.randn(1, 16, 21, 32).astype(np.float32) * 0.5),
        "p5": jnp.asarray(rng.randn(1, 8, 10, 48).astype(np.float32) * 0.5),
    }
    variables = fpn.init(jax.random.PRNGKey(0), feats, train=True)

    fused_conv.FORCE_INTERPRET = False
    ref = fpn.apply(variables, feats, train=False)
    fused_conv.FORCE_INTERPRET = True
    got = fpn.apply(variables, feats, train=False)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=2e-4, err_msg=k
        )


def test_full_model_fused_inference_equivalence(force_interpret):
    """End-to-end RCNN3D inference: the fused trunk/FPN/RPN-head paths must
    reproduce the stock path through the FULL model (detection boxes,
    scores, 3D corners), not just per-module — this catches wiring bugs
    (level ordering, carry direction, head packing) that per-kernel parity
    cannot."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_model import tiny_batch, tiny_cfg

    from threedod.models import build_model

    cfg = tiny_cfg()
    model = build_model(cfg)
    batch = tiny_batch(b=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    variables = {k: variables[k] for k in ("params", "batch_stats") if k in variables}

    fused_conv.FORCE_INTERPRET = False
    ref = model.apply(variables, batch, train=False)
    fused_conv.FORCE_INTERPRET = True
    assert fused_conv.fused_conv_available()
    got = model.apply(variables, batch, train=False)

    # identical proposal/detection selection requires near-identical logits;
    # compare the final detection tensors.
    np.testing.assert_allclose(np.asarray(got.boxes), np.asarray(ref.boxes), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got.corners3d), np.asarray(ref.corners3d), atol=5e-3
    )


def test_tree_stride1_with_projection_uses_projected_residual(force_interpret):
    """A stride-1 Tree with a projection must NOT take the fused two-block
    tail (which hands raw x to tree1 as its residual): regression for the
    gate dropping proj(x) silently when cin == features."""
    from threedod.models.backbones.dla import BasicBlock, Tree

    tree = Tree(
        levels=1, block=BasicBlock, features=16, stride=1, project=True,
        dtype=jnp.float32,
    )
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 32, 32, 16).astype(np.float32))
    variables = tree.init(jax.random.PRNGKey(0), x, train=True)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    assert "project" in variables["params"], "projection params must exist"

    fused_conv.FORCE_INTERPRET = False
    ref = tree.apply(variables, x, train=False)
    fused_conv.FORCE_INTERPRET = True
    got = tree.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
