#!/usr/bin/env python
"""Benchmark: Cube R-CNN (DLA34-FPN) batched 3D-detection inference on TPU.

Measures end-to-end jitted forward throughput (backbone -> RPN -> 2D head ->
cube head -> 3D box assembly) at the reference's test resolution contract
(shortest edge 512). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Timing methodology (important on a remote-relay TPU): block_until_ready on
this platform does NOT reliably wait for completion, so each measurement
chains a scalar reduction of every iteration's output and forces it to host
with device_get; constant dispatch/transfer overhead is cancelled by timing
two iteration counts and using the difference.

The reference publishes no throughput numbers (BASELINE.md: accuracy only);
`vs_baseline` is computed against the reference's measured-fresh proxy of
~10 im/s for single-GPU Cube R-CNN eval at this resolution (the thesis ran
single A40/V100 jobs; omni3d_evaluation.py logs s/iter — typical DLA34
inference there is ~0.1 s/im).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMS_PER_S = 10.0
BATCH = 8
ITERS_SHORT = 5
ITERS_LONG = 25


def kernel_parity_gate():
    """Per-round TPU regression gate for the Pallas ROIAlign kernel.

    The CPU suite can only exercise the XLA oracle (the Pallas kernel needs
    the TPU backend); this gate runs a small forward + backward parity check
    against the bit-identical windowed oracle on every driver bench run so a
    kernel regression can never ship silently with a green CPU suite.
    Raises on mismatch (the driver then records a failed bench).
    """
    from threedod.ops.roi_align import multilevel_roi_align_windowed
    from threedod.ops.roi_align_pallas import WINDOW_Y, multilevel_roi_align_tpu

    rng = np.random.RandomState(7)
    # C=128 engages the Pallas kernel (not the c%128 fallback); boxes cover
    # both window classes and image-edge clamping.
    feats = {
        "p2": jnp.asarray(rng.randn(64, 80, 128).astype(np.float32)),
        "p3": jnp.asarray(rng.randn(32, 40, 128).astype(np.float32)),
    }
    xy = rng.uniform(-10, 250, (32, 2)).astype(np.float32)
    wh = np.exp(rng.uniform(np.log(4), np.log(200), (32, 2))).astype(np.float32)
    boxes = jnp.asarray(np.clip(np.concatenate([xy, xy + wh], -1), 0, None))
    a = np.asarray(multilevel_roi_align_windowed(feats, boxes, window=WINDOW_Y))
    b = np.asarray(multilevel_roi_align_tpu(feats, boxes))
    fwd_err = float(np.abs(a - b).max())
    assert fwd_err < 1e-3, f"Pallas ROIAlign forward parity broke: {fwd_err}"

    cot = jnp.asarray(rng.randn(32, 7, 7, 128).astype(np.float32))
    g_p = jax.grad(lambda f: jnp.sum(multilevel_roi_align_tpu(f, boxes) * cot))(feats)
    g_r = jax.grad(
        lambda f: jnp.sum(multilevel_roi_align_windowed(f, boxes, window=WINDOW_Y) * cot)
    )(feats)
    for k in feats:
        x, y = np.asarray(g_p[k]), np.asarray(g_r[k])
        err = float(np.abs(x - y).max() / (np.abs(y).max() + 1e-9))
        assert err < 1e-4, f"Pallas ROIAlign backward parity broke at {k}: {err}"

    # batched path (the production call shape: one kernel over the
    # Y-stacked batch plane) must match the per-image results exactly
    fb = {k: jnp.stack([v, v * 0.5]) for k, v in feats.items()}
    bb = jnp.stack([boxes, boxes * 0.75])
    out_b = np.asarray(multilevel_roi_align_tpu(fb, bb))
    for i in range(2):
        ref_i = np.asarray(
            multilevel_roi_align_tpu(
                {k: fb[k][i] for k in fb}, bb[i]
            )
        )
        berr = float(np.abs(out_b[i] - ref_i).max())
        assert berr < 1e-5, f"batched pool parity broke at image {i}: {berr}"
    gb = jax.grad(lambda f: jnp.sum(multilevel_roi_align_tpu(f, bb) ** 2))(fb)
    for k in fb:
        assert np.isfinite(np.asarray(gb[k])).all(), f"batched pool grad not finite: {k}"

    from threedod.ops import fused_conv

    if not fused_conv.fused_conv_available():
        return
    # fused trunk kernels ride the same per-round gate once enabled on TPU
    x = jnp.asarray(rng.randn(2, 32, 42, 128).astype(np.float32) * 0.5).astype(jnp.bfloat16)
    bb = tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (rng.randn(3, 3, 128, 128) * 0.05, rng.randn(128) * 0.1,
                  rng.randn(3, 3, 128, 128) * 0.05, rng.randn(128) * 0.1)
    )
    ref = np.asarray(fused_conv.basic_block_reference(x, *bb).astype(jnp.float32))
    got = np.asarray(fused_conv.fused_basic_block(x, *bb, ht=16).astype(jnp.float32))
    err = float(np.abs(ref - got).max())
    assert err < 0.1, f"fused BasicBlock parity broke: {err}"
    wd = jnp.asarray(rng.randn(1, 1, 128, 256).astype(np.float32) * 0.05)
    bd = jnp.asarray(rng.randn(256).astype(np.float32) * 0.1)
    bbd = tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (rng.randn(3, 3, 128, 256) * 0.05, rng.randn(256) * 0.1,
                  rng.randn(3, 3, 256, 256) * 0.05, rng.randn(256) * 0.1)
    )
    ref = np.asarray(
        fused_conv.block_down_reference(x, *bbd, wd, bd, pool_residual=True).astype(jnp.float32)
    )
    got = np.asarray(
        fused_conv.fused_block_down(x, *bbd, wd, bd, pool_residual=True, ht=8).astype(jnp.float32)
    )
    err = float(np.abs(ref - got).max())
    assert err < 0.1, f"fused block-down parity broke: {err}"


def wait_for_tpu(budget_s=None, probe_timeout=120, sleep_s=120):
    """The axon relay has transient outages (observed 2h+): probe with a tiny
    device round-trip in a subprocess (a dead relay HANGS the first op rather
    than erroring, so the probe needs an external timeout) and keep retrying
    within a wall-clock budget. Default budget 45 min — long enough to
    survive a typical relay flap during a driver capture — tunable via
    THREEDOD_TPU_WAIT_S for interactive runs that want to fail fast."""
    import subprocess

    if budget_s is None:
        budget_s = float(os.environ.get("THREEDOD_TPU_WAIT_S", 2700))
    probe = (
        "import jax, jax.numpy as jnp;"
        "jax.device_get(jnp.ones((8,8)).sum())"
    )
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", probe], timeout=probe_timeout,
                check=True, capture_output=True,
            )
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                return False
            print(
                f"# TPU relay probe {attempt} failed; retrying "
                f"({int(remaining)}s left in budget)",
                file=sys.stderr,
            )
            time.sleep(min(sleep_s, max(remaining, 1)))


def main():
    from threedod.config import Config
    from threedod.data.batch import Batch
    from threedod.models import build_model

    # Probe via subprocess BEFORE jax.default_backend(): on a dead relay the
    # first in-process backend touch hangs with no recourse, while the
    # subprocess probe is externally timed out and retryable.
    if "cpu" not in os.environ.get("JAX_PLATFORMS", "").lower():
        if not wait_for_tpu():
            print(
                json.dumps({"error": "TPU relay unreachable after retries"}),
                file=sys.stderr,
            )
            sys.exit(2)

    if jax.default_backend() == "tpu":
        kernel_parity_gate()

    cfg = Config()
    cfg.shapes.canvas_height = 512
    cfg.shapes.canvas_width = 672
    cfg.shapes.max_detections = 100
    cfg.model.roi_heads.num_classes = 38  # SUNRGBD-scale category set
    cfg.model.backbone = "dla34"
    cfg.model.dtype = "bfloat16"

    rng = np.random.RandomState(0)
    K = np.tile(
        np.array([[[530.0, 0, 336.0], [0, 530.0, 256.0], [0, 0, 1]]], np.float32),
        (BATCH, 1, 1),
    )
    batch = Batch(
        image=jnp.asarray(rng.randn(BATCH, 512, 672, 3).astype(np.float32)),
        image_hw=jnp.asarray(np.tile([512, 672], (BATCH, 1)).astype(np.int32)),
        K=jnp.asarray(K),
        im_scale_ratio=jnp.full((BATCH,), 730.0 / 512.0),
        image_id=jnp.zeros((BATCH,), jnp.int32),
    )

    model = build_model(cfg)
    init_fn = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, b, train=False
    ))
    variables = init_fn(batch)

    infer = jax.jit(lambda v, b: model.apply(v, b, train=False))

    def run(k):
        """k inference dispatches, all forced to completion by one scalar
        fetch that depends on every iteration's output."""
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for _ in range(k):
            det = infer(variables, batch)
            s = s + det.scores.sum().astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    run(2)  # warmup / compile
    d_short = run(ITERS_SHORT)
    d_long = run(ITERS_LONG)
    t_iter = (d_long - d_short) / (ITERS_LONG - ITERS_SHORT)

    ims_per_s = BATCH / t_iter
    print(
        json.dumps(
            {
                "metric": "cubercnn_dla34_infer_512px_bs8",
                "value": round(ims_per_s, 2),
                "unit": "images/sec",
                "vs_baseline": round(ims_per_s / BASELINE_IMS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
