"""Ops tests: roi_align, NMS, matcher/sampler."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from threedod.ops import (
    assign_fpn_levels,
    batched_nms,
    match_candidates,
    multilevel_roi_align,
    multilevel_roi_align_dense,
    multilevel_roi_align_windowed,
    nms_mask,
    roi_align,
    subsample_fg_bg,
)


class TestRoiAlign:
    def test_constant_map(self):
        f = jnp.full((16, 16, 4), 3.0)
        boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
        out = roi_align(f, boxes, output_size=7)
        assert out.shape == (1, 7, 7, 4)
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)

    def test_linear_gradient_map(self):
        # feature = x coordinate; pooled values should match bin centers
        xs = jnp.arange(32.0)
        f = jnp.tile(xs[None, :, None], (32, 1, 1))
        boxes = jnp.asarray([[4.0, 4.0, 20.0, 20.0]])
        out = np.asarray(roi_align(f, boxes, output_size=4))[0, :, :, 0]
        # bin centers in x: 4 + (i+0.5)*4 - 0.5 (aligned)
        expect = 4 + (np.arange(4) + 0.5) * 4 - 0.5
        np.testing.assert_allclose(out[0], expect, atol=1e-4)

    def test_out_of_bounds_zero(self):
        f = jnp.ones((8, 8, 1))
        boxes = jnp.asarray([[-100.0, -100.0, -50.0, -50.0]])
        out = np.asarray(roi_align(f, boxes, output_size=3))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_border_semantics_v2(self):
        """ROIAlignV2 border rule (d2/torchvision bilinear_interpolate):
        samples zero only outside [-1, dim]; inside the band the coordinate
        clamps into [0, dim-1], so edge samples take the border cell at FULL
        weight. Hand-computed on a 2x2 map (round-5 parity fix: the old
        tap-validity rule returned 10.0 / 15.0 here)."""
        f = jnp.asarray([[10.0, 20.0], [30.0, 40.0]])[..., None]
        boxes = jnp.asarray([[-1.0, 0.0, 1.0, 2.0], [1.0, 0.0, 3.0, 2.0]])
        out = np.asarray(roi_align(f, boxes, output_size=1, sampling_ratio=2))
        # box 1: x samples at -1.0 (clamps to col 0) and 0.0; y at 0.0, 1.0
        #   -> mean(10, 10, 30, 30) = 20
        # box 2: x samples at 1.0 and 2.0 (band <= w=2, clamps to col 1)
        #   -> mean(20, 20, 40, 40) = 30
        np.testing.assert_allclose(out.ravel(), [20.0, 30.0], atol=1e-5)
        # windowed + packed multilevel paths implement the same rule
        feats = {"p2": f}
        boxes4 = boxes * 4.0  # p2 stride 4 -> same feature coords
        a = np.asarray(multilevel_roi_align(feats, boxes4, output_size=1))
        b = np.asarray(
            multilevel_roi_align_windowed(feats, boxes4, output_size=1, window=8)
        )
        np.testing.assert_allclose(a.ravel(), [20.0, 30.0], atol=1e-5)
        np.testing.assert_allclose(b.ravel(), [20.0, 30.0], atol=1e-5)

    def test_level_assignment(self):
        boxes = jnp.asarray(
            [[0, 0, 56, 56], [0, 0, 224, 224], [0, 0, 448, 448], [0, 0, 1000, 1000]],
            jnp.float32,
        )
        lv = np.asarray(assign_fpn_levels(boxes))
        assert lv.tolist() == [2, 4, 5, 6]

    def test_packed_equals_dense(self):
        rng = np.random.RandomState(0)
        feats = {
            f"p{i + 2}": jnp.asarray(rng.randn(64 >> i, 80 >> i, 16).astype(np.float32))
            for i in range(5)
        }
        xy = rng.uniform(0, 150, (40, 2))
        wh = rng.uniform(10, 300, (40, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
        a = multilevel_roi_align(feats, boxes)
        b = multilevel_roi_align_dense(feats, boxes)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_multilevel(self):
        feats = {
            "p2": jnp.full((64, 64, 2), 2.0),
            "p3": jnp.full((32, 32, 2), 3.0),
            "p4": jnp.full((16, 16, 2), 4.0),
            "p5": jnp.full((8, 8, 2), 5.0),
            "p6": jnp.full((4, 4, 2), 6.0),
        }
        boxes = jnp.asarray([[10.0, 10.0, 40.0, 40.0], [0.0, 0.0, 250.0, 250.0]])
        out = np.asarray(multilevel_roi_align(feats, boxes, output_size=2))
        np.testing.assert_allclose(out[0], 2.0, atol=1e-5)  # small box -> p2
        np.testing.assert_allclose(out[1], 4.0, atol=1e-5)  # 250px box -> p4


def np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter) > thresh:
                suppressed[j] = True
    return sorted(keep)


class TestNMS:
    def test_matches_numpy_greedy(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            xy = rng.uniform(0, 80, (50, 2))
            wh = rng.uniform(5, 40, (50, 2))
            boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
            scores = rng.rand(50).astype(np.float32)
            keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
            expect = np_greedy_nms(boxes, scores, 0.5)
            assert sorted(np.nonzero(keep)[0].tolist()) == expect

    def test_invalid_never_kept(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        keep = np.asarray(nms_mask(boxes, scores, 0.5, valid=jnp.asarray([True, False])))
        assert keep.tolist() == [True, False]

    def test_blocked_matches_fixpoint(self):
        # nms_mask_blocked must reproduce nms_mask exactly, including on
        # dense clusters (long suppression chains crossing block edges),
        # invalid entries, and N not divisible by the block size.
        from threedod.ops.nms import nms_mask_blocked

        rng = np.random.RandomState(7)
        for n, block in [(300, 64), (257, 64), (512, 128), (90, 32)]:
            # half scattered, half piled into 4 tight clusters
            xy = rng.uniform(0, 400, (n, 2)).astype(np.float32)
            centers = rng.uniform(50, 350, (4, 2))
            m = n // 2
            xy[:m] = centers[rng.randint(0, 4, m)] + rng.uniform(-8, 8, (m, 2))
            wh = rng.uniform(10, 60, (n, 2)).astype(np.float32)
            boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=1))
            scores = jnp.asarray(rng.rand(n).astype(np.float32))
            valid = jnp.asarray(rng.rand(n) > 0.05)
            ref = np.asarray(nms_mask(boxes, scores, 0.5, valid=valid))
            got = np.asarray(
                nms_mask_blocked(boxes, scores, 0.5, valid=valid, block=block)
            )
            assert (ref == got).all(), (n, block)

    def test_batched_by_class(self):
        # identical boxes, different classes: both survive
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        keep = np.asarray(batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.5))
        assert keep.tolist() == [True, True]
        keep_same = np.asarray(batched_nms(boxes, scores, jnp.asarray([0, 0]), 0.5))
        assert keep_same.tolist() == [True, False]


class TestMatcherSampler:
    def test_match_thresholds(self):
        gt = jnp.asarray([[0.0, 0, 10, 10]])
        cands = jnp.asarray([[0.0, 0, 10, 10], [0.0, 0, 5, 10], [50.0, 50, 60, 60]])
        m = match_candidates(gt, jnp.asarray([True]), cands, 0.3, 0.7)
        assert np.asarray(m.matched_labels).tolist() == [1, -1, 0]

    def test_low_quality_forcing(self):
        gt = jnp.asarray([[0.0, 0, 10, 10]])
        cands = jnp.asarray([[0.0, 0, 4, 10], [50.0, 50, 60, 60]])  # best iou 0.4
        m = match_candidates(gt, jnp.asarray([True]), cands, 0.3, 0.7, allow_low_quality=True)
        assert int(np.asarray(m.matched_labels)[0]) == 1

    def test_no_gt_all_bg(self):
        gt = jnp.zeros((2, 4))
        cands = jnp.asarray([[0.0, 0, 10, 10]])
        m = match_candidates(gt, jnp.zeros((2,), bool), cands, 0.3, 0.7)
        assert int(np.asarray(m.matched_labels)[0]) == 0

    def test_subsample_counts_and_prefix(self):
        rng = np.random.RandomState(0)
        labels = jnp.asarray(np.concatenate([np.ones(30), np.zeros(200), -np.ones(20)]).astype(np.int32))
        ious = jnp.asarray(rng.rand(250).astype(np.float32))
        idx, is_fg, valid = subsample_fg_bg(jax.random.PRNGKey(0), labels, ious, 64, 0.25)
        assert idx.shape == (64,)
        n_fg = int(np.asarray(is_fg).sum())
        assert n_fg == 16  # min(30, 64*0.25)
        # fg occupies the leading prefix
        assert np.asarray(is_fg)[:n_fg].all()
        assert not np.asarray(is_fg)[n_fg:].any()
        assert bool(np.asarray(valid).all())
        # sampled indices actually have the right labels
        lab = np.asarray(labels)[np.asarray(idx)]
        assert (lab[:n_fg] == 1).all() and (lab[n_fg:] == 0).all()

    def test_subsample_scarce_fg(self):
        labels = jnp.asarray(np.concatenate([np.ones(3), np.zeros(10)]).astype(np.int32))
        ious = jnp.ones((13,)) * 0.5
        idx, is_fg, valid = subsample_fg_bg(jax.random.PRNGKey(1), labels, ious, 8, 0.5)
        assert int(np.asarray(is_fg).sum()) == 3  # all available fg
        assert int(np.asarray(valid).sum()) == 8  # backfilled with bg

    def test_top_take_mask_matches_rank_selection(self):
        """The radix-bisection top-take mask must select exactly the set the
        double-argsort rank construction selected (rank < take <=> value >=
        take-th largest; ties are measure-zero for continuous keys)."""
        from threedod.ops.order_stats import top_take_mask

        rng = np.random.RandomState(0)
        for t in range(25):
            vals = rng.randn(500).astype(np.float32)
            mask = rng.rand(500) < rng.uniform(0.02, 0.5)
            take = int(rng.randint(0, 30))
            key = np.where(mask, vals, -np.inf)
            rank = np.argsort(np.argsort(-key))
            expected = mask & (rank < min(take, int(mask.sum())))
            got = np.asarray(
                top_take_mask(
                    jnp.asarray(vals)[None], jnp.asarray(mask)[None],
                    jnp.asarray([take]),
                )[0]
            )
            np.testing.assert_array_equal(got, expected, err_msg=f"trial {t}")

    def test_fused_match_and_ignore_matches_sequential(self):
        """match_and_ignore (one shared intersection matrix) must reproduce
        match_candidates + apply_ignore_regions bit-exactly, including mixed
        valid/ignore GT, empty-ignore, and no-GT cases."""
        from threedod.ops.matcher import apply_ignore_regions, match_and_ignore

        rng = np.random.RandomState(3)
        for t in range(12):
            m_gt, r_c = 16, 400
            xy = rng.uniform(0, 200, (m_gt, 2)).astype(np.float32)
            wh = rng.uniform(5, 80, (m_gt, 2)).astype(np.float32)
            gtb = jnp.asarray(np.concatenate([xy, xy + wh], -1))
            gtv = jnp.asarray(rng.rand(m_gt) > (0.95 if t == 0 else 0.3))
            ign = jnp.asarray(rng.rand(m_gt) > (1.1 if t == 1 else 0.6)) & gtv
            valid_gt = gtv & ~ign
            cxy = rng.uniform(0, 220, (r_c, 2)).astype(np.float32)
            cwh = rng.uniform(5, 90, (r_c, 2)).astype(np.float32)
            cands = jnp.asarray(np.concatenate([cxy, cxy + cwh], -1))

            ref_m = match_candidates(gtb, valid_gt, cands, 0.3, 0.7, allow_low_quality=True)
            got_m, in_ign = match_and_ignore(
                gtb, valid_gt, ign, cands, 0.3, 0.7, 0.5, allow_low_quality=True
            )
            for a, b in zip(ref_m, got_m):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            labels = ref_m.matched_labels
            ref_lab = apply_ignore_regions(labels, cands, gtb, ign, 0.5)
            got_lab = jnp.where(in_ign & (labels == 0), -1, labels)
            np.testing.assert_array_equal(np.asarray(ref_lab), np.asarray(got_lab))

    def test_iou_weighting_bias(self):
        # candidates with iou ~1 should be sampled far more often than ~0.01
        labels = jnp.asarray(np.ones(100, np.int32))
        ious = jnp.asarray(np.concatenate([np.full(50, 1.0), np.full(50, 0.01)]).astype(np.float32))
        counts = np.zeros(100)
        for s in range(50):
            idx, is_fg, _ = subsample_fg_bg(jax.random.PRNGKey(s), labels, ious, 20, 1.0)
            counts[np.asarray(idx)[np.asarray(is_fg)]] += 1
        assert counts[:50].sum() > 5 * counts[50:].sum()


class TestWindowedRoiAlign:
    """multilevel_roi_align_windowed: the TPU-fast separable-matmul path."""

    def _feats_boxes(self, seed=0, n=200, ar_max=1.6):
        from threedod.ops.roi_align import multilevel_roi_align_windowed  # noqa

        rng = np.random.RandomState(seed)
        feats = {
            f"p{l}": jnp.asarray(rng.randn(512 // s, 672 // s, 8).astype(np.float32))
            for l, s in zip(range(2, 7), (4, 8, 16, 32, 64))
        }
        ctr = rng.rand(n, 2) * np.array([672, 512]) * 1.1 - 20
        side = np.exp(rng.uniform(np.log(20), np.log(400), (n, 1)))
        ar = np.exp(rng.uniform(-np.log(ar_max), np.log(ar_max), (n, 1)))
        wh = np.concatenate([side * ar, side / ar], 1)
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
        return feats, jnp.asarray(boxes)

    def test_matches_packed_gather(self):
        from threedod.ops.roi_align import (
            multilevel_roi_align,
            multilevel_roi_align_windowed,
        )

        feats, boxes = self._feats_boxes()
        a = np.asarray(multilevel_roi_align(feats, boxes))
        b = np.asarray(multilevel_roi_align_windowed(feats, boxes))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_extreme_aspect_pools_constant(self):
        """Level-bumped extreme-aspect ROIs still pool exact values."""
        from threedod.ops.roi_align import multilevel_roi_align_windowed

        feats, _ = self._feats_boxes()
        cf = {k: jnp.full_like(v, 2.5) for k, v in feats.items()}
        boxes = jnp.asarray(
            [[10.0, 200.0, 650.0, 240.0], [300.0, 5.0, 340.0, 500.0]], jnp.float32
        )
        out = np.asarray(multilevel_roi_align_windowed(cf, boxes))
        np.testing.assert_allclose(out, 2.5, atol=1e-4)

    def test_window_bump_rate(self):
        """Quantify the WINDOW_Y=32 level bump vs canonical Detectron2
        assignment (ADVICE r1: the 30-cell tap budget bumps moderately
        elongated ROIs one level coarser than the 46-cell budget did).

        On a realistic box distribution (log-uniform scale 20-400 px,
        aspect up to 3) the bumped fraction must stay small, and ROIs with
        aspect <= 1.15 must never bump (sqrt(area) < 28 cells implies max
        extent <= 28 * sqrt(1.15) < 30)."""
        from threedod.ops.roi_align import assign_fpn_levels
        from threedod.ops.roi_align_pallas import WINDOW_Y

        rng = np.random.RandomState(7)
        n = 5000
        ctr = rng.rand(n, 2) * np.array([672, 512])
        side = np.exp(rng.uniform(np.log(20), np.log(400), (n, 1)))
        # w/h = ar^2, so cap true aspect at 3
        ar = np.exp(rng.uniform(-np.log(3.0), np.log(3.0), (n, 1)) / 2)
        wh = np.concatenate([side * ar, side / ar], 1)
        boxes = jnp.asarray(
            np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
        )
        canonical = np.asarray(assign_fpn_levels(boxes, 2, 6))
        ext = np.maximum(wh[:, 0], wh[:, 1]).ravel()
        need = np.ceil(np.log2(np.maximum(ext / 4.0 / (WINDOW_Y - 2), 1e-6)))
        bumped = np.maximum(canonical, np.clip(need, 0, 4).astype(int) + 2)
        frac = (bumped != canonical).mean()
        assert frac < 0.25, frac  # measured 0.176 at aspect<=3
        sq = (ar.ravel() <= np.sqrt(1.15)) & (ar.ravel() >= 1 / np.sqrt(1.15))
        assert (bumped[sq] == canonical[sq]).all()
        # never bumps more than one level on this distribution
        assert (bumped - canonical).max() <= 1

    def test_tpu_fallback_shares_bump_rule(self):
        """multilevel_roi_align_tpu's c%128 fallback must assign the same
        levels as the Pallas kernel would (window=WINDOW_Y), not the old
        48-cell budget."""
        from threedod.ops.roi_align import multilevel_roi_align_windowed
        from threedod.ops.roi_align_pallas import WINDOW_Y, multilevel_roi_align_tpu

        t = TestWindowedRoiAlign()
        feats, _ = t._feats_boxes()
        # elongated ROI in the bump gap (extent in (30, 46] cells at p2):
        # 160 px wide = 40 cells
        boxes = jnp.asarray([[100.0, 100.0, 260.0, 148.0]], jnp.float32)
        a = np.asarray(multilevel_roi_align_tpu(feats, boxes))
        b = np.asarray(
            multilevel_roi_align_windowed(feats, boxes, window=WINDOW_Y)
        )
        np.testing.assert_allclose(a, b, atol=1e-6)
        # and it genuinely differs from the old 48 budget (level changed)
        c = np.asarray(multilevel_roi_align_windowed(feats, boxes, window=48))
        assert np.abs(a - c).max() > 1e-3

    def test_tiny_feature_maps(self):
        """Maps smaller than the window (tiny test canvases) must not crash."""
        from threedod.ops.roi_align import multilevel_roi_align_windowed

        rng = np.random.RandomState(0)
        feats = {
            f"p{l}": jnp.asarray(rng.randn(96 // s, 128 // s, 4).astype(np.float32))
            for l, s in zip(range(2, 7), (4, 8, 16, 32, 64))
        }
        boxes = jnp.asarray([[4.0, 4.0, 60.0, 50.0], [0.0, 0.0, 120.0, 90.0]])
        out = np.asarray(multilevel_roi_align_windowed(feats, boxes))
        assert out.shape == (2, 7, 7, 4)
        assert np.isfinite(out).all()


class TestPallasRoiAlign:
    def test_tpu_kernel_matches_windowed(self):
        """Numerics parity of the Pallas kernel (runs only on real TPU;
        validated on v5e at max abs err 2.4e-7)."""
        import pytest

        if jax.default_backend() != "tpu":
            pytest.skip("Pallas TPU kernel requires the TPU backend")
        from threedod.ops.roi_align import multilevel_roi_align_windowed
        from threedod.ops.roi_align_pallas import multilevel_roi_align_tpu

        from threedod.ops.roi_align_pallas import WINDOW_Y

        t = TestWindowedRoiAlign()
        feats, boxes = t._feats_boxes()
        # both paths share the WINDOW_Y fit budget (one level-bump rule)
        a = np.asarray(multilevel_roi_align_windowed(feats, boxes, window=WINDOW_Y))
        b = np.asarray(multilevel_roi_align_tpu(feats, boxes))
        np.testing.assert_allclose(a, b, atol=2e-3)

        # C=128 actually runs the Pallas kernel (C=8 above takes the XLA
        # fallback); mix of small-class (<=14-cell) and big-class windows
        # including image-edge boxes
        rng = np.random.RandomState(11)
        feats = {
            nm: jnp.asarray(rng.randn(128 >> i, 168 >> i, 128).astype(np.float32))
            for i, nm in enumerate(["p2", "p3", "p4", "p5", "p6"])
        }
        n = 97
        x1 = rng.uniform(-20, 660, n)
        y1 = rng.uniform(-20, 500, n)
        w = np.exp(rng.uniform(np.log(4), np.log(500), n))
        h = np.exp(rng.uniform(np.log(4), np.log(400), n))
        bx = np.stack([x1, y1, np.minimum(x1 + w, 672), np.minimum(y1 + h, 512)], 1)
        bx[:3] = [[0, 0, 8, 8], [664, 504, 672, 512], [0, 440, 672, 512]]
        bx = jnp.asarray(np.clip(bx, 0, None).astype(np.float32))
        a = np.asarray(multilevel_roi_align_windowed(feats, bx, window=WINDOW_Y))
        b = np.asarray(multilevel_roi_align_tpu(feats, bx))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_tpu_backward_matches_packed_vjp(self):
        """Gradient parity of the Pallas RMW backward vs the packed-gather
        VJP with the same tap geometry (runs only on real TPU; validated on
        v5e at rel err 3.5e-7 f32)."""
        import pytest

        if jax.default_backend() != "tpu":
            pytest.skip("Pallas TPU kernel requires the TPU backend")
        from threedod.ops.roi_align import multilevel_roi_align
        from threedod.ops.roi_align_pallas import WINDOW_Y, multilevel_roi_align_tpu

        rng = np.random.RandomState(3)
        feats = {
            "p2": jnp.asarray(rng.randn(64, 80, 128).astype(np.float32)),
            "p3": jnp.asarray(rng.randn(32, 40, 128).astype(np.float32)),
        }
        xy = rng.uniform(0, 200, (64, 2)).astype(np.float32)
        wh = rng.uniform(4, 150, (64, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        cot = jnp.asarray(rng.randn(64, 7, 7, 128).astype(np.float32))

        g_pallas = jax.grad(
            lambda f: jnp.sum(multilevel_roi_align_tpu(f, boxes) * cot)
        )(feats)
        g_ref = jax.grad(
            lambda f: jnp.sum(
                multilevel_roi_align(f, boxes, fit_window=WINDOW_Y) * cot
            )
        )(feats)
        for k in feats:
            a, b = np.asarray(g_pallas[k]), np.asarray(g_ref[k])
            err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            assert err < 1e-5, (k, err)


class TestPallasRoiAlignInterpret:
    """CPU-suite pin of the REAL Pallas pool kernel via the interpreter.

    The TPU-only tests above validate compiled numerics on hardware; these
    run the same kernel code (DMA classes, window origins, selector-matmul
    weight construction, serialized RMW backward) through the Pallas
    interpreter so a kernel-logic regression is caught by the CPU suite,
    not only by bench.py's per-round hardware gate."""

    @pytest.fixture
    def interp(self):
        from threedod.ops import roi_align_pallas as rap

        rap.FORCE_INTERPRET = True
        try:
            yield
        finally:
            rap.FORCE_INTERPRET = False

    def _feats_boxes(self, n=16, c=128, seed=7):
        rng = np.random.RandomState(seed)
        feats = {
            "p2": jnp.asarray(rng.randn(64, 80, c).astype(np.float32)),
            "p3": jnp.asarray(rng.randn(32, 40, c).astype(np.float32)),
        }
        xy = rng.uniform(-10, 250, (n, 2)).astype(np.float32)
        wh = np.exp(rng.uniform(np.log(4), np.log(200), (n, 2))).astype(np.float32)
        boxes = jnp.asarray(np.clip(np.concatenate([xy, xy + wh], -1), 0, None))
        return feats, boxes

    def test_forward_matches_windowed_interpret(self, interp):
        from threedod.ops.roi_align import multilevel_roi_align_windowed
        from threedod.ops.roi_align_pallas import WINDOW_Y, multilevel_roi_align_tpu

        feats, boxes = self._feats_boxes()
        a = np.asarray(multilevel_roi_align_windowed(feats, boxes, window=WINDOW_Y))
        b = np.asarray(multilevel_roi_align_tpu(feats, boxes))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_backward_matches_windowed_interpret(self, interp):
        from threedod.ops.roi_align import multilevel_roi_align_windowed
        from threedod.ops.roi_align_pallas import WINDOW_Y, multilevel_roi_align_tpu

        feats, boxes = self._feats_boxes(n=8)

        def loss_k(f):
            return jnp.sum(jnp.sin(multilevel_roi_align_tpu(f, boxes)))

        def loss_o(f):
            return jnp.sum(
                jnp.sin(multilevel_roi_align_windowed(f, boxes, window=WINDOW_Y))
            )

        ga = jax.grad(loss_k)(feats)
        gb = jax.grad(loss_o)(feats)
        for k in feats:
            np.testing.assert_allclose(
                np.asarray(ga[k]), np.asarray(gb[k]), atol=1e-5, err_msg=k
            )

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_expanded_taps_build_matches_4matmul_interpret(self, interp, dtype):
        """TAPS_EXPANDED folds the spread-to-rows stage of the weight build
        into pre-broadcast tap inputs (2 selector matmuls instead of 4).
        Selector matmuls move single elements, so both builds must be
        bit-identical in every dtype."""
        from threedod.ops import roi_align_pallas as rap

        feats, boxes = self._feats_boxes(n=16)
        feats = {k: v.astype(dtype) for k, v in feats.items()}
        saved = rap.TAPS_EXPANDED
        try:
            rap.TAPS_EXPANDED = False
            base = np.asarray(
                rap.multilevel_roi_align_tpu(feats, boxes).astype(jnp.float32)
            )
            rap.TAPS_EXPANDED = True
            expanded = np.asarray(
                rap.multilevel_roi_align_tpu(feats, boxes).astype(jnp.float32)
            )
        finally:
            rap.TAPS_EXPANDED = saved
        np.testing.assert_array_equal(base, expanded)

    def test_batched_matches_per_image_interpret(self, interp):
        """Batched pooling (B images Y-stacked into one plane, one
        pallas_call) must match per-image calls exactly — forward and the
        RMW backward (images are disjoint in the stacked plane, so the
        accumulation order change across images cannot alter any value)."""
        from threedod.ops.roi_align_pallas import multilevel_roi_align_tpu

        f0, b0 = self._feats_boxes(n=8, seed=7)
        f1, b1 = self._feats_boxes(n=8, seed=13)
        fb = {k: jnp.stack([f0[k], f1[k]]) for k in f0}
        bb = jnp.stack([b0, b1])

        out_b = multilevel_roi_align_tpu(fb, bb)
        assert out_b.shape == (2, 8, 7, 7, 128)
        for i, (f, b) in enumerate([(f0, b0), (f1, b1)]):
            np.testing.assert_allclose(
                np.asarray(out_b[i]),
                np.asarray(multilevel_roi_align_tpu(f, b)),
                atol=1e-6,
            )

        cot = jnp.asarray(
            np.random.RandomState(0).randn(2, 8, 7, 7, 128).astype(np.float32)
        )
        gb = jax.grad(lambda f: jnp.sum(multilevel_roi_align_tpu(f, bb) * cot))(fb)
        for i, (f, b) in enumerate([(f0, b0), (f1, b1)]):
            gi = jax.grad(
                lambda f_: jnp.sum(multilevel_roi_align_tpu(f_, b) * cot[i])
            )(f)
            for k in f:
                np.testing.assert_allclose(
                    np.asarray(gb[k][i]), np.asarray(gi[k]), atol=1e-6,
                    err_msg=f"img{i} {k}",
                )

    def test_batched_fallback_c_not_128(self):
        """Batched entry with C % 128 != 0 vmaps the XLA windowed path."""
        from threedod.ops.roi_align_pallas import multilevel_roi_align_tpu

        f0, b0 = self._feats_boxes(n=4, c=32, seed=3)
        fb = {k: jnp.stack([v, v]) for k, v in f0.items()}
        out = multilevel_roi_align_tpu(fb, jnp.stack([b0, b0]))
        assert out.shape == (2, 4, 7, 7, 32)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))

    @pytest.mark.parametrize("group", [2, 4])
    def test_group_pooling_matches_per_roi_interpret(self, interp, group):
        """POOL_GROUP fuses g ROIs into one block-diagonal matmul; the
        off-diagonal blocks are exact zeros so outputs must match the
        per-ROI path bit-for-bit. bf16 features give 8 ROIs per grid step,
        so both group sizes genuinely engage (the branch needs r % g == 0)."""
        from threedod.ops import roi_align_pallas as rap

        assert rap._rois_per_step(2) % group == 0  # branch must engage
        feats, boxes = self._feats_boxes(n=16)
        feats = {k: v.astype(jnp.bfloat16) for k, v in feats.items()}
        saved = rap.POOL_GROUP
        try:
            rap.POOL_GROUP = 1
            base = np.asarray(
                rap.multilevel_roi_align_tpu(feats, boxes).astype(jnp.float32)
            )
            rap.POOL_GROUP = group
            grouped = np.asarray(
                rap.multilevel_roi_align_tpu(feats, boxes).astype(jnp.float32)
            )
        finally:
            rap.POOL_GROUP = saved
        np.testing.assert_array_equal(base, grouped)
