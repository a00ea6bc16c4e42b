"""Native eval core: must agree exactly with the numpy fallback."""
import numpy as np
import pytest

from threedod.evaluation import omni3d_eval as oe

pytestmark = pytest.mark.skipif(
    not oe.HAS_NATIVE_EVAL, reason="native _evalc not built"
)


class TestNativeIoU:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        dts = np.concatenate([rng.uniform(0, 50, (20, 2)), rng.uniform(5, 40, (20, 2))], 1)
        gts = np.concatenate([rng.uniform(0, 50, (15, 2)), rng.uniform(5, 40, (15, 2))], 1)
        fast = oe._evalc.iou2d(dts, gts)

        # numpy reference (the fallback path, iscrowd present forces it)
        slow = oe.iou_2d_xywh(dts, gts, iscrowd=np.zeros(15, bool))
        np.testing.assert_allclose(fast, slow, atol=1e-12)


class TestNativeMatch:
    def test_matching_equivalence_via_eval(self):
        """Run a full Omni3DEval both ways and require identical stats."""
        rng = np.random.RandomState(1)
        gts, dts = [], []
        gid = 0
        from threedod.geometry import cuboid_verts
        import jax.numpy as jnp

        corners = np.asarray(cuboid_verts(jnp.asarray([0.0, 0, 5, 1, 1, 1]))).tolist()
        for img in range(4):
            for _ in range(rng.randint(1, 5)):
                gid += 1
                x, y = rng.uniform(0, 200, 2)
                w, h = rng.uniform(20, 80, 2)
                gts.append(
                    dict(id=gid, image_id=img, category_id=1, bbox=[x, y, w, h],
                         area=w * h, depth=5.0, ignore=bool(rng.rand() < 0.2),
                         ignore2D=False, ignore3D=False, bbox3D=corners)
                )
                gts[-1]["ignore2D"] = gts[-1]["ignore"]
                if rng.rand() < 0.8:
                    jx = x + rng.uniform(-10, 10)
                    dts.append(
                        dict(image_id=img, category_id=1, bbox=[jx, y, w, h],
                             score=float(rng.rand()), depth=5.0, area=w * h,
                             bbox3D=corners)
                    )
            # a couple of false positives
            dts.append(
                dict(image_id=img, category_id=1, bbox=[300, 300, 30, 30],
                     score=float(rng.rand()), depth=5.0, area=900.0, bbox3D=corners)
            )

        def run(native: bool):
            saved = oe._evalc
            if not native:
                oe._evalc = None
            try:
                ev = oe.Omni3DEval([dict(g) for g in gts], [dict(d) for d in dts], mode="2D")
                ev.evaluate()
                ev.accumulate()
                return ev.summarize()
            finally:
                oe._evalc = saved

        np.testing.assert_allclose(run(True), run(False), atol=1e-12)
