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


class TestNativeLoader:
    """native/loaderc.cpp: GIL-free JPEG + NPZ loading (skipped when the
    extension isn't built; native/setup.py builds it)."""

    @pytest.fixture(scope="class")
    def files(self, tmp_path_factory):
        from PIL import Image

        td = tmp_path_factory.mktemp("nio")
        rng = np.random.RandomState(0)
        img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
        jp = td / "x.jpg"
        Image.fromarray(img).save(jp, quality=95)
        cz = td / "c.npz"
        np.savez_compressed(
            cz,
            depth=rng.rand(41, 29).astype(np.float32),
            mask=rng.rand(13, 7) > 0.5,
            ids=np.arange(5, dtype=np.int64),
        )
        uz = td / "u.npz"
        np.savez(uz, depth=rng.rand(8, 9).astype(np.float32))
        return jp, cz, uz

    def test_jpeg_matches_pil(self, files):
        from threedod.data import native_io

        if not native_io.native_available():
            pytest.skip("native loader not built")
        from PIL import Image

        jp, _, _ = files
        got = native_io._loaderc.imread_rgb(str(jp))
        ref = np.asarray(Image.open(jp).convert("RGB"))
        np.testing.assert_array_equal(got, ref)

    def test_npz_matches_numpy(self, files):
        from threedod.data import native_io

        if not native_io.native_available():
            pytest.skip("native loader not built")
        _, cz, uz = files
        for path in (cz, uz):
            with np.load(path) as z:
                for k in z.files:
                    got = native_io._loaderc.npz_load(str(path), k)
                    assert got.dtype == z[k].dtype and np.array_equal(got, z[k])

    def test_fallback_without_extension(self, files, monkeypatch):
        from threedod.data import native_io

        monkeypatch.setattr(native_io, "_loaderc", None)
        jp, cz, _ = files
        assert native_io.imread_rgb(str(jp)).shape == (37, 53, 3)
        assert native_io.npz_load(str(cz), "depth").shape == (41, 29)

    def test_missing_key_raises_then_numpy_keyerror(self, files):
        from threedod.data import native_io

        _, cz, _ = files
        with pytest.raises(KeyError):
            native_io.npz_load(str(cz), "nope")
