"""Utility I/O + model zoo + events tests."""
import json
import os

import numpy as np
import pytest

from threedod.train.events import EventStorage
from threedod.train.solver import host_lr
from threedod.config import SolverConfig
from threedod.utils.io import ETA, file_parts, list_files, load_json, save_json
from threedod.utils.model_zoo import PREFIX, resolve


class TestIO:
    def test_json_roundtrip(self, tmp_path):
        p = str(tmp_path / "a" / "b.json")
        save_json(p, {"x": [1, 2, 3]})
        assert load_json(p) == {"x": [1, 2, 3]}

    def test_list_files_and_parts(self, tmp_path):
        for n in ("b.txt", "a.txt", "c.bin"):
            (tmp_path / n).write_text("x")
        files = list_files(str(tmp_path), "*.txt")
        assert [os.path.basename(f) for f in files] == ["a.txt", "b.txt"]
        base, name, ext = file_parts(files[0])
        assert name == "a" and ext == ".txt"

    def test_eta(self):
        eta = ETA(100)
        s = eta(10)
        assert "m" in s


class TestModelZoo:
    def test_passthrough(self):
        assert resolve("/some/local/path.pth") == "/some/local/path.pth"

    def test_missing_zoo_raises_with_url(self, tmp_path, monkeypatch):
        monkeypatch.setenv("THREEDOD_ZOO_DIR", str(tmp_path))
        with pytest.raises(FileNotFoundError) as e:
            resolve(PREFIX + "omni3d/cubercnn_DLA34_FPN.pth")
        assert "dl.fbaipublicfiles.com" in str(e.value)

    def test_cached_resolves(self, tmp_path, monkeypatch):
        monkeypatch.setenv("THREEDOD_ZOO_DIR", str(tmp_path))
        target = tmp_path / "omni3d" / "cubercnn_DLA34_FPN.pth"
        target.parent.mkdir(parents=True)
        target.write_bytes(b"x")
        assert resolve(PREFIX + "omni3d/cubercnn_DLA34_FPN.pth") == str(target)


class TestEvents:
    def test_storage_medians_and_flush(self, tmp_path):
        st = EventStorage(str(tmp_path), window=4)
        for i in range(8):
            st.iter = i
            st.put_scalars(loss=float(8 - i))
        st.flush()
        st.close()
        rows = [json.loads(l) for l in open(tmp_path / "metrics.json")]
        assert rows[-1]["iteration"] == 7
        # median of last 4 values [4,3,2,1] -> sorted[2] = 3
        assert rows[-1]["loss"] == 3.0


class TestHostLR:
    def test_matches_reference_shape(self):
        s = SolverConfig(base_lr=0.02, steps=(100, 200), warmup_iters=10, warmup_factor=0.001, gamma=0.1)
        assert host_lr(s, 0) == pytest.approx(0.02 * 0.001)
        assert host_lr(s, 10) == pytest.approx(0.02)
        assert host_lr(s, 150) == pytest.approx(0.002)
        assert host_lr(s, 250) == pytest.approx(0.0002)

    def test_warmup_zero_matches_jnp_schedule(self):
        # ADVICE r2: host_lr must mirror the warmup_iters=0 edge (full
        # base_lr at iteration 0, not base_lr*warmup_factor)
        from threedod.train.solver import warmup_multistep_schedule

        s = SolverConfig(base_lr=0.02, steps=(100,), warmup_iters=0, warmup_factor=0.001, gamma=0.1)
        sched = warmup_multistep_schedule(
            s.base_lr, s.steps, s.gamma, s.warmup_iters, s.warmup_factor
        )
        for it in (0, 1, 50, 150):
            assert host_lr(s, it) == pytest.approx(float(sched(it)), rel=1e-6), it
