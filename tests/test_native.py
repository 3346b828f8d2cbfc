"""Native library tests: the C++ IoU core vs the Python implementation, and
the mmap record store vs its writer."""

import numpy as np
import pytest

from cppf2_tpu.native import load


def rand_rot(rng):
    from scipy.stats import special_ortho_group

    return special_ortho_group.rvs(3, random_state=rng)


@pytest.fixture(scope="module")
def lib():
    l = load()
    if l is None:
        pytest.skip("native library unavailable (no compiler?)")
    return l


class TestNativeIoU:
    def test_matches_python_exact(self, lib, rng):
        from cppf2_tpu.eval.iou3d import Box, oriented_iou

        for _ in range(10):
            r1, r2 = rand_rot(rng), rand_rot(rng)
            t1 = rng.uniform(-0.2, 0.2, 3)
            t2 = rng.uniform(-0.2, 0.2, 3)
            s1 = rng.uniform(0.5, 1.5, 3)
            s2 = rng.uniform(0.5, 1.5, 3)
            py = oriented_iou(Box(r1, t1, s1), Box(r2, t2, s2))
            r1c = np.ascontiguousarray(r1)
            r2c = np.ascontiguousarray(r2)
            native = lib.box_iou(
                r1c.ctypes.data, np.ascontiguousarray(t1).ctypes.data,
                np.ascontiguousarray(s1).ctypes.data,
                r2c.ctypes.data, np.ascontiguousarray(t2).ctypes.data,
                np.ascontiguousarray(s2).ctypes.data,
            )
            assert abs(py - native) < 1e-6, (py, native)

    def test_batch_matrix_matches_python(self, rng):
        from cppf2_tpu.eval.iou3d import iou_with_symmetry, pairwise_iou_matrix

        def rts(n):
            out = np.zeros((n, 4, 4))
            for i in range(n):
                out[i] = np.eye(4)
                out[i, :3, :3] = rand_rot(rng)
                out[i, :3, 3] = rng.uniform(-0.1, 0.1, 3)
            return out

        p, g = rts(3), rts(2)
        ps = rng.uniform(0.3, 0.6, (3, 3))
        gs = rng.uniform(0.3, 0.6, (2, 3))
        vis = np.array([0, 1])
        mat = pairwise_iou_matrix(p, ps, g, gs, vis, "mug")
        for i in range(3):
            for j in range(2):
                want = iou_with_symmetry(
                    p[i].copy(), g[j].copy(), ps[i], gs[j], vis[j], "mug", "mug"
                )
                assert abs(mat[i, j] - want) < 1e-4, (i, j, mat[i, j], want)

    def test_speed(self, lib, rng):
        import time

        from cppf2_tpu.eval.iou3d import pairwise_iou_matrix

        n = 5
        rts = np.tile(np.eye(4), (n, 1, 1))
        for i in range(n):
            rts[i, :3, :3] = rand_rot(rng)
        scales = rng.uniform(0.3, 0.6, (n, 3))
        vis = np.ones(n)
        t0 = time.time()
        pairwise_iou_matrix(rts, scales, rts.copy(), scales, vis, "can")
        dt = time.time() - t0
        # 5x5 pairs x 36 rotations in well under a second
        assert dt < 1.0, dt


class TestRecords:
    def _roundtrip(self, tmp_path, rng, expect_backend):
        from cppf2_tpu.data.records import RecordReader, RecordWriter

        path = str(tmp_path / "test.rec")
        schema = {
            "pc": ((16, 3), np.float32),
            "count": ((), np.int32),
        }
        recs = []
        with RecordWriter(path, schema) as w:
            for i in range(5):
                r = {
                    "pc": rng.normal(size=(16, 3)).astype(np.float32),
                    "count": np.int32(i),
                }
                recs.append(r)
                w.append(r)
        rd = RecordReader(path)
        if expect_backend:
            assert rd.backend == expect_backend
        assert len(rd) == 5
        got = rd.batch([3, 0, 4])
        np.testing.assert_array_equal(got["count"], [3, 0, 4])
        np.testing.assert_allclose(got["pc"][0], recs[3]["pc"])
        np.testing.assert_allclose(got["pc"][2], recs[4]["pc"])
        rd.close()

    def test_roundtrip_native(self, tmp_path, rng, lib):
        self._roundtrip(tmp_path, rng, "native")

    def test_roundtrip_python_fallback(self, tmp_path, rng, monkeypatch):
        import cppf2_tpu.data.records as recmod
        import cppf2_tpu.native as natmod

        monkeypatch.setattr(natmod, "load", lambda: None)
        self._roundtrip(tmp_path, rng, "python")

    def _crashed_file(self, tmp_path, rng, n=7):
        """Simulate a writer that died mid-dump: records flushed to disk but
        the header count never patched (still 0)."""
        import shutil

        from cppf2_tpu.data.records import RecordWriter

        path = str(tmp_path / "live.rec")
        crashed = str(tmp_path / "crashed.rec")
        schema = {"pc": ((4, 3), np.float32), "count": ((), np.int32)}
        w = RecordWriter(path, schema)
        recs = []
        for i in range(n):
            r = {"pc": rng.normal(size=(4, 3)).astype(np.float32),
                 "count": np.int32(i)}
            recs.append(r)
            w.append(r)
        w._f.flush()
        shutil.copyfile(path, crashed)  # crash point: count still 0 on disk
        w.close()
        return crashed, recs

    def test_crash_recovery_python(self, tmp_path, rng, monkeypatch):
        import cppf2_tpu.native as natmod

        from cppf2_tpu.data.records import RecordReader

        crashed, recs = self._crashed_file(tmp_path, rng)
        monkeypatch.setattr(natmod, "load", lambda: None)
        rd = RecordReader(crashed)
        assert rd.backend == "python" and len(rd) == len(recs)
        np.testing.assert_allclose(rd.gather("pc", [6])[0], recs[6]["pc"])
        rd.close()

    def test_crash_recovery_native(self, tmp_path, rng, lib):
        from cppf2_tpu.data.records import RecordReader

        crashed, recs = self._crashed_file(tmp_path, rng)
        rd = RecordReader(crashed)
        assert rd.backend == "native" and len(rd) == len(recs)
        np.testing.assert_array_equal(
            rd.gather("count", list(range(len(recs)))), np.arange(len(recs)))
        rd.close()

    def test_periodic_count_patch(self, tmp_path, rng, monkeypatch):
        """The header count is patched every COUNT_PATCH_EVERY appends, not
        just at close — bounding what a crash can lose."""
        import struct

        from cppf2_tpu.data.records import RecordWriter

        monkeypatch.setattr(RecordWriter, "COUNT_PATCH_EVERY", 4)
        path = str(tmp_path / "patched.rec")
        w = RecordWriter(path, {"count": ((), np.int32)})
        for i in range(6):
            w.append({"count": np.int32(i)})
        with open(path, "rb") as f:  # no close(): only periodic patches
            head = f.read(32)
        assert struct.unpack("<Q", head[8:16])[0] == 4
        w.close()


class TestDumpFrames:
    def test_synthframe_roundtrip(self, tmp_path):
        from types import SimpleNamespace

        import numpy as np

        from cppf2_tpu.data.records import RecordReader, dump_frames

        rng = np.random.default_rng(0)
        frames = [
            SimpleNamespace(
                pc=rng.normal(size=(32, 3)).astype(np.float32),
                pc_canon=rng.normal(size=(32, 3)).astype(np.float32),
                shot=rng.normal(size=(32, 352)).astype(np.float32),
                normal=rng.normal(size=(32, 3)).astype(np.float32),
                bound=np.array([0.1, 0.2, 0.1], np.float32),
                count=np.int32(30),
            )
            for _ in range(3)
        ]
        path = str(tmp_path / "frames.rec")
        dump_frames(path, frames, n_points=32)
        rd = RecordReader(path)
        assert len(rd) == 3
        b = rd.batch([0, 2])
        np.testing.assert_allclose(b["pc"][1], frames[2].pc)
        np.testing.assert_array_equal(b["count"], [30, 30])
        rd.close()
