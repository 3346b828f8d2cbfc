"""Golden-value tests for the core geometry layer against small numpy oracles
derived from the reference formulas (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf2_tpu.core import (
    backproject_masked,
    fibonacci_sphere,
    map_sym,
    matrix_to_quat,
    pair_targets,
    prob2real,
    quat_to_matrix,
    real2prob,
    so3_exp,
    voxel_downsample,
)


# ---------------- numpy oracles (reference formulas) ----------------

def np_real2prob(val, max_val, num_bins):
    # oracle for utils/util.py:215-252 (non-circular branch)
    res = np.zeros((*val.shape, num_bins), dtype=val.dtype)
    interval = max_val / (num_bins - 1)
    low = np.clip(np.floor(val / interval).astype(np.int64), None, num_bins - 2)
    high = low + 1
    np.put_along_axis(res, low[..., None], np.expand_dims(1.0 - (val / interval - low), -1), -1)
    np.put_along_axis(res, high[..., None], 1.0 - np.take_along_axis(res, low[..., None], -1), -1)
    return res


def np_pair_targets(pairs, up, right, front, center=np.zeros(3)):
    # oracle for dataset.py:118-135
    a, b = pairs[:, 0], pairs[:, 1]
    pdist = a - b
    u = pdist / (np.linalg.norm(pdist, axis=-1, keepdims=True) + 1e-7)
    proj_len = np.sum((a - center) * u, -1)
    oc = (a - center) - proj_len[..., None] * u
    dist2o = np.linalg.norm(oc, axis=-1)
    tr = np.stack([proj_len, dist2o], -1)
    ang = lambda ax: np.arccos(np.clip(np.sum(u * ax, -1), -1, 1))
    return tr, ang(up), ang(right), ang(front)


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


# ---------------- binning ----------------

class TestBinning:
    def test_real2prob_matches_oracle(self, rng):
        val = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
        got = np.asarray(real2prob(jnp.asarray(val), 1.0, 32))
        want = np_real2prob(val, 1.0, 32)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_real2prob_sums_to_one(self, rng):
        val = rng.uniform(0, 1, size=(100,)).astype(np.float32)
        got = np.asarray(real2prob(jnp.asarray(val), 1.0, 32))
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)

    def test_roundtrip(self, rng):
        val = rng.uniform(0, 1, size=(100,)).astype(np.float32)
        prob = real2prob(jnp.asarray(val), 1.0, 32)
        back = np.asarray(prob2real(prob, 1.0, 32))
        np.testing.assert_allclose(back, val, atol=1e-4)

    def test_circular_roundtrip(self, rng):
        val = rng.uniform(0.3, 2 * np.pi - 0.3, size=(50,)).astype(np.float32)
        prob = real2prob(jnp.asarray(val), float(2 * np.pi), 16, circular=True)
        back = np.asarray(prob2real(prob, float(2 * np.pi), 16, circular=True))
        np.testing.assert_allclose(back, val, atol=1e-3)


# ---------------- pair targets ----------------

class TestPairTargets:
    def test_matches_oracle(self, rng):
        pairs = rng.normal(size=(128, 2, 3)).astype(np.float32)
        center = rng.normal(size=3).astype(np.float32)
        up = np.array([0, 1, 0], np.float32)
        right = np.array([1, 0, 0], np.float32)
        front = np.array([0, 0, 1], np.float32)
        got = pair_targets(
            jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1]),
            jnp.asarray(up), jnp.asarray(right), jnp.asarray(front),
            jnp.asarray(center),
        )
        tr, ua, ra, fa = np_pair_targets(pairs, up, right, front, center)
        np.testing.assert_allclose(np.asarray(got.tr), tr, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.up_angle), ua, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.right_angle), ra, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.front_angle), fa, atol=1e-4)


# ---------------- rotations / symmetry ----------------

class TestRotations:
    def test_quat_matrix_roundtrip(self, rng):
        for _ in range(10):
            R = random_rotation(rng)
            q = matrix_to_quat(jnp.asarray(R, dtype=jnp.float32))
            R2 = np.asarray(quat_to_matrix(q))
            np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_quat_matrix_roundtrip_180deg(self):
        # qw = 0 regime: the antisymmetric part vanishes, so component
        # signs must come from the largest-pivot row (regression: a flip
        # about (1,-1,0) used to come back as a flip about (1,+1,0))
        from scipy.spatial.transform import Rotation as SR

        for ax in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, -1, 0), (1, 1, 0),
                   (0, 1, -1), (1, -1, 1), (2, -1, 3)]:
            a = np.asarray(ax, np.float64)
            a /= np.linalg.norm(a)
            for ang in (np.pi, np.pi - 1e-4):
                R = SR.from_rotvec(ang * a).as_matrix()
                q = matrix_to_quat(jnp.asarray(R, dtype=jnp.float32))
                R2 = np.asarray(quat_to_matrix(q))
                np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_so3_exp_orthonormal(self, rng):
        w = rng.normal(size=3).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_so3_exp_small_angle(self):
        R = np.asarray(so3_exp(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)

    def test_map_sym_invariance(self, rng):
        # Reference self-check (utils/util.py:3057-3070): two rotations differing
        # only by a rotation about the symmetry axis map to the same canonical form.
        axis = 1
        for _ in range(5):
            R = random_rotation(rng)
            theta = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(theta), np.sin(theta)
            S = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            m1 = np.asarray(map_sym(jnp.asarray(R, dtype=jnp.float32), axis))
            m2 = np.asarray(map_sym(jnp.asarray(S @ R, dtype=jnp.float32), axis))
            np.testing.assert_allclose(m1, m2, atol=1e-4)


# ---------------- backprojection ----------------

class TestBackproject:
    def test_roundtrip_projection(self, rng):
        h, w = 32, 40
        K = np.array([[50.0, 0, 20], [0, 50.0, 16], [0, 0, 1]], np.float32)
        depth = rng.uniform(0.5, 2.0, size=(h, w)).astype(np.float32)
        mask = np.zeros((h, w), bool)
        mask[8:24, 10:30] = True
        pts, yx, valid = backproject_masked(jnp.asarray(depth), jnp.asarray(K), jnp.asarray(mask))
        pts, yx, valid = map(np.asarray, (pts, yx, valid))
        assert valid.sum() == mask.sum()
        # re-project valid points (undo the x/y sign flip)
        p = pts[valid] * np.array([-1, -1, 1])
        uv = (K @ p.T).T
        uv = uv[:, :2] / uv[:, 2:3]
        np.testing.assert_allclose(uv[:, 0], yx[valid][:, 1], atol=1e-3)
        np.testing.assert_allclose(uv[:, 1], yx[valid][:, 0], atol=1e-3)
        np.testing.assert_allclose(pts[valid][:, 2], depth[mask], atol=1e-5)


# ---------------- fibonacci sphere ----------------

class TestFibonacciSphere:
    def test_matches_reference_formula(self):
        import math

        samples = 100
        pts = fibonacci_sphere(samples)
        # oracle: utils/util.py:191-208
        phi = math.pi * (3.0 - math.sqrt(5.0))
        for i in [0, 1, 50, 99]:
            y = 1 - (i / float(samples - 1)) * 2
            radius = math.sqrt(1 - y * y)
            theta = phi * i
            np.testing.assert_allclose(
                pts[i], [math.cos(theta) * radius, y, math.sin(theta) * radius], atol=1e-6
            )

    def test_unit_norm(self):
        pts = fibonacci_sphere(719)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-5)


# ---------------- voxel downsample ----------------

class TestVoxelDownsample:
    def test_one_point_per_voxel(self, rng):
        pts = rng.uniform(0, 0.1, size=(500, 3)).astype(np.float32)
        valid = np.ones(500, bool)
        res = 0.02
        out = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), res, 256, jax.random.key(0))
        idx, ov, count = map(np.asarray, out)
        sel = pts[idx[ov]]
        # oracle voxel ids
        origin = pts.min(0)
        all_cells = np.floor((pts - origin) / res).astype(int)
        sel_cells = np.floor((sel - origin) / res).astype(int)
        want_cells = set(map(tuple, all_cells))
        got_cells = set(map(tuple, sel_cells))
        assert got_cells == want_cells
        assert count == len(want_cells)
        # no duplicated voxels
        assert len(got_cells) == ov.sum()

    def test_respects_validity(self, rng):
        pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
        valid = np.zeros(100, bool)
        valid[:10] = True
        out = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.5, 64, jax.random.key(1))
        idx, ov, count = map(np.asarray, out)
        assert set(idx[ov]) <= set(range(10))

    def test_randomized_representative(self, rng):
        # two points in the same voxel: either can be chosen depending on key
        pts = np.array([[0.001, 0, 0], [0.002, 0, 0]], np.float32)
        valid = np.ones(2, bool)
        chosen = set()
        for s in range(20):
            out = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.01, 4, jax.random.key(s))
            idx, ov, _ = map(np.asarray, out)
            chosen.add(int(idx[ov][0]))
        assert chosen == {0, 1}

    def test_overflow_takes_unbiased_subset(self, rng):
        # more occupied voxels than budget: the selection must span the whole
        # extent, not a key-ordered slab (regression: laptop clouds broke)
        pts = rng.uniform(0, 1.0, size=(20000, 3)).astype(np.float32)
        valid = np.ones(20000, bool)
        out = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.02, 512, jax.random.key(0))
        idx, ov, count = map(np.asarray, out)
        assert count > 512  # genuinely overflowing
        assert ov.sum() == 512
        sel = pts[idx[ov]]
        # x coverage of the selection spans nearly the full cloud
        assert sel[:, 0].min() < 0.1 and sel[:, 0].max() > 0.9
        # roughly uniform thirds
        thirds = np.histogram(sel[:, 0], bins=3, range=(0, 1))[0]
        assert thirds.min() > 512 / 3 * 0.6
