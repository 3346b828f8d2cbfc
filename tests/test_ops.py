"""Tests for geometry ops: eig3x3, neighbors, normals, SHOT descriptor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf2_tpu.ops import (
    compute_shot,
    estimate_normals,
    knn_radius_neighbors,
    shot_lrf,
    sym_eig3x3,
)
from cppf2_tpu.ops.shot import compute_shot_features


def random_rotation(rng):
    from scipy.stats import special_ortho_group

    return special_ortho_group.rvs(3, random_state=rng).astype(np.float32)


class TestEig3:
    def test_matches_numpy(self, rng):
        A = rng.normal(size=(64, 3, 3)).astype(np.float32)
        A = A + np.swapaxes(A, -1, -2)
        vals, vecs = sym_eig3x3(jnp.asarray(A))
        vals, vecs = np.asarray(vals), np.asarray(vecs)
        want = np.linalg.eigvalsh(A)[:, ::-1]
        np.testing.assert_allclose(vals, want, atol=1e-4)
        # eigenvector property: A v = lambda v
        for i in range(3):
            Av = np.einsum("nij,nj->ni", A, vecs[:, :, i])
            lv = vals[:, i : i + 1] * vecs[:, :, i]
            np.testing.assert_allclose(Av, lv, atol=2e-3)

    def test_orthonormal_right_handed(self, rng):
        A = rng.normal(size=(32, 3, 3)).astype(np.float32)
        A = np.einsum("nij,nkj->nik", A, A)  # PSD
        _, vecs = sym_eig3x3(jnp.asarray(A))
        vecs = np.asarray(vecs)
        gram = np.einsum("nij,nik->njk", vecs, vecs)
        np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape), atol=1e-4)
        dets = np.linalg.det(vecs)
        np.testing.assert_allclose(dets, 1.0, atol=1e-4)

    def test_diagonal_and_scaled(self):
        A = np.zeros((3, 3, 3), np.float32)
        A[0] = np.diag([3.0, 2.0, 1.0])
        A[1] = np.diag([1e-6, 2e-6, 3e-6])
        A[2] = np.eye(3) * 5.0
        vals, vecs = sym_eig3x3(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(vals[0]), [3, 2, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(vals[1]), [3e-6, 2e-6, 1e-6], atol=1e-9)
        np.testing.assert_allclose(np.asarray(vals[2]), [5, 5, 5], atol=1e-4)
        assert np.all(np.isfinite(np.asarray(vecs)))


class TestNeighbors:
    def test_matches_bruteforce(self, rng):
        # Contract: the *valid* (within-radius) neighbor set matches brute
        # force; slots beyond the radius are filler and masked invalid.
        pts = rng.uniform(0, 0.2, size=(200, 3)).astype(np.float32)
        valid = np.ones(200, bool)
        radius, k = 0.05, 16
        out = knn_radius_neighbors(jnp.asarray(pts), jnp.asarray(valid), radius, k, query_chunk=64)
        idx, dist, nv, rel = map(np.asarray, out)
        # rel carries neighbor - query offsets (consumers must not re-gather)
        np.testing.assert_allclose(
            np.linalg.norm(rel, axis=-1)[nv], dist[nv], atol=1e-4
        )
        D = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        for i in [0, 17, 99, 199]:
            order = np.argsort(D[i])[:k]
            in_r = D[i][order] <= radius
            assert nv[i].sum() == in_r.sum()
            got = set(idx[i][nv[i]])
            want = set(order[in_r])
            assert got == want
            np.testing.assert_allclose(
                np.sort(dist[i][nv[i]]), np.sort(D[i][order][in_r]), atol=1e-4
            )

    def test_exact_matches_bruteforce_tail(self, rng):
        # exact=True keeps the legacy contract: true k nearest regardless of radius
        pts = rng.uniform(0, 0.2, size=(128, 3)).astype(np.float32)
        valid = np.ones(128, bool)
        out = knn_radius_neighbors(
            jnp.asarray(pts), jnp.asarray(valid), 0.05, 12, query_chunk=64, exact=True
        )
        idx, dist, nv, rel = map(np.asarray, out)
        D = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        for i in [0, 63, 127]:
            order = np.argsort(D[i])[:12]
            np.testing.assert_allclose(np.sort(dist[i]), np.sort(D[i][order]), atol=1e-4)

    def test_invalid_points_excluded(self, rng):
        pts = rng.uniform(0, 0.1, size=(50, 3)).astype(np.float32)
        valid = np.ones(50, bool)
        valid[25:] = False
        out = knn_radius_neighbors(jnp.asarray(pts), jnp.asarray(valid), 1.0, 8)
        idx, _, nv, _ = map(np.asarray, out)
        assert np.all(idx[nv] < 25)
        assert not nv[30].any()  # invalid query row has no valid neighbors


class TestNormals:
    def test_plane(self, rng):
        # noisy points on z=0 plane -> normals near +-z, oriented towards origin viewpoint
        xy = rng.uniform(-0.05, 0.05, size=(300, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.full((300, 1), 0.5, np.float32)], -1)
        valid = np.ones(300, bool)
        nbrs = knn_radius_neighbors(jnp.asarray(pts), jnp.asarray(valid), 0.02, 32)
        n = np.asarray(estimate_normals(jnp.asarray(pts), nbrs))
        assert np.all(np.abs(n[:, 2]) > 0.99)
        # viewpoint at origin is at z<0.5 -> normals point to -z
        assert np.all(n[:, 2] < 0)

    def test_sphere_radial(self, rng):
        dirs = rng.normal(size=(500, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        pts = (dirs * 0.1).astype(np.float32) + np.array([0, 0, 0.5], np.float32)
        valid = np.ones(500, bool)
        nbrs = knn_radius_neighbors(jnp.asarray(pts), jnp.asarray(valid), 0.03, 24)
        n = np.asarray(estimate_normals(jnp.asarray(pts), nbrs))
        cos = np.abs(np.sum(n * dirs, -1))
        assert np.median(cos) > 0.95

    def test_underdetermined_zero(self):
        pts = np.array([[0, 0, 1], [5, 5, 5], [-5, 5, 5]], np.float32)
        valid = np.ones(3, bool)
        nbrs = knn_radius_neighbors(jnp.asarray(pts), jnp.asarray(valid), 0.01, 3)
        n = np.asarray(estimate_normals(jnp.asarray(pts), nbrs))
        np.testing.assert_allclose(n, 0.0)


def _sphere_patch_cloud(rng, n=400):
    """Deterministic bumpy patch with distinctive local geometry."""
    u = rng.uniform(-0.06, 0.06, size=(n, 2)).astype(np.float32)
    z = 0.3 + 0.2 * (u[:, 0] ** 2) + 0.1 * np.sin(40 * u[:, 0]) * 0.01 + 0.3 * (u[:, 1] ** 2)
    return np.concatenate([u, z[:, None]], -1).astype(np.float32)


class TestShot:
    def test_shape_norm_finite(self, rng):
        pts = _sphere_patch_cloud(rng)
        valid = np.ones(len(pts), bool)
        desc, normals = compute_shot_features(jnp.asarray(pts), jnp.asarray(valid), 0.02, k=48)
        desc, normals = np.asarray(desc), np.asarray(normals)
        assert desc.shape == (len(pts), 352)
        assert np.all(np.isfinite(desc)) and np.all(np.isfinite(normals))
        norms = np.linalg.norm(desc, axis=-1)
        assert np.all((np.abs(norms - 1) < 1e-4) | (norms == 0))

    def test_rotation_invariance(self, rng):
        pts = _sphere_patch_cloud(rng)
        valid = np.ones(len(pts), bool)
        R = random_rotation(rng)
        t = np.array([0.05, -0.02, 0.1], np.float32)
        desc1, _ = compute_shot_features(jnp.asarray(pts), jnp.asarray(valid), 0.02, k=48)
        desc2, _ = compute_shot_features(jnp.asarray(pts @ R.T + t), jnp.asarray(valid), 0.02, k=48)
        desc1, desc2 = np.asarray(desc1), np.asarray(desc2)
        # cosine similarity per point between original and rotated descriptors
        sim = np.sum(desc1 * desc2, -1)
        live = (np.linalg.norm(desc1, axis=-1) > 0) & (np.linalg.norm(desc2, axis=-1) > 0)
        # viewpoint-dependent normal sign flips make a minority of points differ;
        # the bulk must be stable under rigid motion
        assert np.median(sim[live]) > 0.9

    def test_isolated_point_zero_descriptor(self, rng):
        pts = _sphere_patch_cloud(rng)
        pts = np.concatenate([pts, np.array([[10, 10, 10]], np.float32)])
        valid = np.ones(len(pts), bool)
        desc, _ = compute_shot_features(jnp.asarray(pts), jnp.asarray(valid), 0.02, k=48)
        np.testing.assert_allclose(np.asarray(desc)[-1], 0.0)

    def test_lrf_orthonormal(self, rng):
        pts = _sphere_patch_cloud(rng)
        valid = np.ones(len(pts), bool)
        nbrs = knn_radius_neighbors(jnp.asarray(pts), jnp.asarray(valid), 0.02, 48)
        frames = np.asarray(shot_lrf(jnp.asarray(pts), nbrs, 0.02))
        gram = np.einsum("nij,nkj->nik", frames, frames)
        np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape), atol=1e-3)


class TestPallasKernels:
    """Interpret-mode correctness of the Pallas kernels (hardware parity +
    timing: scripts/pallas_parity.py)."""

    def test_hist16_interpret(self, rng):
        from cppf2_tpu.ops.pallas_kernels import hist16_pallas

        ids3 = rng.integers(0, 16, size=(3000, 3)).astype(np.int32)
        ok = rng.uniform(size=3000) > 0.2
        got = np.asarray(hist16_pallas(jnp.asarray(ids3), jnp.asarray(ok), interpret=True))
        want = np.zeros((16, 256), np.float32)
        for (x, y, z), o in zip(ids3, ok):
            if o:
                want[x, y * 16 + z] += 1
        np.testing.assert_array_equal(got, want)

    def test_sphere_interpret(self, rng):
        from cppf2_tpu.ops.pallas_kernels import sphere_accumulate_pallas

        dirs = rng.normal(size=(500, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        w = rng.uniform(size=500).astype(np.float32)
        sph = rng.normal(size=(119, 3)).astype(np.float32)
        sph /= np.linalg.norm(sph, axis=-1, keepdims=True)
        got = np.asarray(
            sphere_accumulate_pallas(
                jnp.asarray(dirs), jnp.asarray(w), jnp.asarray(sph), 5.0,
                interpret=True,
            )
        )
        cos = dirs @ sph.T
        want = ((cos > np.cos(np.deg2rad(10.0))) * w[:, None]).sum(0)
        np.testing.assert_allclose(got, want, rtol=1e-4)
