"""Tests for parity-completing components: CSHOT color descriptor, FPS,
Box.fit, split parsing, rgb2gray."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf2_tpu.data.shapes import load_shapenet_split, rgb2gray
from cppf2_tpu.eval.iou3d import Box
from cppf2_tpu.ops.sampling import farthest_point_sample, masked_choice
from cppf2_tpu.ops.shot import compute_cshot_features


class TestCSHOT:
    def test_shape_and_norm(self, rng):
        u = rng.uniform(-0.05, 0.05, size=(300, 2)).astype(np.float32)
        z = 0.4 + 0.3 * (u[:, 0] ** 2 + u[:, 1] ** 2)
        pts = np.concatenate([u, z[:, None]], -1).astype(np.float32)
        colors = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
        valid = np.ones(300, bool)
        desc, normals = compute_cshot_features(
            jnp.asarray(pts), jnp.asarray(colors), jnp.asarray(valid), 0.02, k=32
        )
        desc = np.asarray(desc)
        assert desc.shape == (300, 1344)
        assert np.all(np.isfinite(desc))
        norms = np.linalg.norm(desc, axis=-1)
        assert np.all((np.abs(norms - 1) < 1e-4) | (norms == 0))

    def test_color_sensitivity(self, rng):
        u = rng.uniform(-0.05, 0.05, size=(200, 2)).astype(np.float32)
        z = np.full((200, 1), 0.4, np.float32)
        pts = np.concatenate([u, z], -1).astype(np.float32)
        valid = np.ones(200, bool)
        c1 = np.zeros((200, 3), np.float32)
        c2 = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
        d1, _ = compute_cshot_features(jnp.asarray(pts), jnp.asarray(c1), jnp.asarray(valid), 0.02, k=24)
        d2, _ = compute_cshot_features(jnp.asarray(pts), jnp.asarray(c2), jnp.asarray(valid), 0.02, k=24)
        # the shape part (first 352) is color independent up to renormalization
        a, b = np.asarray(d1), np.asarray(d2)
        cos_shape = np.sum(a[:, :352] * b[:, :352], -1) / (
            np.linalg.norm(a[:, :352], axis=-1) * np.linalg.norm(b[:, :352], axis=-1) + 1e-9
        )
        assert np.nanmedian(cos_shape) > 0.999
        # but the color part differs
        assert np.abs(a[:, 352:] - b[:, 352:]).max() > 0.01

    def test_shape_half_parallel_to_standalone_shot(self, rng):
        # the shared-LRF refactor must keep CSHOT's shape half exactly
        # proportional to the standalone SHOT descriptor (they differ only
        # by the joint L2 renormalization)
        from cppf2_tpu.ops.neighbors import knn_radius_neighbors
        from cppf2_tpu.ops.normals import estimate_normals
        from cppf2_tpu.ops.shot import compute_cshot, compute_shot

        pts = rng.normal(size=(256, 3)).astype(np.float32) * 0.05
        colors = rng.uniform(0, 1, size=(256, 3)).astype(np.float32)
        valid = jnp.ones(256, bool)
        nbrs = knn_radius_neighbors(jnp.asarray(pts), valid, 0.02, 32)
        normals = estimate_normals(jnp.asarray(pts), nbrs)
        s = np.asarray(compute_shot(jnp.asarray(pts), normals, nbrs, 0.02))
        c = np.asarray(
            compute_cshot(jnp.asarray(pts), jnp.asarray(colors), normals, nbrs, 0.02)
        )
        half = c[:, :352]
        mask = np.linalg.norm(half, axis=-1) > 1e-6
        unit = half[mask] / np.linalg.norm(half[mask], axis=-1, keepdims=True)
        np.testing.assert_allclose(unit, s[mask], atol=1e-5)


class TestFPS:
    def test_spreads_points(self, rng):
        pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
        valid = np.ones(500, bool)
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts), jnp.asarray(valid), 32))
        assert len(set(idx.tolist())) == 32
        # FPS min pairwise distance beats random sampling
        sel = pts[idx]
        d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        fps_min = d.min()
        rnd = pts[rng.choice(500, 32, replace=False)]
        d2 = np.linalg.norm(rnd[:, None] - rnd[None], axis=-1)
        np.fill_diagonal(d2, np.inf)
        assert fps_min > d2.min()

    def test_respects_validity(self, rng):
        pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
        valid = np.zeros(100, bool)
        valid[:20] = True
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts), jnp.asarray(valid), 10))
        assert np.all(idx < 20)

    def test_masked_choice(self):
        idx = np.asarray(masked_choice(jax.random.key(0), jnp.int32(13), 500))
        assert idx.min() >= 0 and idx.max() < 13


class TestBoxFit:
    def test_roundtrip(self, rng):
        from scipy.stats import special_ortho_group

        r = special_ortho_group.rvs(3, random_state=rng)
        t = rng.uniform(-1, 1, 3)
        s = rng.uniform(0.2, 2.0, 3)
        box = Box(r, t, s)
        fit = Box.fit(box.vertices)
        np.testing.assert_allclose(fit.scale, s, atol=1e-6)
        np.testing.assert_allclose(fit.translation, t, atol=1e-6)
        np.testing.assert_allclose(np.abs(np.diag(fit.rotation.T @ r)), 1.0, atol=1e-6)


class TestMisc:
    def test_split_parsing(self, tmp_path):
        p = tmp_path / "split.txt"
        p.write_text("1 02876657/abc\n2 02880940/def\n1 02876657/ghi\n")
        assert load_shapenet_split(str(p), 1) == ["02876657/abc", "02876657/ghi"]
        assert load_shapenet_split(str(p), 2) == ["02880940/def"]

    def test_rgb2gray(self):
        img = np.ones((4, 4, 3))
        np.testing.assert_allclose(rgb2gray(img), 0.9999, atol=1e-3)
