"""Tests for procedural shapes, the splat renderer, and the synthetic frame
generator — including the round-trip invariant: generated frames' pc_canon must
equal (pc - trans) @ rot / scale_norm and live inside the canonical half-cube."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf2_tpu.config import CATEGORIES
from cppf2_tpu.data import (
    NOCS_INTRINSICS,
    SyntheticFrameGenerator,
    make_category_mesh,
    sample_surface,
    splat_render_depth,
)

ALL_CATS = list(CATEGORIES)


class TestShapes:
    @pytest.mark.parametrize("cat", ALL_CATS)
    def test_mesh_canonical(self, cat, rng):
        v, f = make_category_mesh(cat, rng)
        assert v.ndim == 2 and f.ndim == 2 and f.shape[1] == 3
        assert f.max() < len(v)
        ext = v.max(0) - v.min(0)
        np.testing.assert_allclose(ext.max(), 1.0, atol=1e-5)
        center = (v.max(0) + v.min(0)) / 2
        np.testing.assert_allclose(center, 0.0, atol=1e-5)

    def test_surface_sampling(self, rng):
        v, f = make_category_mesh("can", rng)
        pts, nrm = sample_surface((v, f), 5000, rng)
        assert pts.shape == (5000, 3)
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)
        # samples stay within the canonical bbox
        assert pts.min() >= -0.51 and pts.max() <= 0.51


class TestSplatRender:
    def test_depth_geometry(self, rng):
        # a canonical can at a known pose: depth pixels must backproject onto
        # the transformed surface
        v, f = make_category_mesh("can", rng)
        pts, nrm = sample_surface((v, f), 200000, rng)
        R = np.eye(3, dtype=np.float32)
        T = np.array([0.0, 0.0, 1.0], np.float32)
        s = np.float32(0.15)
        K = NOCS_INTRINSICS.copy()
        K[0] *= 0.5
        K[1] *= 0.5
        depth, gray = splat_render_depth(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(R), jnp.asarray(T),
            s, jnp.asarray(K), height=240, width=320,
        )
        depth = np.asarray(depth)
        assert (depth > 0).sum() > 500
        zs = depth[depth > 0]
        # object of extent 0.15 at z=1: depths within [1 - 0.15, 1 + 0.15]
        assert zs.min() > 0.8 and zs.max() < 1.2
        gray = np.asarray(gray)
        assert gray.shape == depth.shape
        assert np.all((gray > 0) == (depth > 0))

    def test_backface_culling_sees_near_surface(self, rng):
        v, f = make_category_mesh("can", rng)
        pts, nrm = sample_surface((v, f), 200000, rng)
        K = NOCS_INTRINSICS.copy()
        K[0] *= 0.5
        K[1] *= 0.5
        depth, _ = splat_render_depth(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(np.eye(3, dtype=np.float32)),
            jnp.asarray(np.array([0, 0, 1.0], np.float32)), np.float32(0.15),
            jnp.asarray(K), height=240, width=320,
        )
        depth = np.asarray(depth)
        # center pixel should be the near wall (z ~ 1 - r*0.15), not the far one
        cz = depth[120, 160]
        assert 0 < cz < 1.0


class TestSyntheticFrames:
    @pytest.mark.parametrize("cat", ["can", "mug"])
    def test_frame_invariants(self, cat):
        gen = SyntheticFrameGenerator(
            CATEGORIES[cat], n_max=2048, surface_samples=60000,
            height=240, width=320, shot_k=24, seed=3,
        )
        f = gen.next_frame()
        count = int(f.count)
        assert count >= 100
        valid = np.asarray(f.valid)
        pc = np.asarray(f.pc)
        canon = np.asarray(f.pc_canon)
        rot = np.asarray(f.rotation)
        trans = np.asarray(f.translation)
        sn = float(f.scale_norm)
        # rotation is orthonormal
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)
        # canonical round trip
        want = (pc[valid] - trans) @ rot / sn
        np.testing.assert_allclose(canon[valid], want, atol=1e-4)
        # canonical cloud lives in the half-cube (model normalized to extent 1)
        assert np.abs(canon[valid]).max() < 0.75
        # features are finite
        assert np.all(np.isfinite(np.asarray(f.shot)))
        assert np.all(np.isfinite(np.asarray(f.normal)))
        # bound is metric and in the category's range
        bound = np.asarray(f.bound)
        lo, hi = CATEGORIES[cat].scale_range
        assert lo - 1e-5 <= bound.max() <= hi + 1e-5

    def test_symmetric_canonicalization(self):
        # for up_sym categories the recorded rotation is canonicalized: the
        # in-plane (x,z) block row must have zero rotation angle about y
        gen = SyntheticFrameGenerator(
            CATEGORIES["can"], n_max=1024, surface_samples=40000,
            height=240, width=320, shot_k=16, seed=5,
        )
        f = gen.next_frame()
        rot = np.asarray(f.rotation).T
        other = [0, 2]
        sub = rot[np.ix_(other, other)]
        alpha = np.arctan2(sub[1, 0] - sub[0, 1], sub[0, 0] + sub[1, 1])
        assert abs(alpha) < 1e-4

    def test_training_batch_shapes(self):
        gen = SyntheticFrameGenerator(
            CATEGORIES["bowl"], n_max=1024, surface_samples=40000,
            height=240, width=320, shot_k=16, seed=7,
        )
        b = gen.batch(2)
        assert b["pc"].shape == (2, 1024, 3)
        assert b["shot"].shape == (2, 1024, 352)
        assert b["count"].shape == (2,)


class TestRasterRender:
    def _cube(self):
        from cppf2_tpu.data.shapes import load_obj, subdivide_mesh

        path = os.path.join(
            os.path.dirname(__file__),
            "fixtures/shapenet/02880940/abc123def/models/model_normalized.obj",
        )
        return subdivide_mesh(load_obj(path), 0.05)

    def test_cube_exact_depth_and_coverage(self):
        from cppf2_tpu.data.render import NOCS_INTRINSICS, raster_render_depth

        v, f = self._cube()
        R = np.eye(3, dtype=np.float32)
        T = np.array([0, 0, 0.5], np.float32)
        d, g = raster_render_depth(
            jnp.asarray(v), jnp.asarray(f), jnp.asarray(R), jnp.asarray(T),
            np.float32(0.18), jnp.asarray(NOCS_INTRINSICS),
        )
        d = np.asarray(d)
        m = d > 0
        # fronto-parallel front face at z = 0.5 - 0.09; exact depth, no holes
        ys, xs = np.where(m)
        w = xs.max() - xs.min() + 1
        h = ys.max() - ys.min() + 1
        assert m.sum() == w * h  # full coverage, zero holes
        np.testing.assert_allclose(d[m], 0.41, atol=1e-5)

    def test_lighting_changes_gray_not_depth(self):
        from cppf2_tpu.data.render import (
            NOCS_INTRINSICS,
            raster_render_depth,
            sample_lighting,
        )

        v, f = self._cube()
        R = np.eye(3, dtype=np.float32)
        T = np.array([0, 0, 0.5], np.float32)
        outs = [
            raster_render_depth(
                jnp.asarray(v), jnp.asarray(f), jnp.asarray(R), jnp.asarray(T),
                np.float32(0.18), jnp.asarray(NOCS_INTRINSICS),
                lighting=sample_lighting(jax.random.key(k)),
            )
            for k in range(4)
        ]
        for d2, _ in outs[1:]:
            np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(d2))
        grays = [np.asarray(g) for _, g in outs]
        spread = max(
            np.abs(a - b).max() for a in grays for b in grays if a is not b
        )
        assert spread > 0.02

    def test_procedural_albedo_range_and_variation(self, rng):
        from cppf2_tpu.data.render import procedural_albedo

        pos = jnp.asarray(rng.uniform(-0.5, 0.5, (1000, 3)).astype(np.float32))
        a1 = np.asarray(procedural_albedo(pos, jax.random.key(0)))
        a2 = np.asarray(procedural_albedo(pos, jax.random.key(1)))
        assert a1.min() >= 0.3 - 1e-6 and a1.max() <= 1.0 + 1e-6
        assert a1.std() > 0.02           # actually textured
        assert np.abs(a1 - a2).max() > 0.05  # varies with key

    def test_subdivide_preserves_area_and_bounds_edges(self, rng):
        from cppf2_tpu.data.shapes import make_category_mesh, subdivide_mesh

        m = make_category_mesh("bowl", rng)
        v, f = subdivide_mesh(m, 1.0 / 48.0)

        def area(verts, faces):
            tri = verts[faces]
            return 0.5 * np.linalg.norm(
                np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
            ).sum()

        np.testing.assert_allclose(area(v, f), area(*m), rtol=1e-4)
        tri = v[f]
        e = np.linalg.norm(tri - tri[:, [1, 2, 0]], axis=-1)
        assert (e.max(-1) <= 1.0 / 48.0 + 1e-6).mean() > 0.99

    def test_generator_raster_frame(self):
        from cppf2_tpu.config import CATEGORIES
        from cppf2_tpu.data.synthetic import SyntheticFrameGenerator

        gen = SyntheticFrameGenerator(
            CATEGORIES["bowl"], n_max=1024, height=120, width=160,
            seed=11, renderer="raster", texture=True,
        )
        frame = gen.next_frame()
        assert int(frame.count) >= gen.min_points
        gray = np.asarray(frame.gray)
        depth = np.asarray(frame.depth)
        assert gray.max() <= 1.0 and gray[depth > 0].min() >= 0.0
        assert np.isfinite(np.asarray(frame.shot)).all()


class TestMugHandleMeta:
    def test_meta_identifies_handle(self, rng):
        from cppf2_tpu.data.shapes import make_category_mesh

        for seed in range(3):
            r = np.random.default_rng(seed)
            (v, f), meta = make_category_mesh("mug", r, return_meta=True)
            assert "handle_cut" in meta and "axis_xz" in meta
            ax, az = meta["axis_xz"]
            cyl = np.hypot(v[:, 0] - ax, v[:, 2] - az)
            handle = cyl > meta["handle_cut"]
            # the handle exists and protrudes on the +x side of the body axis
            assert handle.sum() > 20
            assert (v[handle, 0] - ax).min() > 0
            # and it reaches meaningfully past the wall (a visible yaw cue)
            assert cyl[handle].max() > meta["handle_cut"] * 1.3

    def test_generator_sets_handle_visibility(self):
        gen = SyntheticFrameGenerator(
            CATEGORIES["mug"], n_max=1024, surface_samples=40000,
            height=240, width=320, shot_k=16, seed=2,
        )
        from cppf2_tpu.core.geometry import map_sym

        flags = []
        seen_hidden = False
        for _ in range(30):
            if seen_hidden and len(flags) >= 4:
                break
            f = gen.next_frame()
            seen_hidden = seen_hidden or not gen.last_handle_visible
            assert gen.last_handle_visible in (0, 1)
            meta = gen.last_meta
            pcc = np.asarray(f.pc_canon)[np.asarray(f.valid)]
            if gen.last_handle_visible:
                # flag consistent with the canonical cloud vs the meta cylinder
                cyl = np.hypot(pcc[:, 0] - meta["axis_xz"][0],
                               pcc[:, 2] - meta["axis_xz"][1])
                assert (cyl > meta["handle_cut"]).sum() >= 15
            else:
                # hidden handle: the generator re-canonicalizes the yaw
                # (map_sym) so targets are observable — the stored rotation
                # must be the map_sym fixed point, and the canon cloud must
                # be consistent with it
                rot = np.asarray(f.rotation)
                rot_c = np.asarray(map_sym(jnp.asarray(rot.T), 1)).T
                np.testing.assert_allclose(rot_c, rot, atol=1e-5)
                pc = np.asarray(f.pc)[np.asarray(f.valid)]
                want = ((pc - np.asarray(f.translation)) @ rot
                        / float(f.scale_norm))
                np.testing.assert_allclose(pcc, want, atol=1e-4)
            flags.append(gen.last_handle_visible)
