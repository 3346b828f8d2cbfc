"""Real-ShapeNet ingestion path: split file -> model path -> OBJ parse ->
surface sampling -> synthetic frame (reference: dataset.py:191-213).

Uses a committed ShapeNetCore.v2-style fixture (quad faces, v/vt/vn records,
negative indices) so the path is exercised without ShapeNet assets."""

import os

import numpy as np

from cppf2_tpu.config import CATEGORIES
from cppf2_tpu.data.shapes import (
    load_obj,
    load_shapenet_split,
    sample_surface,
    shapenet_model_path,
)
from cppf2_tpu.data.synthetic import SyntheticFrameGenerator

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


class TestShapeNetIngestion:
    def test_split_and_path(self):
        names = load_shapenet_split(
            os.path.join(FIXTURES, "shapenet_split.txt"), category_id=2
        )
        assert names == ["02880940/abc123def", "02880940/0123456789"]
        path = shapenet_model_path(os.path.join(FIXTURES, "shapenet"), names[0])
        assert path.endswith("02880940/abc123def/models/model_normalized.obj")
        assert os.path.exists(path)

    def test_load_obj_fan_triangulation(self):
        path = shapenet_model_path(
            os.path.join(FIXTURES, "shapenet"), "02880940/abc123def"
        )
        verts, faces = load_obj(path)
        assert verts.shape == (8, 3)
        assert faces.shape == (12, 3)  # 6 quads fan-triangulated
        assert faces.min() >= 0 and faces.max() < 8  # negative indices resolved
        # total surface area of the unit cube = 6
        tri = verts[faces]
        area = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
        ).sum()
        np.testing.assert_allclose(area, 6.0, rtol=1e-5)

    def test_obj_to_frame(self, rng):
        path = shapenet_model_path(
            os.path.join(FIXTURES, "shapenet"), "02880940/abc123def"
        )
        mesh = load_obj(path)
        pts, nrm = sample_surface(mesh, 2000, rng)
        assert np.abs(pts).max() <= 0.5 + 1e-6
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)

        gen = SyntheticFrameGenerator(
            CATEGORIES["bowl"], n_max=1024, height=120, width=160,
            surface_samples=20000, seed=3,
        )
        frame = gen.next_frame(mesh=mesh)
        count = int(frame.count)
        assert count >= gen.min_points
        pc = np.asarray(frame.pc)[np.asarray(frame.valid)]
        # canonical frame roundtrip: pc_canon = (pc - t) @ R / bound.max()
        canon = (pc - np.asarray(frame.translation)) @ np.asarray(frame.rotation) / float(
            frame.scale_norm
        )
        np.testing.assert_allclose(
            np.asarray(frame.pc_canon)[np.asarray(frame.valid)], canon, atol=1e-4
        )
        # up-symmetric category: map_sym rotates the canonical frame about y,
        # so xz corners of the cube can reach sqrt(2)/2
        assert np.abs(canon).max() <= np.sqrt(0.5) + 0.05
