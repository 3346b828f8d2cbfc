"""Geometric instance proposer tests: synthetic tabletop oracle scenes plus
the example_data parity check against the reference's shipped mask."""

import os

import numpy as np
import pytest

EXAMPLE = "/root/reference/example_data"

K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)


def tabletop_scene(rng, objects, table_z=1.0, h=480, w=640, noise=1e-3):
    """Analytic depth frame: a fronto-parallel plane at `table_z` plus
    sphere-cap 'objects' [(cx_px, cy_px, radius_m, z_m), ...] in front of it.
    Returns (depth, [gt masks])."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = np.full((h, w), table_z, np.float32)
    gts = []
    for (cx, cy, radius, z) in objects:
        rpix = radius * K[0, 0] / z
        d2 = (xs - cx) ** 2 + (ys - cy) ** 2
        m = d2 < rpix**2
        bump = np.sqrt(np.maximum(radius**2 - d2 * (z / K[0, 0]) ** 2, 0.0))
        depth = np.where(m, z - bump, depth)
        gts.append(m)
    depth += rng.normal(0, noise, (h, w)).astype(np.float32)
    return depth, gts


class TestProposer:
    def test_isolates_object_from_support_plane(self, rng):
        from cppf2_tpu.infer.segmenter import propose_instances

        depth, gts = tabletop_scene(rng, [(320, 240, 0.08, 0.9)])
        props = propose_instances(depth, K, scale_range=(0.12, 0.2))
        assert props, "no proposal on a clean tabletop scene"
        iou = (props[0] & gts[0]).sum() / (props[0] | gts[0]).sum()
        assert iou > 0.7, iou

    def test_two_instances_both_proposed(self, rng):
        from cppf2_tpu.infer.segmenter import propose_instances

        depth, gts = tabletop_scene(
            rng, [(200, 240, 0.08, 0.9), (460, 220, 0.07, 0.85)]
        )
        props = propose_instances(depth, K, scale_range=(0.1, 0.2))
        assert len(props) >= 2
        for gt in gts:
            best = max((p & gt).sum() / (p | gt).sum() for p in props)
            assert best > 0.6, best

    def test_scale_prior_rejects_wrong_size(self, rng):
        from cppf2_tpu.infer.segmenter import propose_instances

        # a 16-cm object cannot satisfy a 40+ cm (laptop-like) prior
        depth, _ = tabletop_scene(rng, [(320, 240, 0.08, 0.9)])
        props = propose_instances(depth, K, scale_range=(0.55, 0.7))
        assert props == []

    def test_empty_and_flat_scenes(self, rng):
        from cppf2_tpu.infer.segmenter import propose_instances

        assert propose_instances(np.zeros((120, 160), np.float32), K) == []
        flat, _ = tabletop_scene(rng, [])
        # a bare support plane proposes nothing (everything is plane)
        assert propose_instances(flat, K, min_pixels=300) == []

    def test_dominant_plane_orientation(self, rng):
        from cppf2_tpu.infer.segmenter import (
            backproject_grid,
            dominant_plane,
            grid_normals,
        )

        depth, _ = tabletop_scene(rng, [])
        valid = depth > 0.1
        pts = backproject_grid(depth, K)
        out = dominant_plane(pts, grid_normals(pts, valid), valid)
        assert out is not None
        mask, n0, d0 = out
        assert mask.sum() > 0.5 * valid.sum()
        # plane at z=1 fronto-parallel: normal ~ +-z, camera side positive
        assert abs(abs(n0[2]) - 1) < 0.05
        assert d0 < 0 or abs(d0) < 1e-6  # oriented: camera on positive side
        assert abs(abs(d0) - 1.0) < 0.02


@pytest.mark.skipif(not os.path.isdir(EXAMPLE), reason="example_data absent")
class TestExampleDataParity:
    """The reference demo's scene (YCB drill on a cluttered table,
    demo.py:95-115 segments it with a COCO Mask R-CNN): the geometric
    proposer must recover the same instance from depth alone."""

    def _load(self):
        import cv2

        k = np.array(
            [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]],
            np.float32,
        )
        depth = cv2.imread(os.path.join(EXAMPLE, "depth.png"), -1)
        depth = depth.astype(np.float32) / 10000.0  # YCB-V: 0.1 mm units
        gt = cv2.imread(os.path.join(EXAMPLE, "mask.png"), -1) > 0
        return depth, gt, k

    def test_drill_among_top_proposals(self):
        from cppf2_tpu.infer.segmenter import propose_instances

        depth, gt, k = self._load()
        props = propose_instances(depth, k, scale_range=(0.15, 0.22))
        ious = [(p & gt).sum() / (p | gt).sum() for p in props]
        # the scene holds several scale-compatible YCB objects (cheezit box,
        # mustard, banana) a class-agnostic proposer legitimately also
        # returns; the drill must be recovered cleanly among them
        assert max(ious) > 0.5, ious
        # sanity: every proposal is a plausible instance, not background
        assert all(p.sum() > 2000 for p in props)

    def test_demo_auto_mask_poses_the_drill(self):
        import cv2

        from cppf2_tpu.demo import auto_instance_mask

        depth, gt, k = self._load()
        # the demo's selection path: ranked proposals + --mask-index
        ious = []
        for idx in range(4):
            m, from_proposal = auto_instance_mask(
                depth, k, scale_range=(0.15, 0.22), mask_index=idx)
            assert from_proposal
            ious.append((m & gt).sum() / (m | gt).sum())
        assert max(ious) > 0.5, ious
