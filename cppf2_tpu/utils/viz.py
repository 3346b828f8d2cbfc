"""Pose visualization: projected 3D bbox + axes overlay.

Equivalent of the reference's `draw` (utils/util.py:2208-2235) and the
get_3d_bbox / transform / project chain it feeds on (demo.py:302-311,
eval.py:384-395)."""

from __future__ import annotations

import numpy as np

from cppf2_tpu.core.geometry import (
    calculate_2d_projections,
    get_3d_bbox,
    transform_coordinates_3d,
)


def draw_bbox_axes(img, imgpts, axes, color=(255, 0, 0), size=3):
    """Draw the projected 3D box (8 corners) + pose axes onto img (RGB)."""
    import cv2

    imgpts = np.int32(imgpts).reshape(-1, 2)
    ground = tuple(int(c * 0.3) for c in color)
    pillar = tuple(int(c * 0.6) for c in color)
    for i, j in zip([4, 5, 6, 7], [5, 7, 4, 6]):
        img = cv2.line(img, tuple(imgpts[i]), tuple(imgpts[j]), ground, size)
    for i, j in zip(range(4), range(4, 8)):
        img = cv2.line(img, tuple(imgpts[i]), tuple(imgpts[j]), pillar, size)
    for i, j in zip([0, 1, 2, 3], [1, 3, 0, 2]):
        img = cv2.line(img, tuple(imgpts[i]), tuple(imgpts[j]), color, size)
    img = cv2.line(img, tuple(axes[0]), tuple(axes[1]), (0, 0, 255), size)  # z
    img = cv2.line(img, tuple(axes[0]), tuple(axes[3]), (255, 0, 0), size)  # x
    img = cv2.line(img, tuple(axes[0]), tuple(axes[2]), (0, 255, 0), size)  # y
    return img


def draw_pose_overlay(rgb, rt, scales, intrinsics, color=(255, 0, 0), flipped=True):
    """Overlay the estimated 9-DoF pose on an RGB frame (NOCS convention:
    rt carries R*|s|, scales is unit-normalized).

    `flipped=True` (default) treats rt as living in the backprojected cloud
    frame, whose x/y axes are negated relative to the camera
    (core/geometry.py::backproject_masked) — it is unflipped before projecting.
    """
    if flipped:
        f4 = np.diag([-1.0, -1.0, 1.0, 1.0])
        rt = f4 @ np.asarray(rt, np.float64)
    img = np.ascontiguousarray(rgb.copy())
    xyz_axis = 0.3 * np.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=np.float64
    ).T
    axes = calculate_2d_projections(
        transform_coordinates_3d(xyz_axis, rt), intrinsics
    )
    bbox3d = get_3d_bbox(scales, 0)
    proj = calculate_2d_projections(
        transform_coordinates_3d(bbox3d, rt), intrinsics
    )
    return draw_bbox_axes(img, proj, axes, color)
