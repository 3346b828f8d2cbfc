"""Symmetry-aware pose error metrics (degrees, centimeters).

Numpy equivalent of the reference's `compute_RT_degree_cm_symmetry`
(utils/util.py:588-663): rotations are scale-normalized by det^(1/3);
rotation error is the y-axis angle for continuously symmetric classes
(bottle/can/bowl, and handle-occluded mug), min over a 180° flip for
phone/eggbox/glue, and the trace formula otherwise; translation error in cm.
"""

from __future__ import annotations

import numpy as np

_Y_SYM = ("bottle", "can", "bowl")
_Y_SYM_OCCLUDED = ("mug", "chair", "bathtub", "bookshelf", "bed", "sofa", "table")
_FLIP_SYM = ("phone", "eggbox", "glue")


def pose_error_degree_cm(
    rt1: np.ndarray,
    rt2: np.ndarray,
    class_name: str,
    handle_visibility: int = 1,
) -> np.ndarray:
    """Returns np.array([theta_degrees, shift_cm]); [-1, -1] if either RT is
    None — the shape-(2,) equivalent of the reference's scalar -1 broadcast
    (util.py:616-617 assigned into overlaps[i, j, :]). NOTE the shared
    hazard: a [-1, -1] row passes every (degree, cm) threshold, so callers
    must not let a None RT reach the match grid (the drivers pre-fill
    pred_RTs with eye(4), so none does)."""
    if rt1 is None or rt2 is None:
        return np.array([-1.0, -1.0])

    rt1 = np.asarray(rt1, np.float64)
    rt2 = np.asarray(rt2, np.float64)
    t1, t2 = rt1[:3, 3], rt2[:3, 3]
    d1 = np.linalg.det(rt1[:3, :3])
    d2 = np.linalg.det(rt2[:3, :3])
    if not (np.isfinite(d1) and np.isfinite(d2)) or min(abs(d1), abs(d2)) < 1e-12:
        # degenerate rotation block (det ~ 0) -> worst-case angle, without
        # tripping a divide-by-zero RuntimeWarning on the way there
        return np.array([180.0, np.linalg.norm(t1 - t2) * 100.0])
    r1 = rt1[:3, :3] / np.cbrt(d1)
    r2 = rt2[:3, :3] / np.cbrt(d2)

    if class_name in _Y_SYM or (class_name in _Y_SYM_OCCLUDED and handle_visibility == 0):
        y = np.array([0.0, 1.0, 0.0])
        y1, y2 = r1 @ y, r2 @ y
        cos = y1.dot(y2) / (np.linalg.norm(y1) * np.linalg.norm(y2))
        theta = np.arccos(np.clip(cos, -1.0, 1.0))
    elif class_name in _FLIP_SYM:
        flip = np.diag([-1.0, 1.0, -1.0])
        r = r1 @ r2.T
        r_flip = r1 @ flip @ r2.T
        theta = min(
            np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)),
            np.arccos(np.clip((np.trace(r_flip) - 1) / 2, -1, 1)),
        )
    else:
        r = r1 @ r2.T
        theta = np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1))

    deg = np.degrees(theta)
    if not np.isfinite(deg):  # degenerate rotation block (det ~ 0) -> worst case
        deg = 180.0
    return np.array([deg, np.linalg.norm(t1 - t2) * 100.0])


def fetch_rt_pair(est, frame, extras=()):
    """Fetch a pose estimate + its gt frame as NOCS-convention matrices in
    ONE host sync (each sync costs ~80 ms through the TPU relay).

    Returns (rt, scales, gt_rt, gt_scales, *extras_fetched): `rt`/`gt_rt`
    carry R * |s| in the rotation block with unit-normalized `scales` —
    exactly what the mAP harness expects (utils/util.py:2619-2634 divides
    the norm back out via det^(1/3)). `extras` are additional device values
    to ride the same fetch (e.g. est.pick)."""
    import jax

    vals = jax.device_get(
        (est.rotation, est.translation, est.scale, est.scale_norm,
         frame.rotation, frame.translation, frame.scale_norm, frame.bound)
        + tuple(extras)
    )
    rt, scales = _assemble_rt(*vals[:4])
    gt_rt, gt_scales = _assemble_gt(*vals[4:8])
    return (rt, scales, gt_rt, gt_scales) + tuple(vals[8:])


def fetch_rt_pairs(ests, frame, extras_per_est=None):
    """Batch variant of `fetch_rt_pair`: fetch MANY pose estimates against
    the same gt frame in ONE host sync (a paired-variant eval doing one
    fetch per variant pays ~80 ms per extra sync through the TPU relay).

    Returns a list of (rt, scales, gt_rt, gt_scales, *extras_i) in `ests`
    order; `extras_per_est` is an optional same-length list of tuples of
    additional device values riding the same fetch."""
    import jax

    extras_per_est = extras_per_est or [()] * len(ests)
    assert len(extras_per_est) == len(ests), (
        f"extras_per_est has {len(extras_per_est)} entries for "
        f"{len(ests)} estimates — zip would silently drop the tail")
    flat = tuple(
        x for est, ex in zip(ests, extras_per_est)
        for x in (est.rotation, est.translation, est.scale, est.scale_norm)
        + tuple(ex)
    ) + (frame.rotation, frame.translation, frame.scale_norm, frame.bound)
    vals = jax.device_get(flat)
    gt_rt, gt_scales = _assemble_gt(*vals[-4:])
    out, off = [], 0
    for ex in extras_per_est:
        rt, scales = _assemble_rt(*vals[off:off + 4])
        n_ex = len(ex)
        out.append((rt, scales, gt_rt, gt_scales)
                   + tuple(vals[off + 4:off + 4 + n_ex]))
        off += 4 + n_ex
    return out


def _assemble_rt(rot, trans, scale, snorm):
    rt = np.eye(4)
    rt[:3, :3] = np.asarray(rot) * max(float(snorm), 1e-9)
    rt[:3, 3] = np.asarray(trans)
    scales = np.asarray(scale) / max(float(snorm), 1e-9)
    return rt, scales


def _assemble_gt(g_rot, g_trans, g_snorm, g_bound):
    gt_rt = np.eye(4)
    gt_rt[:3, :3] = np.asarray(g_rot) * float(g_snorm)
    gt_rt[:3, 3] = np.asarray(g_trans)
    gt_scales = np.asarray(g_bound) / float(g_snorm)
    return gt_rt, gt_scales
