"""Tests for the NOCS evaluation stack: exact oriented IoU vs a Monte-Carlo
oracle, symmetry handling, pose errors, and the mAP protocol on synthetic
perfect/imperfect predictions."""

import numpy as np
import pytest

from cppf2_tpu.eval import (
    Box,
    compute_degree_cm_map,
    iou_with_symmetry,
    oriented_iou,
    pose_error_degree_cm,
)

SYNSETS = ["BG", "bottle", "bowl", "camera", "can", "laptop", "mug"]


def mc_iou(box1: Box, box2: Box, n=200000, seed=0):
    """Monte-Carlo IoU oracle by sampling in both boxes (utils/iou.py:38-69)."""
    rng = np.random.default_rng(seed)

    def inside(box, pts):
        local = (pts - box.translation) @ box.rotation
        return np.all(np.abs(local) <= box.scale / 2 + 1e-9, axis=1)

    def sample(box):
        local = rng.uniform(-0.5, 0.5, size=(n, 3)) * box.scale
        return local @ box.rotation.T + box.translation

    v1, v2 = box1.volume, box2.volume
    f12 = inside(box2, sample(box1)).mean()
    f21 = inside(box1, sample(box2)).mean()
    inter = (v1 * f12 + v2 * f21) / 2
    union = v1 + v2 - inter
    return inter / union


def rand_rot(rng):
    from scipy.stats import special_ortho_group

    return special_ortho_group.rvs(3, random_state=rng)


class TestOrientedIoU:
    def test_identical(self):
        b = Box(np.eye(3), np.zeros(3), np.array([1, 2, 0.5]))
        assert abs(oriented_iou(b, b) - 1.0) < 1e-3

    def test_disjoint(self):
        b1 = Box(np.eye(3), np.zeros(3), np.ones(3))
        b2 = Box(np.eye(3), np.array([5.0, 0, 0]), np.ones(3))
        assert oriented_iou(b1, b2) == 0.0

    def test_axis_aligned_half_overlap(self):
        b1 = Box(np.eye(3), np.zeros(3), np.ones(3))
        b2 = Box(np.eye(3), np.array([0.5, 0, 0]), np.ones(3))
        # intersection 0.5, union 1.5
        assert abs(oriented_iou(b1, b2) - 1 / 3) < 1e-3

    def test_matches_monte_carlo(self, rng):
        for i in range(6):
            b1 = Box(rand_rot(rng), rng.uniform(-0.2, 0.2, 3), rng.uniform(0.5, 1.5, 3))
            b2 = Box(rand_rot(rng), rng.uniform(-0.2, 0.2, 3), rng.uniform(0.5, 1.5, 3))
            exact = oriented_iou(b1, b2)
            approx = mc_iou(b1, b2, seed=i)
            assert abs(exact - approx) < 0.02, (exact, approx)

    def test_symmetric_class_rotation_invariance(self):
        rt1 = np.eye(4)
        theta = np.deg2rad(40.0)
        c, s = np.cos(theta), np.sin(theta)
        rt2 = np.eye(4)
        rt2[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
        scales = np.array([0.6, 1.0, 0.6])
        asym = iou_with_symmetry(rt1, rt2, scales, scales, 1, "laptop", "laptop")
        sym = iou_with_symmetry(rt1, rt2, scales, scales, 1, "can", "can")
        assert sym > 0.97
        assert asym < sym

    def test_mug_handle_gating(self):
        rt1 = np.eye(4)
        theta = np.deg2rad(40.0)
        c, s = np.cos(theta), np.sin(theta)
        rt2 = np.eye(4)
        rt2[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
        scales = np.array([0.6, 1.0, 0.6])
        occluded = iou_with_symmetry(rt1, rt2, scales, scales, 0, "mug", "mug")
        visible = iou_with_symmetry(rt1, rt2, scales, scales, 1, "mug", "mug")
        assert occluded > 0.97 and visible < occluded


class TestPoseErrors:
    def test_identity(self):
        rt = np.eye(4)
        err = pose_error_degree_cm(rt, rt, "laptop")
        np.testing.assert_allclose(err, [0, 0], atol=1e-6)

    def test_known_rotation_translation(self):
        rt1 = np.eye(4)
        theta = np.deg2rad(30)
        c, s = np.cos(theta), np.sin(theta)
        rt2 = np.eye(4)
        rt2[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        rt2[:3, 3] = [0.05, 0, 0]
        err = pose_error_degree_cm(rt1, rt2, "camera")
        np.testing.assert_allclose(err, [30.0, 5.0], atol=1e-4)

    def test_y_symmetry(self):
        rt1 = np.eye(4)
        theta = np.deg2rad(77)
        c, s = np.cos(theta), np.sin(theta)
        rt2 = np.eye(4)
        rt2[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]  # rotation about y
        err = pose_error_degree_cm(rt1, rt2, "can")
        assert err[0] < 1e-4

    def test_degenerate_rotation_is_worst_case(self):
        # all-zero rotation block (a failed prediction) must score 180 deg,
        # not NaN — NaNs would poison medians and the mAP accumulators
        rt1 = np.eye(4)
        bad = np.eye(4)
        bad[:3, :3] = 0.0
        err = pose_error_degree_cm(bad, rt1, "laptop")
        assert err[0] == 180.0 and np.isfinite(err).all()

    def test_scaled_rotation_normalized(self):
        rt1 = np.eye(4)
        rt2 = np.eye(4)
        rt2[:3, :3] *= 2.5  # scale folded into R, as NOCS predictions do
        err = pose_error_degree_cm(rt1, rt2, "laptop")
        np.testing.assert_allclose(err, [0, 0], atol=1e-5)


def _perfect_image(rng, cls_ids=(4, 5)):
    n = len(cls_ids)
    rts, scales = [], []
    for i in range(n):
        rt = np.eye(4)
        rt[:3, :3] = rand_rot(rng)
        rt[:3, 3] = rng.uniform(-0.5, 0.5, 3)
        rts.append(rt)
        scales.append(rng.uniform(0.1, 0.3, 3))
    rts = np.stack(rts)
    scales = np.stack(scales)
    return {
        "gt_class_ids": np.array(cls_ids),
        "gt_RTs": rts,
        "gt_scales": scales,
        "gt_handle_visibility": np.ones(n, np.int32),
        "pred_class_ids": np.array(cls_ids),
        "pred_RTs": rts.copy(),
        "pred_scales": scales.copy(),
        "pred_scores": np.ones(n),
    }


class TestMAP:
    def test_perfect_predictions(self, rng):
        images = [_perfect_image(rng) for _ in range(3)]
        iou_aps, pose_aps = compute_degree_cm_map(
            images, SYNSETS,
            iou_3d_thresholds=(0.1, 0.25, 0.5, 0.75),
            verbose=False,
        )
        # classes 4 (can) and 5 (laptop) are present and perfect
        assert iou_aps[4, 2] > 0.99 and iou_aps[5, 2] > 0.99
        assert pose_aps[4, 0, 0] > 0.99 and pose_aps[5, 0, 0] > 0.99

    def test_wrong_translation_fails_tight_threshold(self, rng):
        images = []
        for _ in range(3):
            im = _perfect_image(rng)
            im["pred_RTs"] = im["pred_RTs"].copy()
            im["pred_RTs"][:, :3, 3] += np.array([0.07, 0, 0])  # 7 cm off
            images.append(im)
        iou_aps, pose_aps = compute_degree_cm_map(
            images, SYNSETS,
            iou_3d_thresholds=(0.1, 0.25, 0.5),
            degree_thresholds=(5, 10, 15), shift_thresholds=(5, 10, 15),
            verbose=False,
        )
        # 7cm shift: fails 5cm threshold, passes 10cm
        assert pose_aps[4, 0, 0] < 0.01
        assert pose_aps[4, 0, 1] > 0.99

    def test_missing_detection_halves_recall(self, rng):
        images = []
        for _ in range(2):
            im = _perfect_image(rng, cls_ids=(4, 4))
            for k in ("pred_class_ids", "pred_RTs", "pred_scales", "pred_scores"):
                im[k] = im[k][:1]
            images.append(im)
        iou_aps, _ = compute_degree_cm_map(
            images, SYNSETS, iou_3d_thresholds=(0.1, 0.25), verbose=False,
        )
        assert abs(iou_aps[4, 1] - 0.5) < 0.05

    def test_multiprocessing_matches_serial(self, rng):
        images = [_perfect_image(rng) for _ in range(4)]
        im = images[1]
        im["pred_RTs"] = im["pred_RTs"].copy()
        im["pred_RTs"][:, :3, 3] += np.array([0.07, 0, 0])
        kwargs = dict(
            synset_names=SYNSETS, iou_3d_thresholds=(0.1, 0.25, 0.5),
            degree_thresholds=(5, 10, 15), shift_thresholds=(5, 10, 15),
            verbose=False,
        )
        iou_s, pose_s = compute_degree_cm_map(images, num_proc=1, **kwargs)
        iou_p, pose_p = compute_degree_cm_map(images, num_proc=2, **kwargs)
        np.testing.assert_allclose(iou_p, iou_s)
        np.testing.assert_allclose(pose_p, pose_s)

    def test_plot_artifact_set(self, rng, tmp_path):
        # full reference artifact set (utils/util.py:2797-2930)
        images = [_perfect_image(rng) for _ in range(2)]
        compute_degree_cm_map(
            images, SYNSETS, log_dir=str(tmp_path),
            iou_3d_thresholds=(0.1, 0.25, 0.5),
            degree_thresholds=(5, 10, 15), shift_thresholds=(5, 10, 15),
            verbose=False, plot=True,
        )
        import pickle

        names = {p.name for p in tmp_path.iterdir()}
        assert "aps.npz" in names
        assert "IoU_3D_AP_0.1-0.5.png" in names
        assert "Pose_Only_mAP_5-15cm.png" in names
        assert "Pose_Only_mAP_5-15degree.png" in names
        assert "Pose_Only_mAP_5-15degree_5-15cm.png" in names
        for cls in SYNSETS[1:]:
            assert f"Pose_Only_AP_{cls}_5-15degree_5-15cm.png" in names
        with open(tmp_path / "IoU_3D_AP_0.1-0.5.pkl", "rb") as f:
            iou_dict = pickle.load(f)
        assert iou_dict["thres_list"] == [0.1, 0.25, 0.5]
        assert iou_dict["aps"].shape == (len(SYNSETS) + 1, 3)
        with open(tmp_path / "Pose_Only_AP_5-15degree_5-15cm.pkl", "rb") as f:
            pose_dict = pickle.load(f)
        assert pose_dict["degree_thres"] == [5, 10, 15, 360]
        assert pose_dict["aps"].shape == (len(SYNSETS) + 1, 4, 4)


class TestFetchRtPair:
    def test_nocs_convention_matrices(self):
        from collections import namedtuple

        from cppf2_tpu.eval.pose_errors import fetch_rt_pair

        Est = namedtuple("Est", "rotation translation scale scale_norm pick")
        Frame = namedtuple("Frame", "rotation translation scale_norm bound")
        r = np.eye(3, dtype=np.float32)
        est = Est(r, np.array([1.0, 2.0, 3.0], np.float32),
                  np.array([0.6, 0.8, 0.0], np.float32), np.float32(2.0),
                  np.int32(1))
        f = Frame(r, np.zeros(3, np.float32), np.float32(0.5),
                  np.array([0.3, 0.4, 0.0], np.float32))
        rt, scales, gt_rt, gt_scales, pick = fetch_rt_pair(
            est, f, extras=(est.pick,))
        np.testing.assert_allclose(rt[:3, :3], r * 2.0)
        np.testing.assert_allclose(rt[:3, 3], [1, 2, 3])
        np.testing.assert_allclose(scales, [0.3, 0.4, 0.0])
        np.testing.assert_allclose(gt_rt[:3, :3], r * 0.5)
        np.testing.assert_allclose(gt_scales, [0.6, 0.8, 0.0])
        assert int(pick) == 1

    def test_batched_matches_single(self):
        # fetch_rt_pairs == [fetch_rt_pair(e) for e in ests], one sync
        from collections import namedtuple

        from cppf2_tpu.eval.pose_errors import fetch_rt_pair, fetch_rt_pairs

        Est = namedtuple("Est", "rotation translation scale scale_norm pick")
        Frame = namedtuple("Frame", "rotation translation scale_norm bound")
        rng = np.random.default_rng(3)
        ests = [
            Est(np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32),
                rng.normal(size=3).astype(np.float32),
                np.abs(rng.normal(size=3)).astype(np.float32),
                np.float32(1.0 + i), np.int32(i))
            for i in range(3)
        ]
        f = Frame(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                  np.float32(0.5), np.array([0.3, 0.4, 0.0], np.float32))
        batched = fetch_rt_pairs(
            ests, f, extras_per_est=[(e.pick,) for e in ests])
        for est, got in zip(ests, batched):
            want = fetch_rt_pair(est, f, extras=(est.pick,))
            for a, b in zip(got, want):
                np.testing.assert_allclose(a, b)
