"""Image-parallel eval: sharded batched instance graph matches the serial
driver, and the parallel REAL275 driver reproduces the serial AP tables on an
8-virtual-device CPU mesh (conftest provisions the devices)."""

import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mini_real275(tmp_path_factory):
    """One REAL275-format image with two can instances (exercises batching
    and device padding on the 8-device mesh)."""
    import cv2
    import jax.numpy as jnp

    from cppf2_tpu.data.render import splat_render_depth
    from cppf2_tpu.data.shapes import make_category_mesh, sample_surface
    from cppf2_tpu.eval.driver import REAL275_INTRINSICS

    root = tmp_path_factory.mktemp("real275p")
    det_dir = root / "detections"
    img_dir = root / "images"
    det_dir.mkdir()
    img_dir.mkdir()

    rng = np.random.default_rng(1)
    depth_full = np.zeros((480, 640), np.float32)
    gray_full = np.zeros((480, 640), np.float32)
    masks, rts, bounds = [], [], []
    for i in range(2):
        v, f = make_category_mesh("can", rng)
        pts, nrm = sample_surface((v, f), 120000, rng)
        R = np.eye(3, dtype=np.float32)
        T = np.array([-0.15 + 0.3 * i, 0.0, 0.9], np.float32)
        s = np.float32(0.14)
        depth, gray = splat_render_depth(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(R), jnp.asarray(T),
            s, jnp.asarray(REAL275_INTRINSICS), height=480, width=640,
        )
        depth = np.asarray(depth)
        m = depth > 0
        masks.append(m)
        keep = m & ((depth_full == 0) | (depth < depth_full))
        depth_full = np.where(keep, depth, depth_full)
        gray_full = np.where(keep, np.asarray(gray), gray_full)
        rt = np.eye(4)
        rt[:3, :3] = R
        rt[:3, 3] = T
        rts.append(rt)
        bounds.append((v.max(0) - v.min(0)) * s)

    name = "scene_1_0000"
    cv2.imwrite(str(img_dir / f"{name}_color.png"),
                (np.stack([gray_full] * 3, -1) * 255).astype(np.uint8))
    cv2.imwrite(str(img_dir / f"{name}_depth.png"),
                (depth_full * 1000).astype(np.uint16))
    res = {
        "image_path": f"data/real/test/{name}",
        "gt_class_ids": np.array([4, 4]),
        "gt_RTs": np.stack(rts),
        "gt_scales": np.stack(bounds).astype(np.float64),
        "gt_handle_visibility": np.array([1, 1]),
        "pred_class_ids": np.array([4, 4]),
        "pred_masks": np.stack(masks, -1),
        "pred_bboxes": np.array([[0, 0, 480, 640]] * 2),
        "pred_scores": np.array([1.0, 1.0]),
    }
    with open(det_dir / f"results_{name}.pkl", "wb") as f2:
        pickle.dump(res, f2)
    return str(det_dir), str(img_dir)


class TestParallelEval:
    def test_batched_fn_matches_serial_instance(self, mini_real275):
        import cv2
        import jax
        import jax.numpy as jnp

        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import (
            REAL275_INTRINSICS,
            estimate_instance,
            load_category_models,
        )
        from cppf2_tpu.eval.parallel_eval import make_batched_instance_fn
        from cppf2_tpu.parallel import make_mesh

        det_dir, img_dir = mini_real275
        pkl = sorted(os.listdir(det_dir))[0]
        res = pickle.load(open(os.path.join(det_dir, pkl), "rb"))
        name = os.path.basename(res["image_path"])
        depth = (
            cv2.imread(os.path.join(img_dir, name + "_depth.png"), -1) / 1000.0
        ).astype(np.float32)
        rgb = cv2.imread(os.path.join(img_dir, name + "_color.png"))[:, :, ::-1]

        models = load_category_models(None, ["can"])["can"]
        pipe = PipelineConfig(n_points=512, num_pairs=1024, opt_steps=5)
        mesh = make_mesh(2)  # batch of 2 instances, one per device
        keys = jax.random.split(jax.random.key(7), 2)

        fn = make_batched_instance_fn(models, "can", pipe, mesh, run_opt=False)
        depths = jnp.asarray(np.stack([depth, depth]))
        ms = jnp.asarray(np.stack([res["pred_masks"][:, :, i] for i in range(2)]))
        rot, trans, scale, snorm, loss, count, ext = jax.tree.map(
            np.asarray, fn(depths, ms, keys)
        )
        assert count.min() >= 32

        for i in range(2):
            out = estimate_instance(
                rgb, depth, res["pred_masks"][:, :, i].astype(bool),
                REAL275_INTRINSICS, models, "can", pipe, keys[i],
                run_opt=False, use_visual=False, crop=None,
            )
            assert out is not None
            rt_serial, scales_serial, _ = out
            np.testing.assert_allclose(trans[i], rt_serial[:3, 3], atol=1e-3)
            np.testing.assert_allclose(
                rot[i] * max(float(snorm[i]), 1e-9), rt_serial[:3, :3], atol=1e-3
            )

    @pytest.mark.slow
    def test_parallel_driver_matches_serial(self, mini_real275, tmp_path):
        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import evaluate_real275
        from cppf2_tpu.eval.parallel_eval import evaluate_real275_parallel

        det_dir, img_dir = mini_real275
        pipe = PipelineConfig(
            n_points=512, num_pairs=1024, opt_steps=5, angle_tol_deg=3.0
        )
        iou_s, pose_s = evaluate_real275(
            det_dir, img_dir, str(tmp_path / "serial"), ckpt_root=None,
            pipe=pipe, run_opt=False, seed=5,
        )
        iou_p, pose_p = evaluate_real275_parallel(
            det_dir, img_dir, str(tmp_path / "parallel"), ckpt_root=None,
            pipe=pipe, run_opt=False, seed=5, n_devices=8,
        )
        assert iou_p.shape == iou_s.shape and pose_p.shape == pose_s.shape
        # same seeds, same serial key order -> same sampled bins -> same APs
        np.testing.assert_allclose(iou_p, iou_s, atol=0.05)
        np.testing.assert_allclose(pose_p, pose_s, atol=0.05)
        out_pkls = os.listdir(tmp_path / "parallel")
        assert any(p.startswith("results_") for p in out_pkls)


class TestSliceMesh:
    """Two-level (dcn, data) topology: images across slices, tuple votes
    within a slice; no collective crosses the DCN axis."""

    def test_image_sharded_tuple_vote_matches_dense(self):
        import jax.numpy as jnp

        from cppf2_tpu.core.geometry import fibonacci_sphere
        from cppf2_tpu.parallel import image_sharded_tuple_vote, make_slice_mesh

        rng = np.random.default_rng(3)
        mesh = make_slice_mesh(2, 4)
        b, v = 4, 256
        sphere = np.asarray(fibonacci_sphere(179), np.float32)
        dirs = rng.normal(size=(b, v, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        w = rng.uniform(0.5, 1.5, (b, v)).astype(np.float32)
        tol = 10.0

        best, counts = image_sharded_tuple_vote(
            jnp.asarray(dirs), jnp.asarray(w), jnp.asarray(sphere), tol, mesh
        )
        # dense single-device oracle
        thresh = np.cos(np.deg2rad(2 * tol))
        hits = (dirs @ sphere.T > thresh).astype(np.float32)
        dense = np.einsum("bv,bvs->bs", w, hits)
        np.testing.assert_allclose(
            np.asarray(counts), dense.max(-1), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(best), sphere[dense.argmax(-1)], rtol=1e-6
        )

    @pytest.mark.slow
    def test_dcn_image_axis_matches_flat_mesh(self):
        """The same instance batch poses identically whether images shard
        over a flat 8-device mesh or the dcn axis of a (2, 4) slice mesh."""
        import jax
        import jax.numpy as jnp

        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import load_category_models
        from cppf2_tpu.eval.parallel_eval import make_batched_instance_fn
        from cppf2_tpu.parallel import make_mesh, make_slice_mesh

        rng = np.random.default_rng(4)
        pipe = PipelineConfig(
            n_points=256, num_pairs=512, opt_steps=2, angle_tol_deg=5.0
        )
        models = load_category_models(None, ["can"])["can"]
        h, w = 96, 128
        depths = np.zeros((8, h, w), np.float32)
        depths[:, 30:70, 40:90] = 0.8
        depths += rng.uniform(0, 2e-3, depths.shape).astype(np.float32)
        masks = depths > 0.5
        keys = jax.random.split(jax.random.key(5), 8)

        flat = make_batched_instance_fn(
            models, "can", pipe, make_mesh(8), run_opt=False
        )
        sliced = make_batched_instance_fn(
            models, "can", pipe, make_slice_mesh(2, 4), run_opt=False,
            axis="dcn",
        )
        a = flat(jnp.asarray(depths), jnp.asarray(masks), keys)
        b = sliced(jnp.asarray(depths), jnp.asarray(masks), keys)
        for xa, xb in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(xa), np.asarray(xb), atol=1e-5
            )
