"""End-to-end integration tests: the REAL275 eval driver over a synthetic
mini-dataset, and the quick custom-training example."""

import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_real275(tmp_path_factory):
    """A 2-image REAL275-format dataset rendered with the splat renderer."""
    import jax
    import jax.numpy as jnp
    import cv2

    from cppf2_tpu.config import CATEGORIES
    from cppf2_tpu.data.render import splat_render_depth
    from cppf2_tpu.data.shapes import make_category_mesh, sample_surface
    from cppf2_tpu.eval.driver import REAL275_INTRINSICS

    root = tmp_path_factory.mktemp("real275")
    det_dir = root / "detections"
    img_dir = root / "images"
    det_dir.mkdir()
    img_dir.mkdir()

    rng = np.random.default_rng(0)
    for i in range(2):
        v, f = make_category_mesh("can", rng)
        pts, nrm = sample_surface((v, f), 150000, rng)
        R = np.eye(3, dtype=np.float32)
        T = np.array([0.05 * i, 0.0, 0.9], np.float32)
        s = np.float32(0.15)
        depth, gray = splat_render_depth(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(R), jnp.asarray(T),
            s, jnp.asarray(REAL275_INTRINSICS), height=480, width=640,
        )
        depth = np.asarray(depth)
        gray = np.asarray(gray)
        mask = depth > 0
        name = f"scene_1_{i:04d}"
        cv2.imwrite(str(img_dir / f"{name}_color.png"),
                    (np.stack([gray] * 3, -1) * 255).astype(np.uint8))
        cv2.imwrite(str(img_dir / f"{name}_depth.png"),
                    (depth * 1000).astype(np.uint16))

        rt = np.eye(4)
        rt[:3, :3] = R
        rt[:3, 3] = T
        bound = (v.max(0) - v.min(0)) * s
        res = {
            "image_path": f"data/real/test/{name}",
            "gt_class_ids": np.array([4]),
            "gt_RTs": rt[None],
            "gt_scales": bound[None].astype(np.float64),
            "gt_handle_visibility": np.array([1]),
            "pred_class_ids": np.array([4]),
            "pred_masks": mask[:, :, None],
            "pred_bboxes": np.array([[0, 0, 480, 640]]),
            "pred_scores": np.array([1.0]),
        }
        with open(det_dir / f"results_{name}.pkl", "wb") as f2:
            pickle.dump(res, f2)
    return str(det_dir), str(img_dir), str(root)


@pytest.fixture(scope="module")
def synthetic_real275_multi(tmp_path_factory):
    """A 3-frame, 2-category REAL275 tree with the production failure modes:
    a multi-instance frame, a gt object with no detection (missed detection),
    and a detection with an all-empty mask (Mask R-CNN artifact)."""
    import cv2
    import jax.numpy as jnp

    from cppf2_tpu.data.render import splat_render_depth
    from cppf2_tpu.data.shapes import make_category_mesh, sample_surface
    from cppf2_tpu.eval.driver import REAL275_INTRINSICS

    root = tmp_path_factory.mktemp("real275_multi")
    det_dir, img_dir = root / "detections", root / "images"
    det_dir.mkdir()
    img_dir.mkdir()
    rng = np.random.default_rng(3)

    def render(cat, T, s):
        v, f = make_category_mesh(cat, rng)
        pts, nrm = sample_surface((v, f), 150000, rng)
        R = np.eye(3, dtype=np.float32)
        depth, gray = splat_render_depth(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(R),
            jnp.asarray(np.asarray(T, np.float32)), np.float32(s),
            jnp.asarray(REAL275_INTRINSICS), height=480, width=640,
        )
        depth, gray = np.asarray(depth), np.asarray(gray)
        rt = np.eye(4)
        rt[:3, :3] = R
        rt[:3, 3] = T
        bound = (v.max(0) - v.min(0)) * s
        return depth, gray, rt, bound

    # frame 0: can + mug, both detected (multi-instance, multi-category)
    # frame 1: can detected; a gt mug carries NO detection (missed det);
    #          plus a detected mug whose mask is all-empty (degenerate)
    # frame 2: mug only
    frames = [
        [("can", (-0.12, 0.0, 0.9), 0.15, True), ("mug", (0.12, 0.0, 0.9), 0.2, True)],
        [("can", (-0.12, 0.0, 0.9), 0.15, True), ("mug", (0.12, 0.0, 0.9), 0.2, False)],
        [("mug", (0.0, 0.0, 0.85), 0.2, True)],
    ]
    cls_ids = {"can": 4, "mug": 6}
    for i, insts in enumerate(frames):
        depth = np.zeros((480, 640), np.float32)
        gray = np.zeros((480, 640), np.float32)
        gt_ids, gt_rts, gt_scales, det_ids, det_masks = [], [], [], [], []
        for cat, T, s, detected in insts:
            d, g, rt, bound = render(cat, T, s)
            m = d > 0
            vis = m & ((depth == 0) | (d < depth))  # z-buffer composite
            depth = np.where(vis, d, depth)
            gray = np.where(vis, g, gray)
            gt_ids.append(cls_ids[cat])
            gt_rts.append(rt)
            gt_scales.append(bound)
            if detected:
                det_ids.append(cls_ids[cat])
                det_masks.append(vis)
        if i == 1:  # the empty-mask detection artifact
            det_ids.append(6)
            det_masks.append(np.zeros((480, 640), bool))
        name = f"scene_m_{i:04d}"
        cv2.imwrite(str(img_dir / f"{name}_color.png"),
                    (np.stack([gray] * 3, -1) * 255).astype(np.uint8))
        cv2.imwrite(str(img_dir / f"{name}_depth.png"),
                    (depth * 1000).astype(np.uint16))
        res = {
            "image_path": f"data/real/test/{name}",
            "gt_class_ids": np.array(gt_ids),
            "gt_RTs": np.stack(gt_rts),
            "gt_scales": np.stack(gt_scales).astype(np.float64),
            "gt_handle_visibility": np.ones(len(gt_ids), np.int64),
            "pred_class_ids": np.array(det_ids),
            "pred_masks": np.stack(det_masks, -1),
            "pred_bboxes": np.zeros((len(det_ids), 4)),
            "pred_scores": np.ones(len(det_ids)),
        }
        with open(det_dir / f"results_{name}.pkl", "wb") as f2:
            pickle.dump(res, f2)
    return str(det_dir), str(img_dir)


class TestEvalDriver:
    def test_full_loop(self, synthetic_real275, tmp_path):
        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import evaluate_real275

        det_dir, img_dir, _ = synthetic_real275
        pipe = PipelineConfig(
            n_points=1024, num_pairs=2048, opt_steps=10,
            angle_tol_deg=3.0,
        )
        iou_aps, pose_aps = evaluate_real275(
            det_dir, img_dir, str(tmp_path / "out"), ckpt_root=None,
            pipe=pipe, run_opt=False,
        )
        # untrained models: the pipeline must run and emit the full AP tables,
        # accuracy is not asserted
        assert iou_aps.shape[0] == 8  # 7 synset entries + mean
        assert pose_aps.shape[1] == 4  # 3 thresholds + 360 sentinel
        out_pkls = os.listdir(tmp_path / "out")
        assert any(p.startswith("results_") for p in out_pkls)

    @pytest.mark.slow
    def test_dress_rehearsal_multi_category(self, synthetic_real275_multi,
                                            tmp_path, capsys):
        """Production-scale rehearsal of the FULL driver (eval.py:54-412):
        3 frames x 2 categories, a multi-instance frame, a missed detection,
        an empty detection mask, and the --debug artifact path."""
        import glob as globmod

        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import evaluate_real275

        det_dir, img_dir = synthetic_real275_multi
        out = str(tmp_path / "out")
        pipe = PipelineConfig(n_points=1024, num_pairs=2048, opt_steps=5,
                              angle_tol_deg=3.0)
        iou_aps, pose_aps = evaluate_real275(
            det_dir, img_dir, out, ckpt_root=None, pipe=pipe, run_opt=False,
            debug=True,
        )
        # full AP tables over the 6-class synset (+background +mean rows);
        # classes with no gt in the mini-dataset are legitimately NaN
        assert iou_aps.shape[0] == 8
        assert pose_aps.shape == (8, 4, 4)
        for cls_id in (4, 6):  # can, mug are present in the frame set
            assert np.isfinite(iou_aps[cls_id]).all()
        # (pose APs are IoU@0.1-gated — with untrained models they can be
        # legitimately NaN; accuracy is the synthetic benchmark's job)
        # every frame writes its result pkl
        out_pkls = sorted(p for p in os.listdir(out) if p.startswith("results_"))
        assert len(out_pkls) == 3
        # the empty-mask detection was rejected: its pred stays identity
        res1 = pickle.load(open(os.path.join(out, out_pkls[1]), "rb"))
        assert len(res1["pred_class_ids"]) == 2
        np.testing.assert_array_equal(res1["pred_RTs"][1], np.eye(4))
        # and the valid can in the same frame WAS posed
        assert not np.allclose(res1["pred_RTs"][0], np.eye(4))
        # frame 1's gt mug has no detection -> mAP must count it (recall
        # denominator); with one posed can its pkl still carries 2 gts
        assert len(res1["gt_class_ids"]) == 2
        # debug artifacts: one overlay PNG per frame with posed instances,
        # per-instance error lines on stdout
        pngs = globmod.glob(os.path.join(out, "debug", "*.png"))
        assert len(pngs) == 3
        dbg = capsys.readouterr().out
        assert "rot" in dbg and "deg" in dbg and "cm" in dbg
        # plots + pkl artifacts from the mAP harness
        assert os.path.isdir(os.path.join(out, "plots"))

    def test_translation_recovered_with_oracle_free_center(self, synthetic_real275):
        # even untrained, the voted center must land inside the object's
        # bounding sphere (votes concentrate around the cloud)
        import jax

        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import (
            REAL275_INTRINSICS,
            estimate_instance,
            load_category_models,
        )
        import cv2

        det_dir, img_dir, _ = synthetic_real275
        pkl = sorted(os.listdir(det_dir))[0]
        res = pickle.load(open(os.path.join(det_dir, pkl), "rb"))
        name = os.path.basename(res["image_path"])
        rgb = cv2.imread(os.path.join(img_dir, name + "_color.png"))[:, :, ::-1]
        depth = cv2.imread(os.path.join(img_dir, name + "_depth.png"), -1) / 1000.0
        models = load_category_models(None, ["can"])["can"]
        pipe = PipelineConfig(
            n_points=1024, num_pairs=2048, opt_steps=10,
        )
        out = estimate_instance(
            rgb, depth.astype(np.float32), res["pred_masks"][:, :, 0],
            REAL275_INTRINSICS, models, "can", pipe, jax.random.key(0),
            run_opt=False,
        )
        assert out is not None
        rt, scales, loss = out
        gt_t = res["gt_RTs"][0][:3, 3]
        assert np.linalg.norm(rt[:3, 3] - gt_t) < 0.25

    @pytest.mark.slow
    def test_instance_with_visual_frontend_keeps_desc_on_device(
        self, synthetic_real275
    ):
        # the visual-branch driver path: descriptors must flow crop -> ViT ->
        # ensemble as ONE device-resident tensor (the (n, 1024) host
        # round-trip costs seconds through the TPU relay)
        import jax

        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import (
            REAL275_INTRINSICS,
            estimate_instance,
            load_category_models,
        )
        from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, ViTConfig
        import cv2

        det_dir, img_dir, _ = synthetic_real275
        pkl = sorted(os.listdir(det_dir))[0]
        res = pickle.load(open(os.path.join(det_dir, pkl), "rb"))
        name = os.path.basename(res["image_path"])
        rgb = cv2.imread(os.path.join(img_dir, name + "_color.png"))[:, :, ::-1]
        depth = cv2.imread(os.path.join(img_dir, name + "_depth.png"), -1) / 1000.0
        models = load_category_models(None, ["can"])["can"]
        ext = DinoFeatureExtractor(
            cfg=ViTConfig(embed_dim=1024, depth=1, num_heads=16,
                          pretrain_grid=8),
            stride=8,
        )
        ext.init_random(hw=(256, 256))
        pipe = PipelineConfig(n_points=512, num_pairs=1024, opt_steps=5)
        out = estimate_instance(
            rgb, depth.astype(np.float32), res["pred_masks"][:, :, 0],
            REAL275_INTRINSICS, models, "can", pipe, jax.random.key(0),
            dino_extractor=ext, run_opt=False,
        )
        assert out is not None
        rt, scales, loss = out
        assert np.isfinite(rt).all() and np.isfinite(loss)


class TestBatchedFramePath:
    """dispatch_frame: one vmapped program per (category, crop) group."""

    def _load(self, synthetic_real275):
        import cv2

        det_dir, img_dir, _ = synthetic_real275
        pkl = sorted(os.listdir(det_dir))[0]
        res = pickle.load(open(os.path.join(det_dir, pkl), "rb"))
        name = os.path.basename(res["image_path"])
        rgb = cv2.imread(os.path.join(img_dir, name + "_color.png"))[:, :, ::-1]
        depth = (
            cv2.imread(os.path.join(img_dir, name + "_depth.png"), -1) / 1000.0
        ).astype(np.float32)
        return rgb, depth, res

    @pytest.mark.slow
    def test_vmapped_group_rows_match_singletons(self, synthetic_real275):
        # batch=2 program == two batch=1 programs with the same keys: the
        # vmap axis must not couple instances
        import jax
        import jax.numpy as jnp

        from cppf2_tpu.config import CATEGORIES, PipelineConfig
        from cppf2_tpu.eval.driver import (
            REAL275_INTRINSICS,
            _frame_group_fn,
            load_category_models,
        )

        rgb, depth, res = self._load(synthetic_real275)
        m0 = res["pred_masks"][:, :, 0].astype(bool)
        m1 = np.roll(m0, 40, axis=1)  # second "instance"
        models = load_category_models(None, ["can"])["can"]
        cat = CATEGORIES["can"]
        pipe = PipelineConfig(n_points=512, num_pairs=1024, opt_steps=5)

        keys = jax.random.split(jax.random.key(7), 2)
        # geo-path signature: dummy (grids, txys) broadcast via in_axes=None
        args = (models.dino_params, models.shot_params, jnp.zeros(1),
                jnp.zeros(1), jnp.asarray(depth))
        tail = (jnp.asarray(REAL275_INTRINSICS),)
        fn2 = _frame_group_fn(models, cat, pipe, False, False, True,
                              256, 8, None, 2)
        batched = jax.device_get(
            fn2(*args, jnp.asarray(np.stack([m0, m1])), *tail, keys))
        fn1 = _frame_group_fn(models, cat, pipe, False, False, True,
                              256, 8, None, 1)
        for row, (m, k) in enumerate(((m0, keys[0]), (m1, keys[1]))):
            single = jax.device_get(
                fn1(*args, jnp.asarray(m[None]), *tail, k[None]))
            for b, s in zip(batched, single):
                np.testing.assert_allclose(
                    np.asarray(b)[row], np.asarray(s)[0], atol=1e-5)

    def test_dispatch_frame_end_to_end(self, synthetic_real275):
        # 3 same-category instances -> one padded bucket-4 group, one sync;
        # results carry the instance indexing and the center sanity bound
        import jax

        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import (
            REAL275_INTRINSICS,
            PendingFrameGroup,
            dispatch_frame,
            fetch_frames,
            load_category_models,
        )

        rgb, depth, res = self._load(synthetic_real275)
        m0 = res["pred_masks"][:, :, 0].astype(bool)
        models = load_category_models(None, ["can"])
        pipe = PipelineConfig(n_points=1024, num_pairs=2048, opt_steps=5)
        dets = [("can", m0), ("can", np.roll(m0, 30, 1)), ("can", m0)]
        pend = dispatch_frame(rgb, depth, dets, REAL275_INTRINSICS, models,
                              pipe, jax.random.key(0), run_opt=False)
        assert len(pend) == 1 and isinstance(pend[0], PendingFrameGroup)
        assert pend[0].dev[0].shape[0] == 4  # bucket padding 3 -> 4
        out = fetch_frames(pend)
        assert sorted(out) == [0, 1, 2]
        gt_t = res["gt_RTs"][0][:3, 3]
        for i in (0, 2):
            rt, scales, loss = out[i]
            assert np.isfinite(rt).all()
            assert np.linalg.norm(rt[:3, 3] - gt_t) < 0.25

    def test_oversized_groups_chunk_to_buckets(self, monkeypatch):
        # 11 same-(category, tier) detections must dispatch as a max-bucket
        # (8) chunk plus a 3-padded-to-4 chunk, never compile a batch=11
        # program (the compile cache stays O(categories x tiers x buckets));
        # stub the group fn so no pose graph compiles
        import jax
        import jax.numpy as jnp

        import cppf2_tpu.eval.driver as drv
        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import REAL275_INTRINSICS, dispatch_frame

        requested = []

        def stub_group_fn(models, cat, pipe, run_opt, use_visual, use_geo,
                          crop, stride, extractor, batch):
            requested.append(batch)

            def fn(dpp, spp, vp, rgb, depth, masks, k, keys):
                z = jnp.zeros(masks.shape[0])
                return (z.astype(jnp.int32), jnp.zeros((masks.shape[0], 3)),
                        jnp.zeros((masks.shape[0], 3, 3)),
                        jnp.zeros((masks.shape[0], 3)),
                        jnp.zeros((masks.shape[0], 3)), z + 1.0, z)

            return fn

        monkeypatch.setattr(drv, "_frame_group_fn", stub_group_fn)
        mask = np.zeros((480, 640), bool)
        mask[100:160, 200:280] = True
        dets = [("can", mask)] * 11

        class Stub:
            dino_params = shot_params = None

        pend = dispatch_frame(
            np.zeros((480, 640, 3), np.uint8), np.zeros((480, 640), np.float32),
            dets, REAL275_INTRINSICS, {"can": Stub()}, PipelineConfig(),
            jax.random.key(0))
        assert requested == [8, 4]
        assert sorted(len(p.idxs) for p in pend) == [3, 8]
        assert sorted(i for p in pend for i in p.idxs) == list(range(11))

    @pytest.mark.slow
    def test_dispatch_frame_visual_smoke(self, synthetic_real275):
        # tiny ViT through the fused in-graph frontend, batch 2
        import jax

        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.eval.driver import (
            REAL275_INTRINSICS,
            dispatch_frame,
            fetch_frames,
            load_category_models,
        )
        from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, ViTConfig

        rgb, depth, res = self._load(synthetic_real275)
        m0 = res["pred_masks"][:, :, 0].astype(bool)
        models = load_category_models(None, ["can"])
        ext = DinoFeatureExtractor(
            cfg=ViTConfig(embed_dim=1024, depth=1, num_heads=16,
                          pretrain_grid=8),
            stride=8,
        )
        ext.init_random(hw=(256, 256))
        pipe = PipelineConfig(n_points=512, num_pairs=1024, opt_steps=5)
        # det 2: an all-empty mask (a plausible Mask R-CNN artifact) must be
        # rejected as None, not crash the visual crop (bbox=None regression)
        dets = [("can", m0), ("can", np.roll(m0, 30, 1)),
                ("can", np.zeros_like(m0))]
        out = fetch_frames(dispatch_frame(
            rgb, depth, dets, REAL275_INTRINSICS, models, pipe,
            jax.random.key(0), dino_extractor=ext, run_opt=False))
        assert sorted(out) == [0, 1, 2]
        for i in (0, 1):
            rt, scales, loss = out[i]
            assert np.isfinite(rt).all() and np.isfinite(loss)
        assert out[2] is None

    def test_vit_stage_batch_matches_singletons(self, synthetic_real275):
        # the frame-wide ViT stage at batch 2 == per-mask calls: neither the
        # vmapped ViT forward nor the in-graph grid split may couple
        # instances
        import jax.numpy as jnp

        from cppf2_tpu.models.dinov2 import (
            DinoFeatureExtractor,
            ViTConfig,
            bbox_crop_token_grid,
        )
        from cppf2_tpu.eval.driver import _vit_stage_fn

        rgb, depth, res = self._load(synthetic_real275)
        m0 = res["pred_masks"][:, :, 0].astype(bool)
        m1 = np.roll(m0, 30, axis=1)
        ext = DinoFeatureExtractor(
            cfg=ViTConfig(embed_dim=64, depth=1, num_heads=4,
                          pretrain_grid=8),
            stride=8,
        )
        ext.init_random(hw=(256, 256))
        vfn = _vit_stage_fn(ext, (1, 1))
        (g0, t0), (g1, t1) = vfn(
            ext.params, jnp.asarray(rgb.astype(np.uint8)),
            jnp.asarray(np.stack([m0, m1])))
        rgb_f = jnp.asarray(rgb.astype(np.float32) / 255.0)
        for m, g, t in ((m0, g0, t0), (m1, g1, t1)):
            want_g, want_t = bbox_crop_token_grid(
                ext.model, ext.params, rgb_f, jnp.asarray(m),
                out_size=ext.out_size, stride=ext.stride)
            np.testing.assert_allclose(np.asarray(t)[0], np.asarray(want_t),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(g)[0], np.asarray(want_g),
                                       rtol=2e-4, atol=2e-4)

    @pytest.mark.slow
    def test_vit_multi_signature_cap_falls_back(self, synthetic_real275,
                                                monkeypatch):
        # past the multi-chunk compile budget, a novel pack signature must
        # fall back to per-chunk (b,) ViT programs and still produce poses
        import jax

        import cppf2_tpu.eval.driver as drv
        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, ViTConfig

        rgb, depth, res = self._load(synthetic_real275)
        m0 = res["pred_masks"][:, :, 0].astype(bool)
        m1 = np.roll(m0, 30, axis=1)
        models = drv.load_category_models(None, ["can", "mug"])
        ext = DinoFeatureExtractor(
            cfg=ViTConfig(embed_dim=1024, depth=1, num_heads=16,
                          pretrain_grid=8),
            stride=8,
        )
        ext.init_random(hw=(256, 256))
        pipe = PipelineConfig(n_points=512, num_pairs=1024, opt_steps=5)
        monkeypatch.setattr(drv, "_VIT_STAGE_MULTI_CAP", 0)
        before = {k for k in drv._VIT_STAGE_CACHE if len(k[3]) > 1}
        out = drv.fetch_frames(drv.dispatch_frame(
            rgb, depth, [("can", m0), ("mug", m1)], drv.REAL275_INTRINSICS,
            models, pipe, jax.random.key(0), dino_extractor=ext,
            run_opt=False))
        after = {k for k in drv._VIT_STAGE_CACHE if len(k[3]) > 1}
        assert after == before  # no new multi-chunk program compiled
        for i in (0, 1):
            rt, scales, loss = out[i]
            assert np.isfinite(rt).all() and np.isfinite(loss)

    @pytest.mark.slow
    def test_vit_multi_budget_not_consumed_by_reuse(self, synthetic_real275,
                                                    monkeypatch):
        # reusing a CACHED multi-chunk signature must not count against
        # _VIT_STAGE_MULTI_CAP: with cap=2 and one signature cached, any
        # number of reuses must still leave room for one more novel
        # signature to compile
        import jax

        import cppf2_tpu.eval.driver as drv
        from cppf2_tpu.config import PipelineConfig
        from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, ViTConfig

        rgb, depth, res = self._load(synthetic_real275)
        m0 = res["pred_masks"][:, :, 0].astype(bool)
        m1 = np.roll(m0, 30, axis=1)
        m2 = np.roll(m0, -30, axis=1)
        models = drv.load_category_models(None, ["can", "mug"])
        ext = DinoFeatureExtractor(
            cfg=ViTConfig(embed_dim=1024, depth=1, num_heads=16,
                          pretrain_grid=8),
            stride=8,
        )
        ext.init_random(hw=(256, 256))
        pipe = PipelineConfig(n_points=512, num_pairs=1024, opt_steps=5)
        monkeypatch.setattr(drv, "_VIT_STAGE_MULTI_CAP", 2)
        drv._VIT_STAGE_CACHE.clear()

        def multis():
            return {k[3] for k in drv._VIT_STAGE_CACHE if len(k[3]) > 1}

        two = [("can", m0), ("mug", m1)]          # signature (1, 1)
        drv.fetch_frames(drv.dispatch_frame(
            rgb, depth, two, drv.REAL275_INTRINSICS, models, pipe,
            jax.random.key(0), dino_extractor=ext, run_opt=False))
        assert multis() == {(1, 1)}
        # reuse the cached signature several times (the buggy accounting
        # incremented the budget on every reuse)
        for s in range(3):
            drv.fetch_frames(drv.dispatch_frame(
                rgb, depth, two, drv.REAL275_INTRINSICS, models, pipe,
                jax.random.key(1 + s), dino_extractor=ext, run_opt=False))
        assert multis() == {(1, 1)}
        # a novel multi signature must still fit under cap=2
        three = [("can", m0), ("can", m2), ("mug", m1)]  # signature (2, 1)
        out = drv.fetch_frames(drv.dispatch_frame(
            rgb, depth, three, drv.REAL275_INTRINSICS, models, pipe,
            jax.random.key(9), dino_extractor=ext, run_opt=False))
        assert multis() == {(1, 1), (2, 1)}
        assert len(out) == 3

    def test_pack_vit_chunks(self):
        from cppf2_tpu.eval.driver import _pack_vit_chunks

        # a typical mixed frame (two groups, batches 2+1) -> ONE ViT dispatch
        assert _pack_vit_chunks([2, 1], 8) == [([0, 1], (2, 1))]
        # capacity respected, first-fit-decreasing, every chunk placed once
        packs = _pack_vit_chunks([4, 8, 2, 4], 8)
        placed = sorted(ci for ids, _ in packs for ci in ids)
        assert placed == [0, 1, 2, 3]
        for ids, sizes in packs:
            assert sum(sizes) <= 8
            assert tuple(sizes) == tuple(sorted(sizes, reverse=True))
        assert len(packs) == 3  # (8,), (4, 4), (2,)
        # singleton fits
        assert _pack_vit_chunks([1], 8) == [([0], (1,))]


@pytest.mark.slow
class TestCustomTrainingExample:
    def test_quick_run(self):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
        from custom_training import run

        r = run(
            "can", steps=120, n_points=384, tuples_per_step=1024,
            num_pairs=2048, pool_frames=4, render_hw=(240, 320),
            progress=lambda *_: None,
        )
        # 120 steps is far from converged; assert the loop learns and the
        # inference path produces a bounded pose
        assert r["loss_last"] < r["loss_first"]
        assert r["trans_err_cm"] < 40
