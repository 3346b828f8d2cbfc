"""Smoke tests for the training driver (both branches, tiny scale) and the
converters' REAL275 output schema on synthetic PhoCAL-format input."""

import json
import os
import pickle

import numpy as np
import pytest

from cppf2_tpu.config import TrainConfig


class TestTrainDriver:
    def _cfg(self):
        return TrainConfig(
            max_epochs=1, steps_per_epoch=6, tuples_per_step=256, n_points=512,
        )

    @pytest.mark.slow
    def test_shot_branch_trains_and_checkpoints(self, tmp_path):
        from cppf2_tpu.train.driver import train_category

        msgs = []
        state = train_category(
            "can", "shot", self._cfg(), str(tmp_path / "ck"),
            n_points=512, frames_in_pool=4, render_hw=(240, 320),
            log_every=2, ckpt_every_epochs=1, progress=msgs.append,
        )
        assert int(state.step) == 6
        assert os.path.exists(tmp_path / "ck" / "last")
        assert os.path.exists(tmp_path / "ck" / "metrics.jsonl")
        # resume continues from the checkpoint
        state2 = train_category(
            "can", "shot", self._cfg(), str(tmp_path / "ck"),
            n_points=512, frames_in_pool=4, render_hw=(240, 320),
            log_every=2, ckpt_every_epochs=1, progress=msgs.append,
        )
        assert int(state2.step) == 6  # already at max_epochs -> no extra steps

    def test_dino_branch_trains(self, tmp_path):
        from cppf2_tpu.models.dinov2 import DinoFeatureExtractor, ViTConfig
        from cppf2_tpu.train.driver import train_category

        tiny = ViTConfig(embed_dim=64, depth=1, num_heads=4)
        ex = DinoFeatureExtractor(cfg=tiny, stride=8)
        ex.init_random(hw=(256, 256))
        state = train_category(
            "bowl", "dino", self._cfg(), None,
            n_points=256, frames_in_pool=3, render_hw=(240, 320),
            dino_extractor=ex, progress=lambda *_: None,
        )
        assert int(state.step) == 6


class TestConverters:
    def test_phocal_schema(self, tmp_path, rng):
        import cv2

        from cppf2_tpu.data.converters import convert_phocal

        root = tmp_path / "PhoCAL_release"
        seq = root / "sequence_1"
        for sub in ("rgb", "depth", "mask"):
            (seq / sub).mkdir(parents=True)
        (root / "class_obj_taxonomy.json").write_text(json.dumps({
            "0": {"class_name": "bottle", "objs": {"0": "bottle_0"},
                   "scales": {"0": [0.08, 0.07, 0.2]}},
        }))
        json.dump(
            {"rgb": {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0,
                      "depth_scale": 1000.0}},
            open(seq / "scene_camera.json", "w"),
        )
        np.savez(seq / "train_test_split.npz", test_idxs=np.array([0]))
        rt = {"cam_R_m2c": np.eye(3).tolist(), "cam_t_m2c": [0, 0, 0.8],
              "class_id": 0, "inst_id": 0}
        json.dump({"0": [rt]}, open(seq / "rgb_scene_gt.json", "w"))
        img = np.zeros((48, 64, 3), np.uint8)
        depth = np.full((48, 64), 800, np.uint16)
        mask = np.ones((48, 64), np.uint8)
        cv2.imwrite(str(seq / "rgb" / "000000.png"), img)
        cv2.imwrite(str(seq / "depth" / "000000.png"), depth)
        cv2.imwrite(str(seq / "mask" / "000000.png"), mask)

        n = convert_phocal(str(root))
        assert n == 1
        out = root / "real275_fmt" / "sequence_1"
        assert (out / "000000_color.png").exists()
        assert (out / "camK.npy").exists()
        res = pickle.load(open(out / "000000.pkl", "rb"))
        assert res["gt_class_ids"] == [1]
        rt_out = np.asarray(res["gt_RTs"][0])
        # symmetric class: z-up -> y-up axis swap applied
        np.testing.assert_allclose(rt_out[:3, 1], [0, 0, 1], atol=1e-9)
        np.testing.assert_allclose(res["gt_scales"][0], [0.08, 0.2, 0.07])
        meta = (out / "000000_meta.txt").read_text().strip().split()
        assert meta[1] == "1"


class TestWild6DConverter:
    def _frame_files(self, base, frame, rng):
        import cv2

        (base / "images").mkdir(parents=True, exist_ok=True)
        img = base / "images" / f"{frame}.jpg"
        cv2.imwrite(str(img), rng.integers(0, 255, (48, 64, 3), np.uint8))
        cv2.imwrite(str(base / "images" / f"{frame}-depth.png"),
                    np.full((48, 64), 800, np.uint16))
        m = np.zeros((48, 64), np.uint8)
        m[10:30, 20:50] = 7  # any nonzero instance id -> binary mask
        cv2.imwrite(str(base / "images" / f"{frame}-mask.png"), m)

    def test_wild6d_schema(self, tmp_path, rng):
        """Mirror of the PhoCAL schema test for the Wild6D layout
        (reference: data/wild6d_convert2real275.py:20-108): pkl_annotations +
        test_list + per-object image dirs in, REAL275 tree out."""
        import cv2

        from cppf2_tpu.data.converters import convert_wild6d

        root = tmp_path / "wild6d"
        obj = root / "mug" / "seq1" / "obj1"
        # frame 4 is in the test list; frame 7 is annotated but NOT listed;
        # frame 9 is listed + annotated but its depth file is missing
        self._frame_files(obj, 4, rng)
        self._frame_files(obj, 7, rng)
        self._frame_files(obj, 9, rng)
        os.remove(obj / "images" / "9-depth.png")
        k = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        (obj / "metadata").write_text(json.dumps({"K": k.T.flatten().tolist()}))
        (root / "test_list_mug.txt").write_text(
            "mug/seq1/obj1/images/4.jpg\nmug/seq1/obj1/images/9.jpg\n"
        )
        rot = np.array([[0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]])
        anns = {"annotations": [
            # 'cup' class name in annotations maps to mug (reference
            # wild6d_convert2real275.py:25-27); zero-padded frame ids in the
            # annotation name match unpadded test-list/image names via int()
            {"name": "cup/seq1/obj1/0004", "rotation": rot,
             "translation": np.array([0.1, -0.05, 0.9]),
             "size": np.array([0.09, 0.08, 0.11])},
            {"name": "cup/seq1/obj1/0007", "rotation": np.eye(3),
             "translation": np.zeros(3), "size": np.ones(3)},
            {"name": "cup/seq1/obj1/0009", "rotation": np.eye(3),
             "translation": np.zeros(3), "size": np.ones(3)},
        ]}
        (root / "pkl_annotations" / "mug").mkdir(parents=True)
        with open(root / "pkl_annotations" / "mug" / "mug_seq1.pkl", "wb") as f:
            pickle.dump(anns, f)

        n = convert_wild6d(str(root))
        assert n == 1  # frame 7 unlisted, frame 9 missing depth

        out = root / "real275_fmt" / "mug" / "seq1" / "obj1"
        assert os.path.islink(out / "0004_color.png")
        assert os.path.islink(out / "0004_depth.png")
        mask = cv2.imread(str(out / "0004_mask.png"), -1)
        assert set(np.unique(mask)) == {0, 1}  # binarized instance mask
        assert (mask[15, 30] == 1) and (mask[0, 0] == 0)
        np.testing.assert_allclose(np.load(out / "camK.npy"), k)
        meta = (out / "0004_meta.txt").read_text().split()
        assert meta[1] == "6" and meta[2] == "mug"
        res = pickle.load(open(out / "0004.pkl", "rb"))
        assert res["gt_class_ids"] == [6]
        assert res["gt_handle_visibility"] == [1]
        rt = np.asarray(res["gt_RTs"][0])
        np.testing.assert_allclose(rt[:3, :3], rot)
        np.testing.assert_allclose(rt[:3, 3], [0.1, -0.05, 0.9])
        np.testing.assert_allclose(res["gt_scales"][0], [0.09, 0.08, 0.11])
        assert not (out / "0007.pkl").exists()
        assert not (out / "0009.pkl").exists()


class TestNocsData:
    def test_process_data(self, tmp_path):
        from cppf2_tpu.eval.nocs_data import process_data

        mask = np.full((20, 30), 255, np.uint8)
        mask[5:10, 5:10] = 1
        mask[12:18, 20:28] = 2
        coord = np.zeros((20, 30, 3), np.uint8)
        coord[5:10, 5:10] = [100, 150, 200]
        meta = tmp_path / "meta.txt"
        meta.write_text("1 6 mug_model\n2 4 can_model extra\n")
        masks, coords, cls, scales = process_data(
            mask, coord, {1: 6, 2: 4}, str(meta)
        )
        assert masks.shape == (20, 30, 2)
        assert list(cls) == [6, 4]
        assert masks[7, 7, 0] == 1 and masks[14, 25, 1] == 1
        # z channel flipped: 1 - 200/255
        np.testing.assert_allclose(coords[7, 7, 0, 2], 1 - 200 / 255.0, atol=1e-6)


class TestRecordReplayTraining:
    def test_trains_from_records(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from cppf2_tpu.config import CATEGORIES, TrainConfig
        from cppf2_tpu.data.records import dump_frames
        from cppf2_tpu.data.synthetic import SyntheticFrameGenerator
        from cppf2_tpu.train.driver import train_category

        gen = SyntheticFrameGenerator(
            CATEGORIES["can"], n_max=512, surface_samples=40000,
            height=240, width=320, shot_k=16, seed=11,
        )
        frames = [gen.next_frame() for _ in range(3)]
        path = str(tmp_path / "can.rec")
        dump_frames(path, frames, n_points=512)

        cfg = TrainConfig(max_epochs=1, steps_per_epoch=4, tuples_per_step=128,
                          n_points=512)
        state = train_category(
            "can", "shot", cfg, None, n_points=512, frames_in_pool=3,
            records=path, progress=lambda *_: None,
        )
        assert int(state.step) == 4
