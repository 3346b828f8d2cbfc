"""Frontend tests: crop transform math and the preprocess_frame graph."""

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.data.render import NOCS_INTRINSICS
from cppf2_tpu.infer.frontend import (
    mask_bbox,
    preprocess_frame,
    resize_crop,
    resize_crop_transform,
)


class TestResizeCrop:
    def test_transform_maps_crop_center_to_bbox_center(self):
        bbox = (40, 60, 140, 120)
        t = resize_crop_transform(bbox, out_size=256)
        center_crop = t @ np.array([128, 128, 1.0])
        np.testing.assert_allclose(center_crop[:2], [90, 90], atol=1e-6)

    def test_transform_roundtrip(self, rng):
        bbox = (30, 10, 200, 180)
        t = resize_crop_transform(bbox, out_size=256)
        pts = rng.uniform(0, 255, size=(10, 2))
        img_pts = (t @ np.concatenate([pts, np.ones((10, 1))], -1).T).T[:, :2]
        back = (np.linalg.inv(t) @ np.concatenate([img_pts, np.ones((10, 1))], -1).T).T[:, :2]
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_crop_pixels_match_source(self, rng):
        img = (rng.uniform(0, 255, size=(120, 160, 3))).astype(np.uint8)
        bbox = (40, 20, 104, 84)  # square 64x64
        crop, t = resize_crop(img, bbox=bbox, out_size=64)
        # square bbox at the same size -> identity sampling of the region
        np.testing.assert_allclose(
            crop, img[20:84, 40:104].astype(np.float32), atol=1.0
        )

    def test_mask_bbox(self):
        m = np.zeros((50, 60), bool)
        m[10:20, 30:45] = True
        assert mask_bbox(m) == (30, 10, 45, 20)
        assert mask_bbox(np.zeros((5, 5), bool)) is None


class TestPreprocessFrame:
    def test_end_to_end(self, rng):
        h, w = 120, 160
        k = NOCS_INTRINSICS.copy()
        k[0] *= w / 640.0
        k[1] *= h / 480.0
        depth = np.zeros((h, w), np.float32)
        depth[40:80, 60:110] = rng.uniform(0.8, 0.82, size=(40, 50))
        mask = depth > 0
        fi = preprocess_frame(
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(k),
            jax.random.key(0), res=2e-3, n_max=2048, shot_k=16,
        )
        count = int(fi.count)
        assert count > 100
        pc = np.asarray(fi.pc)
        valid = np.asarray(fi.valid)
        assert valid.sum() == min(count, 2048)
        # depth preserved through backprojection
        np.testing.assert_allclose(pc[valid][:, 2], 0.81, atol=0.02)
        # pixels within the mask
        pix = np.asarray(fi.pixel_yx)[valid]
        assert pix[:, 0].min() >= 40 and pix[:, 0].max() < 80
        assert np.all(np.isfinite(np.asarray(fi.shot)))


class TestDilateMask:
    def test_fills_and_grows(self):
        from cppf2_tpu.infer.frontend import dilate_mask

        m = np.zeros((40, 40), bool)
        m[10:20, 10:12] = True
        m[10:20, 18:20] = True  # two strips; hull fills between
        out = dilate_mask(m, size=3)
        assert out[15, 15]          # hull-filled interior
        assert out.sum() > m.sum()  # dilation grew the mask

    def test_largest_component(self):
        from cppf2_tpu.infer.frontend import dilate_mask

        m = np.zeros((40, 40), bool)
        m[5:25, 5:25] = True
        m[35:37, 35:37] = True
        out = dilate_mask(m, size=3, largest_comp=True)
        assert not out[35, 35]


class TestVizOverlay:
    def test_draw_pose_overlay(self, rng):
        from cppf2_tpu.utils.viz import draw_pose_overlay

        rgb = np.zeros((120, 160, 3), np.uint8)
        rt = np.eye(4)
        rt[:3, :3] *= 0.15   # scale-folded rotation, NOCS convention
        rt[:3, 3] = [0, 0, 1.0]
        K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
        out = draw_pose_overlay(rgb, rt, np.array([0.6, 1.0, 0.6]), K)
        assert out.shape == rgb.shape
        assert out.sum() > 0  # something was drawn


class TestPreprocessCrop:
    def test_crop_window_equivalence(self, rng):
        # crop=256 around the mask must find the same voxel set (equal count)
        # with metric-correct backprojection (equal bbox) and image-frame pixels
        import jax
        import jax.numpy as jnp

        from cppf2_tpu.infer.frontend import preprocess_frame

        depth = np.zeros((480, 640), np.float32)
        depth[200:280, 300:400] = 0.8
        depth += rng.uniform(0, 1e-3, depth.shape).astype(np.float32)
        mask = depth > 0.5
        k = jnp.asarray(
            [[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1.0]], jnp.float32
        )
        a = preprocess_frame(
            jnp.asarray(depth), jnp.asarray(mask), k, jax.random.key(0),
            n_max=16384,
        )
        b = preprocess_frame(
            jnp.asarray(depth), jnp.asarray(mask), k, jax.random.key(0),
            n_max=16384, crop=256,
        )
        assert int(a.count) == int(b.count)
        pa = np.asarray(a.pc)[np.asarray(a.valid)]
        pb = np.asarray(b.pc)[np.asarray(b.valid)]
        np.testing.assert_allclose(pa.min(0), pb.min(0), atol=3e-3)
        np.testing.assert_allclose(pa.max(0), pb.max(0), atol=3e-3)
        pxa = np.asarray(a.pixel_yx)[np.asarray(a.valid)]
        pxb = np.asarray(b.pixel_yx)[np.asarray(b.valid)]
        assert pxa.min(0).tolist() == pxb.min(0).tolist()
        assert pxa.max(0).tolist() == pxb.max(0).tolist()

    def test_crop_skewed_mask_keeps_all_pixels(self, rng):
        # regression: a COM-centered window truncated masks whose depth mass
        # is concentrated away from the bbox center; the window is now
        # bbox-centered and auto_crop leaves a rounding margin
        import jax
        import jax.numpy as jnp

        from cppf2_tpu.infer.frontend import auto_crop, preprocess_frame

        depth = np.zeros((480, 640), np.float32)
        depth[100:140, 300:420] = 0.8        # dense top
        depth[140:352:6, 310:316] = 0.8      # sparse tail
        mask = depth > 0
        c = auto_crop(mask)
        assert c == 256
        k = jnp.asarray([[591.0, 0, 322.0], [0, 590.0, 244.0], [0, 0, 1.0]])
        a = preprocess_frame(jnp.asarray(depth), jnp.asarray(mask), k,
                             jax.random.key(0), n_max=16384)
        b = preprocess_frame(jnp.asarray(depth), jnp.asarray(mask), k,
                             jax.random.key(0), n_max=16384, crop=c)
        assert int(a.count) == int(b.count)
