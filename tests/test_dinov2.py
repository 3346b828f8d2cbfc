"""DINOv2 backbone tests: forward shapes, grid-sample parity vs torch,
checkpoint porting structural congruence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf2_tpu.models.dinov2 import (
    DinoFeatureExtractor,
    DinoViT,
    ViTConfig,
    interpolate_features,
    port_torch_state_dict,
)

TINY = ViTConfig(embed_dim=64, depth=2, num_heads=4, pretrain_grid=37)


class TestViT:
    def test_forward_shapes(self):
        model = DinoViT(TINY)
        img = jnp.zeros((56, 56, 3))  # 4x4 grid of 14px patches
        params = model.init(jax.random.key(0), img)
        out = model.apply(params, img)
        assert out.shape == (4, 4, 64)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_pos_embed_interpolation(self):
        model = DinoViT(TINY)
        img = jnp.zeros((56, 56, 3))
        params = model.init(jax.random.key(0), img)
        # different input size reuses the same params (pos embed resized)
        out = model.apply(params, jnp.zeros((84, 70, 3)))
        assert out.shape == (6, 5, 64)


class TestInterpolateFeatures:
    def test_matches_torch_grid_sample(self, rng):
        import torch
        import torch.nn.functional as F

        gh, gw, d = 8, 10, 16
        h, w = 32, 40
        stride = 4
        grid = rng.normal(size=(gh, gw, d)).astype(np.float32)
        pts = rng.uniform(0, [w - 1, h - 1], size=(50, 2)).astype(np.float32)

        got = np.asarray(
            interpolate_features(
                jnp.asarray(grid), jnp.asarray(pts), (h, w), stride, normalize=True
            )
        )

        # reference semantics (dataset.py:40-59): keypoints normalized by the
        # descriptor grid size times the stride (== the crop image size)
        desc = torch.from_numpy(grid).permute(2, 0, 1)[None]  # 1, D, gh, gw
        kp2 = torch.from_numpy(
            np.stack(
                [
                    ((pts[:, 0] + 0.5) / gw / stride) * 2 - 1,
                    ((pts[:, 1] + 0.5) / gh / stride) * 2 - 1,
                ],
                axis=-1,
            ).astype(np.float32)
        )
        sampled = F.grid_sample(
            desc, kp2[None, None], align_corners=False, mode="bilinear"
        )[0, :, 0].T
        want = F.normalize(sampled, dim=-1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_out_of_range_zero(self, rng):
        grid = rng.normal(size=(4, 4, 8)).astype(np.float32)
        pts = np.array([[-100.0, -100.0]], np.float32)
        out = np.asarray(
            interpolate_features(jnp.asarray(grid), jnp.asarray(pts), (16, 16), 4, False)
        )
        np.testing.assert_allclose(out, 0.0)

    def test_onehot_impl_matches_gather(self, rng):
        """The MXU one-hot-matmul sampler must agree with the gather taps
        (to bf16 operand precision) including out-of-range zero padding."""
        gh, gw, d = 8, 10, 32
        h, w = 32, 40
        grid = rng.normal(size=(gh, gw, d)).astype(np.float32)
        # mix of interior, edge, and far out-of-range points
        pts = np.concatenate(
            [
                rng.uniform(0, [w - 1, h - 1], size=(64, 2)),
                np.array([[-0.49, -0.49], [w - 0.51, h - 0.51],
                          [-100.0, 5.0], [5.0, 1000.0]]),
            ]
        ).astype(np.float32)
        for normalize in (False, True):
            want = np.asarray(interpolate_features(
                jnp.asarray(grid), jnp.asarray(pts), (h, w), 4,
                normalize=normalize, impl="gather"))
            got = np.asarray(interpolate_features(
                jnp.asarray(grid), jnp.asarray(pts), (h, w), 4,
                normalize=normalize, impl="onehot"))
            np.testing.assert_allclose(got, want, atol=2e-2)
            # normalized interior rows should agree to ~bf16 rounding
            np.testing.assert_allclose(got[:64], want[:64], atol=2e-2, rtol=2e-2)


class TestPorting:
    def test_state_dict_port_congruent(self, rng):
        cfg = TINY
        d, depth = cfg.embed_dim, cfg.depth
        hid = int(d * cfg.mlp_ratio)
        g = cfg.pretrain_grid
        sd = {
            "patch_embed.proj.weight": rng.normal(size=(d, 3, 14, 14)).astype(np.float32),
            "patch_embed.proj.bias": rng.normal(size=(d,)).astype(np.float32),
            "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
            "pos_embed": rng.normal(size=(1, 1 + g * g, d)).astype(np.float32),
            "norm.weight": np.ones(d, np.float32),
            "norm.bias": np.zeros(d, np.float32),
        }
        for i in range(depth):
            p = f"blocks.{i}."
            sd |= {
                p + "norm1.weight": np.ones(d, np.float32),
                p + "norm1.bias": np.zeros(d, np.float32),
                p + "norm2.weight": np.ones(d, np.float32),
                p + "norm2.bias": np.zeros(d, np.float32),
                p + "ls1.gamma": np.full(d, 1e-5, np.float32),
                p + "ls2.gamma": np.full(d, 1e-5, np.float32),
                p + "attn.qkv.weight": rng.normal(size=(3 * d, d)).astype(np.float32),
                p + "attn.qkv.bias": np.zeros(3 * d, np.float32),
                p + "attn.proj.weight": rng.normal(size=(d, d)).astype(np.float32),
                p + "attn.proj.bias": np.zeros(d, np.float32),
                p + "mlp.fc1.weight": rng.normal(size=(hid, d)).astype(np.float32),
                p + "mlp.fc1.bias": np.zeros(hid, np.float32),
                p + "mlp.fc2.weight": rng.normal(size=(d, hid)).astype(np.float32),
                p + "mlp.fc2.bias": np.zeros(d, np.float32),
            }
        ported = port_torch_state_dict(sd, cfg)

        model = DinoViT(cfg)
        img = jnp.zeros((56, 56, 3))
        ref = model.init(jax.random.key(0), img)
        # identical treedef and shapes
        ref_shapes = jax.tree.map(lambda x: x.shape, ref)
        got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, ported)
        assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
        assert jax.tree.all(jax.tree.map(lambda a, b: a == b, ref_shapes, got_shapes))
        # the ported params actually run
        out = model.apply(ported, img)
        assert out.shape == (4, 4, cfg.embed_dim)
        assert np.all(np.isfinite(np.asarray(out)))


class TestExtractor:
    def test_end_to_end(self, rng):
        ex = DinoFeatureExtractor(cfg=TINY, stride=4)
        ex.init_random(hw=(64, 64))
        img = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        pts = jnp.asarray(rng.uniform(5, 55, size=(20, 2)).astype(np.float32))
        feats = np.asarray(ex(img, pts))
        assert feats.shape == (20, TINY.embed_dim)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-4)


class TestChunkedAttention:
    def test_matches_hbm_attention(self, rng):
        # flash-style online-softmax scan must reproduce the materialized
        # path exactly in f32, including the padded final key block
        from cppf2_tpu.models.dinov2 import DinoViT, ViTConfig

        kw = dict(embed_dim=64, depth=2, num_heads=4, pretrain_grid=8,
                  compute_dtype="float32")
        img = jnp.asarray(rng.uniform(0, 1, (70, 70, 3)).astype(np.float32))
        m_h = DinoViT(ViTConfig(attn_impl="hbm", **kw))
        m_c = DinoViT(ViTConfig(attn_impl="chunked", attn_chunk=7, **kw))
        p = m_h.init(jax.random.key(0), img)
        np.testing.assert_allclose(
            np.asarray(m_h.apply(p, img)), np.asarray(m_c.apply(p, img)),
            atol=1e-5,
        )

    def test_pallas_attention_matches_hbm(self, rng):
        # fused VMEM kernel (interpret mode on CPU) vs the materialized path
        from cppf2_tpu.models.dinov2 import DinoViT, ViTConfig

        kw = dict(embed_dim=64, depth=2, num_heads=4, pretrain_grid=8,
                  compute_dtype="float32")
        img = jnp.asarray(rng.uniform(0, 1, (70, 70, 3)).astype(np.float32))
        m_h = DinoViT(ViTConfig(attn_impl="hbm", **kw))
        m_p = DinoViT(ViTConfig(attn_impl="pallas", **kw))
        p = m_h.init(jax.random.key(0), img)
        np.testing.assert_allclose(
            np.asarray(m_h.apply(p, img)), np.asarray(m_p.apply(p, img)),
            atol=5e-2,  # kernel computes in bf16 q/k/v
        )
        # auto block (attn_block_q=0): 128-multiple stack pad, dividing block
        m_a = DinoViT(ViTConfig(attn_impl="pallas", attn_block_q=0, **kw))
        np.testing.assert_allclose(
            np.asarray(m_h.apply(p, img)), np.asarray(m_a.apply(p, img)),
            atol=5e-2,
        )

    def test_resize_matmul_matches_jax_image(self, rng):
        from cppf2_tpu.models.dinov2 import resize_bilinear_matmul

        img = jnp.asarray(rng.uniform(0, 1, (64, 48, 3)).astype(np.float32))
        want = np.asarray(jax.image.resize(img, (112, 84, 3), method="bilinear"))
        got = np.asarray(resize_bilinear_matmul(img, 112, 84))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_auto_block_q(self):
        from cppf2_tpu.ops.pallas_attention import auto_block_q

        assert auto_block_q(1152) == 384   # stride-8 crop: 1025 -> 1152
        # stride-4 crop (4097 -> 4224): 384 divides but its (384, 4224) f32
        # logits+exp buffers need ~13 MB of VMEM — over the cap, so the
        # safe 128 block wins
        assert auto_block_q(4224) == 128
        assert auto_block_q(1024) == 512
        assert auto_block_q(1280) == 256
        assert auto_block_q(100) == 128    # nothing divides -> kernel pads


class TestInt8Quant:
    def test_quantized_forward_close_to_f32(self, rng):
        """W8A8 linears (per-channel weight x per-token activation scales)
        stay close to the f32 forward, and the quantized tree really is
        int8 (kernel) + qscale."""
        from cppf2_tpu.models.dinov2 import quantize_vit_params

        kw = dict(embed_dim=64, depth=2, num_heads=4, pretrain_grid=8,
                  compute_dtype="float32")
        img = jnp.asarray(rng.uniform(0, 1, (70, 70, 3)).astype(np.float32))
        cfg_f = ViTConfig(attn_impl="hbm", **kw)
        cfg_q = ViTConfig(attn_impl="hbm", quant="int8", **kw)
        m_f = DinoViT(cfg_f)
        m_q = DinoViT(cfg_q)
        p_q = m_q.init(jax.random.key(0), img)
        # strip qscale -> the same weights drive the f32 reference
        import flax

        flat = flax.traverse_util.flatten_dict(p_q["params"])
        p_f = {
            "params": flax.traverse_util.unflatten_dict(
                {k: v for k, v in flat.items() if k[-1] != "qscale"}
            )
        }
        ref = np.asarray(m_f.apply(p_f, img))

        # pre-quant params run the f32 fallback path: exact match
        pre = np.asarray(m_q.apply(p_q, img))
        np.testing.assert_allclose(pre, ref, atol=1e-5)

        qp = quantize_vit_params(p_q, cfg_q)
        blk = qp["params"]["blocks"]["attn"]["qkv"]
        assert blk["kernel"].dtype == np.int8
        assert blk["qscale"].shape == (cfg_q.depth, 3 * 64)
        out = np.asarray(m_q.apply(jax.tree.map(jnp.asarray, qp), img))
        cos = np.sum(out * ref, -1) / np.maximum(
            np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1), 1e-12
        )
        assert cos.min() > 0.999, f"int8 forward diverged: min cos {cos.min()}"

    def test_extractor_auto_quantizes(self, rng):
        cfg = ViTConfig(embed_dim=64, depth=2, num_heads=4, pretrain_grid=8,
                        quant="int8")
        ex = DinoFeatureExtractor(cfg=cfg, stride=4)
        ex.init_random(hw=(64, 64))
        k = ex.params["params"]["blocks"]["mlp_fc1"]["kernel"]
        assert jnp.dtype(k.dtype) == jnp.int8
        img = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        pts = jnp.asarray(rng.uniform(5, 55, size=(12, 2)).astype(np.float32))
        feats = np.asarray(ex(img, pts))
        assert feats.shape == (12, 64) and np.isfinite(feats).all()


class TestBboxCropDescriptors:
    """The in-graph visual frontend must reproduce the host path's
    bbox-rescale convention (frontend.resize_crop + DinoFeatureExtractor) —
    the convention every shipped branch checkpoint was trained on
    (train/driver.py::_frame_descriptors)."""

    def test_hat_matrix_exact_interpolation(self, rng):
        from cppf2_tpu.models.dinov2 import _hat_sample_matrix

        sig = rng.normal(size=37).astype(np.float32)
        coords = rng.uniform(0, 36, size=50).astype(np.float32)
        w = np.asarray(_hat_sample_matrix(jnp.asarray(coords), 37))
        got = w @ sig
        want = np.interp(coords, np.arange(37), sig)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # out-of-range coords lose mass toward the zero border
        w_edge = np.asarray(_hat_sample_matrix(jnp.asarray([-0.5, 36.5]), 37))
        np.testing.assert_allclose(w_edge.sum(-1), [0.5, 0.5], atol=1e-6)

    def test_matches_host_resize_crop_path(self, rng):
        from cppf2_tpu.infer.frontend import mask_bbox, resize_crop
        from cppf2_tpu.models.dinov2 import bbox_crop_descriptors

        h, w = 240, 320
        # smooth image: cv2.warpAffine quantizes bilinear weights to 1/32,
        # so a white-noise image would amplify the crop delta for free
        base = rng.uniform(0, 1, (h // 8, w // 8, 3)).astype(np.float32)
        rgb = np.asarray(jax.image.resize(base, (h, w, 3), "bilinear"))
        mask = np.zeros((h, w), bool)
        mask[60:151, 110:229] = True
        ys, xs = np.nonzero(mask)
        sel = rng.integers(0, len(ys), 64)
        pixel_yx = np.stack([ys[sel], xs[sel]], -1).astype(np.int32)

        ext = DinoFeatureExtractor(cfg=TINY, stride=8)
        ext.init_random(hw=(256, 256))

        # host path, as dispatch_instance runs it (eval/driver.py:256-266)
        rgb_masked = np.where(mask[..., None], rgb, 0)
        crop, t = resize_crop(rgb_masked, bbox=mask_bbox(mask), out_size=256)
        kp = pixel_yx[:, ::-1].astype(np.float64)
        kp_local = (
            np.linalg.inv(t)
            @ np.concatenate([kp, np.ones((len(kp), 1))], -1).T
        ).T[:, :2]
        want = np.asarray(
            ext(jnp.asarray(crop), jnp.asarray(kp_local.astype(np.float32))))

        got = np.asarray(bbox_crop_descriptors(
            ext.model, ext.params, jnp.asarray(rgb), jnp.asarray(mask),
            jnp.asarray(pixel_yx), stride=8, interp_impl=ext.interp_impl))

        assert got.shape == want.shape == (64, TINY.embed_dim)
        cos = np.sum(got * want, -1) / np.maximum(
            np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1),
            1e-12)
        assert cos.min() > 0.99, f"convention drift: min cos {cos.min():.4f}"

    def test_empty_mask_is_finite(self, rng):
        from cppf2_tpu.models.dinov2 import bbox_crop_descriptors

        ext = DinoFeatureExtractor(cfg=TINY, stride=8)
        ext.init_random(hw=(256, 256))
        rgb = jnp.asarray(rng.uniform(0, 1, (240, 320, 3)).astype(np.float32))
        out = np.asarray(bbox_crop_descriptors(
            ext.model, ext.params, rgb, jnp.zeros((240, 320), bool),
            jnp.zeros((8, 2), jnp.int32), stride=8))
        assert np.isfinite(out).all()
