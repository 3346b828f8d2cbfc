"""End-to-end visual branch training: gradients reach the ViT backbone,
artifacts round-trip, and the driver wiring produces eval-loadable files.

Reference context: the reference's visual branch is a FROZEN torch.hub
DINOv2 (dataset.py:62-80); training the backbone through the tuple loss is
a new capability (train/visual.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf2_tpu.config import TrainConfig
from cppf2_tpu.models.cppf import DinoBranch
from cppf2_tpu.models.dinov2 import (
    DinoFeatureExtractor,
    DinoViT,
    ViTConfig,
    load_backbone,
    save_backbone,
)
from cppf2_tpu.train.visual import (
    create_visual_train_state,
    make_visual_train_step,
)

TINY = ViTConfig(embed_dim=32, depth=2, num_heads=2, pretrain_grid=7,
                 compute_dtype="float32")
OUT, STRIDE = 56, 8  # 56/8 = 7-token grid, 98x98 ViT input


def _tiny_batch(rng, b=2, n=64):
    ang = rng.uniform(0, 2 * np.pi, size=b)
    batch = {
        "crop": rng.uniform(0, 1, size=(b, OUT, OUT, 3)).astype(np.float32),
        "kp": rng.uniform(0, OUT, size=(b, n, 2)).astype(np.float32),
        "pc": rng.normal(size=(b, n, 3)).astype(np.float32) * 0.1,
        "bound": np.tile(np.float32([0.1, 0.2, 0.1]), (b, 1)),
        "count": np.full((b,), n, np.int32),
    }
    # canonical = a per-frame yaw of pc (a learnable, consistent mapping)
    rot = np.stack([
        np.stack([np.cos(ang), np.zeros(b), np.sin(ang)], -1),
        np.stack([np.zeros(b), np.ones(b), np.zeros(b)], -1),
        np.stack([-np.sin(ang), np.zeros(b), np.cos(ang)], -1),
    ], 1).astype(np.float32)
    batch["pc_canon"] = np.einsum("bij,bnj->bni", rot, batch["pc"])
    return {k: jnp.asarray(v) for k, v in batch.items()}


class TestVisualE2E:
    @pytest.mark.slow
    def test_loss_decreases_and_backbone_moves(self, rng):
        vit = DinoViT(TINY)
        branch = DinoBranch(tuple_size=3)
        cfg = TrainConfig(lr=3e-4, tuples_per_step=64, n_points=64)
        state = create_visual_train_state(
            vit, branch, cfg, jax.random.key(0), out_size=OUT, stride=STRIDE
        )
        step = make_visual_train_step(vit, branch, cfg, out_size=OUT,
                                      stride=STRIDE)
        p0 = jax.tree.leaves(state.params["backbone"])[0].copy()
        batch = _tiny_batch(rng)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.key(i))
            losses.append(float(metrics["total"]))
        assert losses[-1] < losses[0], losses
        # gradients actually reached the backbone (not just the head)
        p1 = jax.tree.leaves(state.params["backbone"])[0]
        assert float(jnp.abs(p1 - p0).max()) > 0

    def test_backbone_artifact_roundtrip(self, rng, tmp_path):
        vit = DinoViT(TINY)
        img = jnp.asarray(rng.uniform(0, 1, size=(98, 98, 3)).astype(np.float32))
        params = vit.init(jax.random.key(0), img)
        prefix = str(tmp_path / "backbone")
        save_backbone(prefix, params, TINY, stride=STRIDE, out_size=OUT)
        loaded = load_backbone(prefix, compute_dtype="float32")
        assert loaded is not None
        lp, lcfg, lstride, lout = loaded
        assert (lcfg.embed_dim, lcfg.depth, lcfg.num_heads) == (32, 2, 2)
        assert lcfg.pretrain_grid == 7 and lstride == STRIDE and lout == OUT
        # identical forward through the restored tree
        g0 = np.asarray(vit.apply(params, img))
        g1 = np.asarray(DinoViT(lcfg).apply(lp, img))
        np.testing.assert_allclose(g1, g0, atol=1e-5)
        # and through the extractor wrapper (the eval-side consumer)
        ext = DinoFeatureExtractor(params=lp, cfg=lcfg, stride=lstride,
                                   out_size=lout)
        kp = jnp.asarray(rng.uniform(0, OUT, size=(16, 2)).astype(np.float32))
        crop = jnp.asarray(rng.uniform(0, 1, size=(OUT, OUT, 3)).astype(np.float32))
        desc = np.asarray(ext(crop, kp))
        assert desc.shape == (16, 32) and np.isfinite(desc).all()
        norms = np.linalg.norm(desc, axis=-1)
        assert np.allclose(norms[norms > 0], 1.0, atol=1e-4)

    def test_missing_backbone_returns_none(self, tmp_path):
        assert load_backbone(str(tmp_path / "nope")) is None


@pytest.mark.slow
class TestDriverWiring:
    def test_train_category_dino_e2e_exports_artifacts(self, tmp_path):
        from cppf2_tpu.train.driver import train_category

        cfg = TrainConfig(lr=3e-4, max_epochs=1, steps_per_epoch=2,
                          tuples_per_step=64, n_points=128, seed=0)
        out = str(tmp_path / "ckpt")
        vit_cfg = dataclasses.replace(TINY, pretrain_grid=OUT // STRIDE)
        train_category(
            "can", branch="dino-e2e", cfg=cfg, out_dir=out, n_points=128,
            frames_in_pool=2, render_hw=(120, 160), ckpt_every_epochs=1,
            vit_cfg=vit_cfg, e2e_stride=STRIDE, e2e_out_size=OUT,
            progress=lambda *a: None,
        )
        loaded = load_backbone(out + "/backbone", compute_dtype="float32")
        assert loaded is not None
        lp, lcfg, lstride, lout = loaded
        assert lcfg.embed_dim == 32 and lstride == STRIDE and lout == OUT
        import os

        assert os.path.exists(out + "/params.msgpack")
