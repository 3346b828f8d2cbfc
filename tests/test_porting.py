"""BeyondCPPF torch->flax checkpoint porting congruence.

Builds torch modules mirroring the reference's BeyondCPPF layout
(train_shot.py:19-73, train_dino.py:21-85), random-initializes them, ports
the state_dict with `port_beyondcppf_state_dict`, and checks the flax
branches reproduce the torch forward outputs."""

from itertools import combinations

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cppf2_tpu.models import DinoBranch, ShotBranch
from cppf2_tpu.models.porting import (
    load_beyondcppf_checkpoint,
    port_beyondcppf_state_dict,
)


class _TorchResLayer(torch.nn.Module):
    # mirrors reference ResLayer (train_shot.py:19-43), bn/dropout disabled
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.fc1 = torch.nn.Linear(dim_in, dim_out)
        self.fc2 = torch.nn.Linear(dim_out, dim_out)
        self.fc0 = torch.nn.Linear(dim_in, dim_out) if dim_in != dim_out else None

    def forward(self, x):
        x_res = x if self.fc0 is None else self.fc0(x)
        return self.fc2(F.relu(self.fc1(x))) + x_res


def _seq(dims):
    return torch.nn.Sequential(
        *[_TorchResLayer(dims[i], dims[i + 1]) for i in range(len(dims) - 1)]
    )


class _TorchShot(torch.nn.Module):
    # mirrors BeyondCPPF SHOT branch (train_shot.py:52-73, 75-86)
    def __init__(self, k=5, num_bins=32):
        super().__init__()
        self.k = k
        self.shot_encoder = _seq([352] + [128] * 5 + [64])
        input_dim = len(list(combinations(range(k), 2))) * 4 + k * 64
        self.tuple_encoder = _seq([input_dim] + [128] * 5 + [256])
        self.logit_encoder = _seq([256, 256, 256, num_bins * 3 * 2])
        self.scale_encoder = _seq([256, 128, 64, 3])

    def forward(self, points, shot, normal, idx):
        enc = self.shot_encoder(shot)
        shot_in = torch.cat([enc[idx[:, i]] for i in range(self.k)], -1)
        pairs = list(combinations(range(self.k), 2))
        normal_in = torch.cat(
            [
                torch.max(
                    (normal[idx[:, i]] * normal[idx[:, j]]).sum(-1, keepdim=True),
                    (-normal[idx[:, i]] * normal[idx[:, j]]).sum(-1, keepdim=True),
                )
                for i, j in pairs
            ],
            -1,
        )
        coord_in = torch.cat(
            [points[idx[:, i]] - points[idx[:, j]] for i, j in pairs], -1
        )
        feat = self.tuple_encoder(torch.cat([coord_in, normal_in, shot_in], -1))
        return self.logit_encoder(feat).reshape(feat.shape[0], 6, -1), self.scale_encoder(feat)


class _TorchDino(torch.nn.Module):
    # mirrors BeyondCPPF DINO branch (train_dino.py:64-97)
    def __init__(self, k=5, num_bins=32, desc_dim=1024, tdim=256):
        super().__init__()
        self.k = k
        input_dim = len(list(combinations(range(k), 2))) * 3 + tdim
        self.tuple_encoder = _seq([input_dim] + [128] * 5 + [256])
        self.logit_encoder = _seq([256, 256, 256, num_bins * 3 * 2])
        self.scale_encoder = _seq([256, 128, 64, 3])
        self.desc_transform = torch.nn.Linear(desc_dim, tdim)
        self.desc_pair_transform = torch.nn.Linear(tdim * k, tdim)

    def forward(self, points, descs, idx):
        pairs = list(combinations(range(self.k), 2))
        coord_in = torch.cat(
            [points[idx[:, i]] - points[idx[:, j]] for i, j in pairs], -1
        )
        desc_in = torch.cat(
            [self.desc_transform(descs[idx[:, i]]) for i in range(self.k)], -1
        )
        feat = self.tuple_encoder(
            torch.cat([coord_in, self.desc_pair_transform(desc_in)], -1)
        )
        return self.logit_encoder(feat).reshape(feat.shape[0], 6, -1), self.scale_encoder(feat)


def _inputs(rng, n=64, t=16, k=5):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    shot = rng.normal(size=(n, 352)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    desc = rng.normal(size=(n, 1024)).astype(np.float32)
    idx = rng.integers(0, n, size=(t, k)).astype(np.int32)
    return pts, shot, nrm, desc, idx


class TestBeyondCPPFPorting:
    def test_shot_branch_congruent(self, rng):
        torch.manual_seed(0)
        tm = _TorchShot().eval()
        pts, shot, nrm, _, idx = _inputs(rng)
        with torch.no_grad():
            t_logits, t_scales = tm(
                torch.from_numpy(pts), torch.from_numpy(shot),
                torch.from_numpy(nrm), torch.from_numpy(idx).long(),
            )

        variables = port_beyondcppf_state_dict(tm.state_dict(), "shot")
        variables = jax.tree.map(jnp.asarray, variables)
        j_logits, j_scales = ShotBranch().apply(
            variables, jnp.asarray(pts), jnp.asarray(shot), jnp.asarray(nrm),
            jnp.asarray(idx),
        )
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(j_scales), t_scales.numpy(), atol=2e-4)

    def test_dino_branch_congruent(self, rng):
        torch.manual_seed(1)
        tm = _TorchDino().eval()
        pts, _, _, desc, idx = _inputs(rng)
        with torch.no_grad():
            t_logits, t_scales = tm(
                torch.from_numpy(pts), torch.from_numpy(desc),
                torch.from_numpy(idx).long(),
            )

        variables = port_beyondcppf_state_dict(tm.state_dict(), "dino")
        variables = jax.tree.map(jnp.asarray, variables)
        j_logits, j_scales = DinoBranch().apply(
            variables, jnp.asarray(pts), jnp.asarray(desc), jnp.asarray(idx)
        )
        np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(j_scales), t_scales.numpy(), atol=2e-4)

    def test_lightning_checkpoint_roundtrip(self, tmp_path, rng):
        # Lightning saves {"state_dict": ...} (eval.py:92-99 load path)
        torch.manual_seed(2)
        tm = _TorchShot().eval()
        path = tmp_path / "last.ckpt"
        torch.save({"state_dict": tm.state_dict(), "epoch": 100}, path)
        variables = load_beyondcppf_checkpoint(str(path), "shot")
        assert variables is not None
        pts, shot, nrm, _, idx = _inputs(rng, t=4)
        out = ShotBranch().apply(
            jax.tree.map(jnp.asarray, variables),
            jnp.asarray(pts), jnp.asarray(shot), jnp.asarray(nrm), jnp.asarray(idx),
        )
        assert out.logits.shape == (4, 6, 32)
        assert load_beyondcppf_checkpoint(str(tmp_path / "missing.ckpt"), "shot") is None


class TestReleaseLayoutDressRehearsal:
    """Full parity-path rehearsal for real released checkpoints: build the
    reference's on-disk release tree (hydra sidecar + lightning_logs/.../
    last.ckpt, eval.py:88-99), load through `load_category_models`, and drive
    the ported weights through the complete pose graph — asserting logit
    congruence against the torch forward on the way."""

    def _write_release_tree(self, root, cat_name, branch, module):
        d = root / branch / f"{cat_name}-num_more-3"
        ck = d / "lightning_logs" / "version_0" / "checkpoints"
        ck.mkdir(parents=True)
        (d / ".hydra").mkdir()
        (d / ".hydra" / "config.yaml").write_text(
            f"category:\n  name: {cat_name}\nnum_more: 3\nres: 0.002\n"
        )
        torch.save(
            {"state_dict": module.state_dict(), "epoch": 100,
             "global_step": 20200},
            ck / "last.ckpt",
        )

    @pytest.mark.slow
    def test_release_tree_to_pose(self, tmp_path, rng):
        import jax.numpy as jnp

        from cppf2_tpu.config import PipelineConfig, get_category
        from cppf2_tpu.eval.driver import load_category_models

        torch.manual_seed(3)
        tshot, tdino = _TorchShot().eval(), _TorchDino().eval()
        self._write_release_tree(tmp_path, "can", "shot", tshot)
        self._write_release_tree(tmp_path, "can", "dino", tdino)

        models = load_category_models(
            str(tmp_path), ["can"], infer_dtype="float32"
        )["can"]

        # 1) the loaded params reproduce the torch forward exactly
        pts, shot, nrm, desc, idx = _inputs(rng, n=128, t=32)
        with torch.no_grad():
            t_logits, _ = tshot(
                torch.from_numpy(pts), torch.from_numpy(shot),
                torch.from_numpy(nrm), torch.from_numpy(idx).long(),
            )
            d_logits, _ = tdino(
                torch.from_numpy(pts), torch.from_numpy(desc),
                torch.from_numpy(idx).long(),
            )
        j_shot = models.shot_model.apply(
            models.shot_params, jnp.asarray(pts), jnp.asarray(shot),
            jnp.asarray(nrm), jnp.asarray(idx),
        )
        j_dino = models.dino_model.apply(
            models.dino_params, jnp.asarray(pts), jnp.asarray(desc),
            jnp.asarray(idx),
        )
        np.testing.assert_allclose(
            np.asarray(j_shot.logits), t_logits.numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(j_dino.logits), d_logits.numpy(), atol=2e-4
        )

        # 2) the loaded models drive the full ensemble pose graph
        from cppf2_tpu.infer.pipeline import estimate_pose_ensemble

        cat = get_category("can")
        pipe = PipelineConfig(
            n_points=128, num_pairs=256, opt_steps=2, angle_tol_deg=10.0
        )
        n = 128
        pc = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.05)
        dj = jnp.asarray(desc)

        def dino_apply(p, points, ti):
            return models.dino_model.apply(p, points, dj, ti)

        sh, nj = jnp.asarray(shot), jnp.asarray(nrm)

        def shot_apply(p, points, ti):
            return models.shot_model.apply(p, points, sh, nj, ti)

        est = estimate_pose_ensemble(
            dino_apply, models.dino_params, shot_apply, models.shot_params,
            pc, jnp.ones(n, bool), jnp.int32(n), jax.random.key(0), cat, pipe,
        )
        assert np.isfinite(np.asarray(est.rotation)).all()
        assert np.isfinite(float(est.loss))
        assert int(est.pick) in (0, 1)

    def test_port_release_ckpts_script(self, tmp_path, rng):
        """scripts/port_release_ckpts.py: release tree in, packed msgpacks
        out, and the packed params still reproduce the torch forward."""
        import os
        import sys

        import jax.numpy as jnp

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from scripts.port_release_ckpts import main as port_main

        torch.manual_seed(5)
        tshot = _TorchShot().eval()
        self._write_release_tree(tmp_path / "rel", "can", "shot", tshot)
        out = tmp_path / "ported"
        rc = port_main(["--release-root", str(tmp_path / "rel"),
                        "--out", str(out), "--categories", "can",
                        "--skip-check"])
        assert rc == 0
        packed = out / "shot" / "can" / "params.msgpack"
        assert packed.exists()

        from cppf2_tpu.eval.driver import load_category_models

        models = load_category_models(str(out), ["can"],
                                      infer_dtype="float32")["can"]
        pts, shot, nrm, _, idx = _inputs(rng, t=8)
        with torch.no_grad():
            t_logits, _ = tshot(
                torch.from_numpy(pts), torch.from_numpy(shot),
                torch.from_numpy(nrm), torch.from_numpy(idx).long(),
            )
        j = models.shot_model.apply(
            models.shot_params, jnp.asarray(pts), jnp.asarray(shot),
            jnp.asarray(nrm), jnp.asarray(idx),
        )
        np.testing.assert_allclose(
            np.asarray(j.logits), t_logits.numpy(), atol=2e-4
        )

    def test_sidecar_tuple_size_mismatch_raises(self, tmp_path):
        import pytest

        from cppf2_tpu.eval.driver import load_category_models

        torch.manual_seed(4)
        tm = _TorchShot().eval()
        d = tmp_path / "shot" / "can-num_more-3"
        ck = d / "lightning_logs" / "version_0" / "checkpoints"
        ck.mkdir(parents=True)
        (d / ".hydra").mkdir()
        # wrong num_more: implies tuple size 6, category uses 5
        (d / ".hydra" / "config.yaml").write_text("num_more: 4\n")
        torch.save({"state_dict": tm.state_dict()}, ck / "last.ckpt")
        with pytest.raises(ValueError, match="num_more"):
            load_category_models(str(tmp_path), ["can"], infer_dtype="float32")

    def test_ckpt_path_orders_versions_numerically(self, tmp_path):
        # version_10 must outrank version_9 (lexicographic sort picks the
        # older run silently)
        from cppf2_tpu.eval.driver import _reference_ckpt_path

        for v in (9, 10):
            ck = (tmp_path / "shot" / "can-num_more-3" / "lightning_logs"
                  / f"version_{v}" / "checkpoints")
            ck.mkdir(parents=True)
            (ck / "last.ckpt").write_bytes(b"")
        p = _reference_ckpt_path(str(tmp_path), "shot", "can")
        assert "version_10" in p, p
