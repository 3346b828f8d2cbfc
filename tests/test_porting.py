"""BeyondCPPF torch->flax checkpoint porting congruence.

Builds torch modules mirroring the reference's BeyondCPPF layout
(train_shot.py:19-73, train_dino.py:21-85), random-initializes them, ports
the state_dict with `port_beyondcppf_state_dict`, and checks the flax
branches reproduce the torch forward outputs."""

from itertools import combinations

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
