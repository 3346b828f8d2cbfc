"""Model forward shapes, training-step convergence, checkpoint roundtrip,
and data-parallel sharding over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf2_tpu.config import TrainConfig
from cppf2_tpu.models import DinoBranch, ShotBranch
from cppf2_tpu.train import create_train_state, make_lr_schedule
from cppf2_tpu.train.loop import make_train_step, tuple_loss, _sample_tuples


def _synthetic_frame(rng, n=256, with_desc=False):
    """A fake frame: cloud + canonical coords + features."""
    pc_canon = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = np.array([0.1, -0.2, 0.8], np.float32)
    scale = 0.2
    pc = (pc_canon * scale) @ R.T + t
    frame = {
        "pc": pc.astype(np.float32),
        "pc_canon": pc_canon,
        "bound": np.array([0.15, 0.2, 0.12], np.float32),
        "count": np.int32(n),
    }
    if with_desc:
        frame["desc"] = rng.normal(size=(n, 1024)).astype(np.float32)
    else:
        frame["shot"] = rng.normal(size=(n, 352)).astype(np.float32)
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        frame["normal"] = nrm / np.linalg.norm(nrm, axis=-1, keepdims=True)
    return frame


class TestForward:
    def test_shot_branch_shapes(self, rng):
        f = _synthetic_frame(rng)
        model = ShotBranch()
        idx = rng.integers(0, 256, size=(100, 5))
        params = model.init(
            jax.random.key(0),
            jnp.asarray(f["pc"]), jnp.asarray(f["shot"]), jnp.asarray(f["normal"]),
            jnp.asarray(idx),
        )
        preds = model.apply(
            params, jnp.asarray(f["pc"]), jnp.asarray(f["shot"]),
            jnp.asarray(f["normal"]), jnp.asarray(idx),
        )
        assert preds.logits.shape == (100, 6, 32)
        assert preds.scales.shape == (100, 3)

    def test_dino_branch_shapes(self, rng):
        f = _synthetic_frame(rng, with_desc=True)
        model = DinoBranch()
        idx = rng.integers(0, 256, size=(64, 5))
        params = model.init(
            jax.random.key(0), jnp.asarray(f["pc"]), jnp.asarray(f["desc"]), jnp.asarray(idx)
        )
        preds = model.apply(params, jnp.asarray(f["pc"]), jnp.asarray(f["desc"]), jnp.asarray(idx))
        assert preds.logits.shape == (64, 6, 32)
        assert preds.scales.shape == (64, 3)

    def test_param_count_matches_reference_arch(self):
        # SHOT branch dims (train_shot.py:52-73): sanity check layer widths via
        # parameter count of the first encoder layer: 352 -> 128 twice + proj.
        model = ShotBranch()
        params = model.init(
            jax.random.key(0),
            jnp.zeros((4, 3)), jnp.zeros((4, 352)), jnp.zeros((4, 3)),
            jnp.zeros((2, 5), jnp.int32),
        )
        p = params["params"]["shot_encoder"]["res0"]
        assert p["fc1"]["kernel"].shape == (352, 128)
        assert p["fc2"]["kernel"].shape == (128, 128)
        assert p["proj"]["kernel"].shape == (352, 128)
        tup = params["params"]["tuple_encoder"]["res0"]["fc1"]["kernel"]
        assert tup.shape == (360, 128)  # C(5,2)*4 + 5*64 (train_shot.py:57)

    def test_dino_input_dim(self):
        model = DinoBranch()
        params = model.init(
            jax.random.key(0), jnp.zeros((4, 3)), jnp.zeros((4, 1024)),
            jnp.zeros((2, 5), jnp.int32),
        )
        tup = params["params"]["tuple_encoder"]["res0"]["fc1"]["kernel"]
        assert tup.shape == (286, 128)  # C(5,2)*3 + 256 (train_dino.py:65)


class TestTraining:
    def test_loss_decreases_shot(self, rng):
        cfg = TrainConfig(tuples_per_step=256, steps_per_epoch=4, n_points=128)
        f = _synthetic_frame(rng, n=128)
        batch = {k: np.asarray(v)[None] for k, v in f.items()}
        model = ShotBranch()
        idx0 = jnp.zeros((8, 5), jnp.int32)
        state = create_train_state(
            model,
            (jnp.asarray(f["pc"]), jnp.asarray(f["shot"]), jnp.asarray(f["normal"]), idx0),
            cfg,
            jax.random.key(0),
        )
        step = make_train_step(model, cfg, branch="shot")
        batch = jax.tree.map(jnp.asarray, batch)
        first = None
        for i in range(30):
            state, metrics = step(state, batch, jax.random.key(i))
            if first is None:
                first = float(metrics["total"])
        last = float(metrics["total"])
        assert last < first * 0.7, (first, last)

    def test_loss_decreases_dino(self, rng):
        cfg = TrainConfig(tuples_per_step=256, steps_per_epoch=4, n_points=128)
        f = _synthetic_frame(rng, n=128, with_desc=True)
        batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in f.items()}
        model = DinoBranch()
        idx0 = jnp.zeros((8, 5), jnp.int32)
        state = create_train_state(
            model, (jnp.asarray(f["pc"]), jnp.asarray(f["desc"]), idx0), cfg, jax.random.key(0)
        )
        step = make_train_step(model, cfg, branch="dino")
        first = None
        for i in range(30):
            state, metrics = step(state, batch, jax.random.key(i))
            if first is None:
                first = float(metrics["total"])
        assert float(metrics["total"]) < first * 0.7

    def test_lr_schedule(self):
        cfg = TrainConfig(lr=1e-3, lr_step_epochs=25, steps_per_epoch=200)
        sched = make_lr_schedule(cfg)
        assert np.isclose(float(sched(0)), 1e-3)
        assert np.isclose(float(sched(25 * 200 - 1)), 1e-3)
        assert np.isclose(float(sched(25 * 200)), 5e-4)
        assert np.isclose(float(sched(50 * 200)), 2.5e-4)

    def test_tuple_sampler_respects_count(self):
        idx = _sample_tuples(jax.random.key(0), jnp.int32(7), 1000, 5)
        assert int(jnp.max(idx)) <= 6
        assert int(jnp.min(idx)) >= 0


class TestDataParallel:
    def test_sharded_batch_matches_single_device(self, rng):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cfg = TrainConfig(tuples_per_step=64, n_points=64)
        frames = [_synthetic_frame(rng, n=64) for _ in range(8)]
        batch = {
            k: jnp.asarray(np.stack([np.asarray(f[k]) for f in frames]))
            for k in frames[0]
        }
        model = ShotBranch()
        idx0 = jnp.zeros((8, 5), jnp.int32)
        f0 = frames[0]
        state = create_train_state(
            model,
            (jnp.asarray(f0["pc"]), jnp.asarray(f0["shot"]), jnp.asarray(f0["normal"]), idx0),
            cfg,
            jax.random.key(0),
        )
        step = make_train_step(model, cfg, branch="shot")
        # single-device result
        s1, m1 = step(state, batch, jax.random.key(7))

        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        sharded = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
        )
        rep_state = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
        )
        s8, m8 = step(rep_state, sharded, jax.random.key(7))
        np.testing.assert_allclose(float(m8["total"]), float(m1["total"]), rtol=1e-4)
        l1 = jax.tree.flatten(s1.params)[0][0]
        l8 = jax.tree.flatten(s8.params)[0][0]
        np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), rtol=1e-3, atol=1e-6)


class TestCheckpoints:
    def test_roundtrip(self, rng, tmp_path):
        from cppf2_tpu.train.checkpoints import (
            latest_checkpoint,
            restore_checkpoint,
            save_checkpoint,
        )

        cfg = TrainConfig(tuples_per_step=32, n_points=32)
        f = _synthetic_frame(rng, n=32)
        model = ShotBranch()
        idx0 = jnp.zeros((4, 5), jnp.int32)
        state = create_train_state(
            model,
            (jnp.asarray(f["pc"]), jnp.asarray(f["shot"]), jnp.asarray(f["normal"]), idx0),
            cfg,
            jax.random.key(0),
        )
        path = save_checkpoint(str(tmp_path / "ck"), state)
        assert latest_checkpoint(str(tmp_path / "ck")) == path
        restored = restore_checkpoint(path, state)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            state.params,
            restored.params,
        )
