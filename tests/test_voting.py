"""Oracle tests for the voting kernels: with perfect pair predictions the votes
must recover the ground-truth pose (the discriminative model only ever
approximates these inputs, so this isolates the geometric kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppf2_tpu.core import fibonacci_sphere, pair_targets
from cppf2_tpu.ops.voting import (
    backvote_filter,
    sphere_vote,
    vote_center,
    vote_rotation,
)

RES = 2e-3


def _scene(rng, n=2000, n_pairs=4096):
    """Random cloud in canonical pose, transformed by a known R, T."""
    from scipy.stats import special_ortho_group

    pc_canon = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32) * np.array(
        [0.08, 0.12, 0.08], np.float32
    )
    R = special_ortho_group.rvs(3, random_state=rng).astype(np.float32)
    T = np.array([0.1, -0.05, 0.9], np.float32)
    pc = pc_canon @ R.T + T
    pair_idx = rng.integers(0, n, size=(n_pairs, 2)).astype(np.int32)
    return pc_canon, pc, R, T, pair_idx


class TestVoteCenter:
    def test_recovers_center_from_perfect_targets(self, rng):
        pc_canon, pc, R, T, pair_idx = _scene(rng)
        # perfect (proj_len, odist) for the observed pairs w.r.t. the true center
        t = pair_targets(
            jnp.asarray(pc[pair_idx[:, 0]]), jnp.asarray(pc[pair_idx[:, 1]]),
            jnp.asarray([0.0, 1, 0]), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
            jnp.asarray(T),
        )
        out = vote_center(
            jnp.asarray(pc), jnp.ones(len(pc), bool), t.tr,
            jnp.asarray(pair_idx), jnp.ones(len(pair_idx), bool),
            RES,
        )
        err = np.linalg.norm(np.asarray(out.center) - T)
        assert err < 2.5 * RES, err
        assert int(out.peak_count) > 50

    def test_padded_points_ignored(self, rng):
        pc_canon, pc, R, T, pair_idx = _scene(rng, n=1000, n_pairs=2048)
        # add garbage padding points; pairs only reference the valid prefix
        pc_pad = np.concatenate([pc, rng.uniform(-50, 50, size=(500, 3)).astype(np.float32)])
        valid = np.zeros(1500, bool)
        valid[:1000] = True
        t = pair_targets(
            jnp.asarray(pc[pair_idx[:, 0]]), jnp.asarray(pc[pair_idx[:, 1]]),
            jnp.asarray([0.0, 1, 0]), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
            jnp.asarray(T),
        )
        out = vote_center(
            jnp.asarray(pc_pad), jnp.asarray(valid), t.tr,
            jnp.asarray(pair_idx), jnp.ones(len(pair_idx), bool),
            RES,
        )
        assert np.linalg.norm(np.asarray(out.center) - T) < 2.5 * RES


class TestVoteRotation:
    def test_recovers_axis_from_perfect_angles(self, rng):
        pc_canon, pc, R, T, pair_idx = _scene(rng)
        up_world = (R @ np.array([0, 1, 0], np.float32)).astype(np.float32)
        t = pair_targets(
            jnp.asarray(pc[pair_idx[:, 0]]), jnp.asarray(pc[pair_idx[:, 1]]),
            jnp.asarray(up_world), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
        )
        dirs, wmask = vote_rotation(
            jnp.asarray(pc), t.up_angle, jnp.asarray(pair_idx),
            jnp.ones(len(pair_idx), bool), num_rots=120,
        )
        sphere = jnp.asarray(fibonacci_sphere(719))
        top_dirs, counts = sphere_vote(dirs, wmask.astype(jnp.float32), sphere, 1.0, topk=1)
        best = np.asarray(top_dirs[0])
        cos = abs(float(np.dot(best, up_world)))
        assert cos > np.cos(np.deg2rad(3.0)), (best, up_world)

    def test_importance_weights_change_counts(self, rng):
        pc_canon, pc, R, T, pair_idx = _scene(rng, n=500, n_pairs=512)
        up_world = (R @ np.array([0, 1, 0], np.float32)).astype(np.float32)
        t = pair_targets(
            jnp.asarray(pc[pair_idx[:, 0]]), jnp.asarray(pc[pair_idx[:, 1]]),
            jnp.asarray(up_world), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
        )
        dirs, wmask = vote_rotation(
            jnp.asarray(pc), t.up_angle, jnp.asarray(pair_idx),
            jnp.ones(len(pair_idx), bool), num_rots=60,
        )
        sphere = jnp.asarray(fibonacci_sphere(719))
        _, c1 = sphere_vote(dirs, wmask.astype(jnp.float32), sphere, 1.0)
        _, c2 = sphere_vote(dirs, wmask.astype(jnp.float32) * 0.5, sphere, 1.0)
        np.testing.assert_allclose(np.asarray(c2), np.asarray(c1) * 0.5, rtol=1e-5)


class TestBackvote:
    def test_keeps_clean_pairs(self, rng):
        pc_canon, pc, R, T, pair_idx = _scene(rng)
        t = pair_targets(
            jnp.asarray(pc[pair_idx[:, 0]]), jnp.asarray(pc[pair_idx[:, 1]]),
            jnp.asarray([0.0, 1, 0]), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
            jnp.asarray(T),
        )
        tr = np.asarray(t.tr)
        corrupted = np.arange(len(tr)) % 2 == 0
        tr_noisy = tr.copy()
        tr_noisy[corrupted] += rng.uniform(0.05, 0.1, size=(corrupted.sum(), 2))
        keep_count = len(tr) // 10
        out = backvote_filter(
            jnp.asarray(pc), jnp.asarray(tr_noisy), jnp.asarray(pair_idx),
            jnp.ones(len(pair_idx), bool), jnp.asarray(T), keep_count,
        )
        keep = np.asarray(out.keep)
        assert keep.sum() == keep_count
        # kept pairs must be overwhelmingly the uncorrupted ones
        assert (keep & ~corrupted).sum() / keep.sum() > 0.95
        wt = np.asarray(out.pair_weight)
        assert np.all(wt[keep] > 0) and np.all(wt[~keep] == 0)

    def test_invalid_pairs_never_kept(self, rng):
        pc_canon, pc, R, T, pair_idx = _scene(rng, n=300, n_pairs=256)
        t = pair_targets(
            jnp.asarray(pc[pair_idx[:, 0]]), jnp.asarray(pc[pair_idx[:, 1]]),
            jnp.asarray([0.0, 1, 0]), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
            jnp.asarray(T),
        )
        pv = np.zeros(256, bool)
        pv[:100] = True
        out = backvote_filter(
            jnp.asarray(pc), t.tr, jnp.asarray(pair_idx), jnp.asarray(pv),
            jnp.asarray(T), 25,
        )
        keep = np.asarray(out.keep)
        assert keep.sum() == 25
        assert not keep[100:].any()


class TestSphereVoteCone:
    def test_matches_sampled_accumulator(self, rng):
        """The closed-form arc accumulation must agree with a densely sampled
        sweep (the reference's num_rots discretization) up to sampling error."""
        from cppf2_tpu.ops.voting import sphere_vote_cone

        pc_canon, pc, R, T, pair_idx = _scene(rng, n=500, n_pairs=256)
        up_world = (R @ np.array([0, 1, 0], np.float32)).astype(np.float32)
        t = pair_targets(
            jnp.asarray(pc[pair_idx[:, 0]]), jnp.asarray(pc[pair_idx[:, 1]]),
            jnp.asarray(up_world), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
        )
        sphere = jnp.asarray(fibonacci_sphere(719))
        w = np.ones(256, np.float32)

        # sampled reference (dense: 720 rots)
        num_rots = 720
        dirs, wm = vote_rotation(
            jnp.asarray(pc), t.up_angle, jnp.asarray(pair_idx),
            jnp.ones(256, bool), num_rots=num_rots,
        )
        wv = jnp.repeat(jnp.asarray(w), num_rots) * wm
        top_s, counts_s = sphere_vote(dirs, wv, sphere, 1.0, topk=5)

        top_c, counts_c = sphere_vote_cone(
            jnp.asarray(pc), t.up_angle, jnp.asarray(pair_idx), jnp.asarray(w),
            sphere, 1.0, topk=5,
        )
        # counts normalized: sampled counts / num_rots ~= analytic arc fraction sum
        np.testing.assert_allclose(
            np.asarray(counts_s) / num_rots, np.asarray(counts_c), rtol=0.05, atol=0.3,
        )
        # the top direction agrees
        assert np.allclose(np.asarray(top_s[0]), np.asarray(top_c[0]), atol=1e-5)

    def test_recovers_axis(self, rng):
        from cppf2_tpu.ops.voting import sphere_vote_cone

        pc_canon, pc, R, T, pair_idx = _scene(rng)
        up_world = (R @ np.array([0, 1, 0], np.float32)).astype(np.float32)
        t = pair_targets(
            jnp.asarray(pc[pair_idx[:, 0]]), jnp.asarray(pc[pair_idx[:, 1]]),
            jnp.asarray(up_world), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1]),
        )
        sphere = jnp.asarray(fibonacci_sphere(719))
        top, _ = sphere_vote_cone(
            jnp.asarray(pc), t.up_angle, jnp.asarray(pair_idx),
            jnp.ones(len(pair_idx), np.float32), sphere, 1.0,
        )
        cos = abs(float(np.dot(np.asarray(top[0]), up_world)))
        assert cos > np.cos(np.deg2rad(3.0))


class TestHistExactness:
    def test_int8_matmul_histogram_matches_numpy(self, rng):
        # the one-hot matmul histogram now accumulates in int32 — counts must
        # be EXACT against a numpy oracle (bf16 accumulation rounded above
        # 256 votes/cell)
        from cppf2_tpu.ops.voting import _hist16_matmul

        cand = rng.uniform(-0.1, 0.1, size=(20000, 3)).astype(np.float32)
        ok = rng.uniform(size=20000) < 0.9
        lo = jnp.asarray([-0.1, -0.1, -0.1], jnp.float32)
        cell = jnp.asarray([0.0125, 0.0125, 0.0125], jnp.float32)
        center, count = _hist16_matmul(
            jnp.asarray(cand), jnp.asarray(ok), lo, cell
        )
        ids = np.floor((cand - np.asarray(lo)) / np.asarray(cell) + 0.5).astype(int)
        inside = (ids >= 0).all(1) & (ids < 16).all(1) & ok
        flat = (ids[inside][:, 0] * 16 + ids[inside][:, 1]) * 16 + ids[inside][:, 2]
        hist = np.bincount(flat, minlength=16**3)
        assert int(count) == int(hist.max())
