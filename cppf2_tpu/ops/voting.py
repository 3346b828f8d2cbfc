"""Hough voting kernels: center grid, rotation axes, sphere accumulator, backvoting.

TPU-native re-design of the reference's vote pipeline:
  * `vote_center` (train_dino.py:171-215): the reference allocates a dynamic
    (extent/res) grid per instance; we vote twice into *fixed* 64^3 grids — a
    coarse pass at per-axis adaptive resolution over the cloud AABB, then a fine
    pass at exactly `res` in a window centered on the coarse peak — recovering
    the reference's 2 mm quantization with fully static shapes.
  * `vote_rotation` (train_dino.py:218-239): candidate axis directions as pure
    tensor math (no boolean filtering — degenerate pairs carry a weight of 0).
  * `sphere_vote` (eval.py:37-51 get_topk_dir): vote counting as two matmuls on
    the MXU — thresholded cosine matrix times reciprocal importance weights.
  * `backvote_filter` (eval.py:252-275): the reference's percentile threshold
    keeps exactly ratio*N pairs; we use top-k of negative error, which is the
    same set with a static shape, and produces a weight/mask rather than a
    gather.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _pair_frames(a: jax.Array, b: jax.Array):
    """Unit pair direction and an orthonormal basis (x0, y0) of its normal plane.

    Reference: train_dino.py:185-192 — co = [0, -ab_z, ab_y], with the fallback
    [-ab_y, ab_x, 0] when ab is x-aligned; y = cross(x, ab).
    """
    ab = a - b
    ab_norm = jnp.linalg.norm(ab, axis=-1, keepdims=True)
    abu = ab / jnp.maximum(ab_norm, _EPS)
    co = jnp.stack([jnp.zeros_like(abu[..., 0]), -abu[..., 2], abu[..., 1]], axis=-1)
    co_bad = jnp.linalg.norm(co, axis=-1, keepdims=True) < _EPS
    co_alt = jnp.stack([-abu[..., 1], abu[..., 0], jnp.zeros_like(abu[..., 0])], axis=-1)
    co = jnp.where(co_bad, co_alt, co)
    x0 = co / jnp.maximum(jnp.linalg.norm(co, axis=-1, keepdims=True), _EPS)
    y0 = jnp.cross(x0, abu)
    return abu, ab_norm[..., 0], x0, y0


class CenterVote(NamedTuple):
    center: jax.Array       # (3,) estimated translation
    peak_count: jax.Array   # () vote count at the winning fine cell


def _hist16_matmul(cand: jax.Array, ok: jax.Array, lo: jax.Array, cell: jax.Array):
    """Joint 16^3 histogram of candidate points as two one-hot matmuls.

    counts[x, y*16+z] = sum_v okv * X[v, x] * YZ[v, y*16+z] — the contraction
    rides the MXU; no sort, no scatter (both measured slow on v5e for the vote
    volumes involved). Returns (peak cell center (3,), count at peak).
    """
    g = 16
    ids3 = jnp.floor((cand - lo) / cell + 0.5).astype(jnp.int32)
    inside = jnp.all(ids3 >= 0, -1) & jnp.all(ids3 < g, -1) & ok
    ids3 = jnp.clip(ids3, 0, g - 1)
    ar16 = jnp.arange(g, dtype=jnp.int32)
    # bf16 one-hots, f32 accumulation: counts stay exact (0/1 factors, sums
    # <= 2^24) — the histogram matmuls are the pose graph's dominant cost at
    # 50k pairs. int8 would halve the one-hot HBM traffic, but int8
    # contractions are EMULATED through this backend: the full histogram
    # step measured bf16 2.40 ms / int8 2.54 ms / f32 3.03 ms at the 600k
    # production fine-level volume (scripts/hist_dtype_bench.py, v5e).
    x1h = (ids3[:, 0:1] == ar16[None, :]).astype(jnp.bfloat16)
    yz = ids3[:, 1] * g + ids3[:, 2]
    ar256 = jnp.arange(g * g, dtype=jnp.int32)
    yz1h = (yz[:, None] == ar256[None, :]).astype(jnp.bfloat16)
    x1h = x1h * inside.astype(jnp.bfloat16)[:, None]
    counts = jax.lax.dot_general(
        x1h, yz1h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (16, 256)
    best = jnp.argmax(counts)
    bx = best // (g * g)
    by = (best % (g * g)) // g
    bz = best % g
    center = lo + jnp.stack([bx, by, bz]).astype(cand.dtype) * cell
    return center, counts.reshape(-1)[best]


def vote_center(
    points: jax.Array,        # (N, 3) padded cloud
    point_valid: jax.Array,   # (N,) bool
    tr_preds: jax.Array,      # (P, 2) predicted (proj_len, odist) per pair
    pair_idx: jax.Array,      # (P, 2) int indices of pair endpoints
    pair_valid: jax.Array,    # (P,) bool
    res: float,
    levels: int = 4,
    samples_per_level: int = 16,
    fine_samples: int = 12,
    # fine_span assumes the coarse pyramid localizes the center to ~±1
    # previous-level cell, so the narrowed theta arc always contains each
    # pair's optimal candidate. Validated end-metric at the default
    # levels/samples_per_level; re-check this margin if those change.
    fine_span: float = 0.65,
) -> CenterVote:
    """Pyramid Hough vote for the object center.

    Each pair votes for a circle of candidate centers: foot point
    c = a - u * proj_len, circle radius odist in the plane orthogonal to the
    pair direction (train_dino.py:186-197). Degenerate pairs (|ab| ~ 0 or
    odist <= res) are masked, matching train_dino.py:182.

    TPU re-design vs the reference's uniform 180-angle sweep into a dynamic
    (extent/res)^3 scatter grid: a coarse-to-fine pyramid of 16^3 joint
    histograms, each computed as one-hot *matmuls* (MXU) over arc-localized
    vote samples. At every level each pair samples `samples_per_level` angles
    along the arc of its circle nearest the current window (span ~
    window/odist -> uniform arc-length density across pairs; full circle at
    the top level). The window shrinks 4x per level; cells clamp at `res`, so
    the final estimate carries the reference's quantization with ~100x fewer
    histogram-bin updates than the 50k x 180 sweep and no scatter/sort.
    """
    a = points[pair_idx[:, 0]]
    b = points[pair_idx[:, 1]]
    abu, ab_len, x0, y0 = _pair_frames(a, b)
    proj_len = tr_preds[:, 0]
    odist = tr_preds[:, 1]
    ok = pair_valid & (ab_len > _EPS) & (odist > res)
    c = a - abu * proj_len[:, None]

    big = jnp.asarray(1e9, points.dtype)
    pts_lo = jnp.min(jnp.where(point_valid[:, None], points, big), axis=0)
    pts_hi = jnp.max(jnp.where(point_valid[:, None], points, -big), axis=0)

    g = 16
    cell = jnp.maximum((pts_hi - pts_lo) / (g - 1), res)   # per-axis
    lo = pts_lo
    center = (pts_lo + pts_hi) / 2.0
    count = jnp.zeros((), jnp.float32)

    n_pairs = c.shape[0]
    for level in range(levels):
        # early levels only localize the window — a pair subsample suffices;
        # the final two levels vote with every pair for full statistical power
        coarse = level < levels - 2
        # coarse levels only localize a 16^3 window — 1/8 of the pairs gives
        # ~100k vote samples, ample SNR for a 4096-cell argmax
        sub = n_pairs // 8 if coarse and n_pairs >= 8192 else n_pairs
        # fine levels: the previous peak is localized to ~±1 previous cell
        # (±4 new cells), so a narrower span with fewer samples covers it at
        # *higher* arc density than the coarse 1.2-span/16-sample setting —
        # 25% fewer vote candidates, the pose graph's dominant cost (8.4 ms
        # of 25.7 measured on v5e at 50k pairs)
        n_smp = samples_per_level if coarse else fine_samples
        spanf = 1.2 if coarse else fine_span
        ts_l = jnp.linspace(-1.0, 1.0, n_smp, dtype=points.dtype)
        c_l, x0_l, y0_l = c[:sub], x0[:sub], y0[:sub]
        od_l, ok_l = odist[:sub], ok[:sub]

        if level == 0:
            # top level: the window covers the whole cloud, so the span is the
            # full circle for essentially every pair — a shared uniform angle
            # table replaces per-(pair, sample) transcendentals
            ang = (
                jnp.arange(n_smp, dtype=points.dtype)
                / n_smp * 2 * jnp.pi
            )
            cosv, sinv = jnp.cos(ang), jnp.sin(ang)
            offs = (
                cosv[None, :, None] * x0_l[:, None, :]
                + sinv[None, :, None] * y0_l[:, None, :]
            ) * od_l[:, None, None]
        else:
            # arc-localized samples around the current window center
            window_half = jnp.max(cell) * (g / 2)
            rel = center[None, :] - c_l
            u = jnp.sum(rel * x0_l, axis=-1)
            v = jnp.sum(rel * y0_l, axis=-1)
            theta_star = jnp.arctan2(v, u)
            span = jnp.clip(
                spanf * window_half / jnp.maximum(od_l, _EPS), 0.0, jnp.pi
            )
            theta = theta_star[:, None] + ts_l[None, :] * span[:, None]
            offs = (
                jnp.cos(theta)[..., None] * x0_l[:, None, :]
                + jnp.sin(theta)[..., None] * y0_l[:, None, :]
            ) * od_l[:, None, None]
        cand = (c_l[:, None, :] + offs).reshape(-1, 3)
        ok_v = jnp.broadcast_to(ok_l[:, None], (sub, n_smp)).reshape(-1)

        center, count = _hist16_matmul(cand, ok_v, lo, cell)
        # shrink: window = peak cell +- 2 cells, resolution /4, floor at res
        cell = jnp.maximum(cell / 4.0, res)
        lo = center - cell * (g / 2)
    return CenterVote(center, count)


def vote_rotation(
    points: jax.Array,
    angle_preds: jax.Array,   # (P,) predicted angle of pair direction vs the axis
    pair_idx: jax.Array,      # (P, 2)
    pair_valid: jax.Array,    # (P,)
    num_rots: int = 180,
) -> Tuple[jax.Array, jax.Array]:
    """Candidate axis directions per pair and sweep angle.

    From the predicted angle alpha between the (unit) pair direction and the
    unknown axis, every direction on the cone of half-angle alpha around the
    pair direction is a candidate; sweep its circle (train_dino.py:218-239):
    up = tan(alpha) * offset + sign(tan(alpha)) * ab_unit, normalized.

    Returns:
        dirs: (P * num_rots, 3) unit candidates.
        w_valid: (P * num_rots,) bool validity.
    """
    a = points[pair_idx[:, 0]]
    b = points[pair_idx[:, 1]]
    abu, ab_len, x0, y0 = _pair_frames(a, b)
    ok = pair_valid & (ab_len > _EPS)

    angles = jnp.arange(num_rots, dtype=points.dtype) / num_rots * 2 * jnp.pi
    cosv, sinv = jnp.cos(angles), jnp.sin(angles)
    offset = cosv[None, :, None] * x0[:, None, :] + sinv[None, :, None] * y0[:, None, :]
    tan = jnp.tan(angle_preds)
    sign = jnp.where(tan > 0, 1.0, -1.0).astype(points.dtype)
    up = tan[:, None, None] * offset + sign[:, None, None] * abu[:, None, :]
    up = up / jnp.maximum(jnp.linalg.norm(up, axis=-1, keepdims=True), _EPS)
    w = jnp.broadcast_to(ok[:, None], (ok.shape[0], num_rots))
    return up.reshape(-1, 3), w.reshape(-1)


def sphere_vote(
    dirs: jax.Array,          # (V, 3) candidate directions
    weights: jax.Array,       # (V,) per-vote weight (0 for invalid)
    sphere_pts: jax.Array,    # (S, 3) accumulator directions (fibonacci sphere)
    angle_tol_deg: float,
    topk: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Spherical accumulator as a thresholded-cosine matmul (eval.py:37-51).

    counts[s] = sum_v weights[v] * [dirs_v . sphere_s > cos(2 * tol)].

    Like the reference's bmm_size=100000 chunking (eval.py:43-45), the votes
    stream through a lax.scan in 131072-row chunks: one chunk's (chunk, S)
    thresholded-hits matrix lives at a time instead of the full (V, S)
    tensor (V can be num_pairs * sphere candidates — HBM-sized). Weights
    fold the reference's 1/wt importance normalization.
    """
    thresh = jnp.cos(2 * angle_tol_deg / 180.0 * jnp.pi)
    v = dirs.shape[0]
    chunk = min(v, 131072)
    num_chunks = -(-v // chunk)
    pad = num_chunks * chunk - v
    dirs_p = jnp.pad(dirs, ((0, pad), (0, 0))).reshape(num_chunks, chunk, 3)
    w_p = jnp.pad(weights.astype(jnp.float32), (0, pad)).reshape(num_chunks, chunk)

    def body(acc, dw):
        d, w = dw
        # cosine in f32 (cos(2 deg) ~ 0.9994 sits beyond bf16 resolution);
        # the thresholded hits matrix is 0/1 — bf16 halves its HBM traffic,
        # which dominates this stage.
        cos = jax.lax.dot_general(
            d, sphere_pts, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hits = (cos > thresh).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            w[None, :].astype(jnp.bfloat16), hits, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        return acc + part, None

    counts, _ = jax.lax.scan(body, jnp.zeros((sphere_pts.shape[0],), jnp.float32), (dirs_p, w_p))
    vals, idx = jax.lax.top_k(counts, topk)
    return sphere_pts[idx], vals


def sphere_vote_cone(
    points: jax.Array,
    angle_preds: jax.Array,   # (P,) or (A, P) predicted pair-vs-axis angles
    pair_idx: jax.Array,      # (P, 2)
    weights: jax.Array,       # (P,) per-pair weight (0 for invalid)
    sphere_pts: jax.Array,    # (S, 3)
    angle_tol_deg: float,
    topk: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Closed-form rotation voting: exact cone-arc accumulation.

    The reference sweeps `num_rots` discrete directions on each pair's
    candidate cone and counts those within 2*tol of each sphere point
    (train_dino.py:218-239 + eval.py:37-51). In the continuum limit that
    count is w_p * num_rots * |arc|/2pi where |arc| is the measure of cone
    angles theta with candidate(theta) . s > cos(2*tol) — and the arc has a
    closed form: with u(theta) ~ tan(a)(cos t x0 + sin t y0) + sign(tan a) ab,
    |u| = 1/|cos a|, the condition is R cos(theta - phi) > rhs with
    R = |tan a| hypot(x0.s, y0.s) and rhs = cos(2tol)/|cos a| - sign ab.s, so
    |arc|/2pi = acos(clip(rhs/R)) / pi.

    Replaces a 900k x 719 thresholded matmul (and its HBM-bound hits matrix)
    with a (P, S) elementwise map + one matmul — ~10x faster and *exact*
    where the reference is sampled.

    `angle_preds` may carry a leading axes dimension (A, P): all axes share
    the kept pairs, so the pair gathers, frames and the three (P, S)
    geometry-vs-sphere matmuls are computed ONCE and only the cheap
    angle-dependent arc map broadcasts over A — the pose pipeline votes its
    up and right axes (eval.py:277-293) in one fused call.

    Returns (top-k directions, scores): ((k, 3), (k,)) for 1-D input,
    ((A, k, 3), (A, k)) for 2-D.
    """
    a = points[pair_idx[:, 0]]
    b = points[pair_idx[:, 1]]
    abu, ab_len, x0, y0 = _pair_frames(a, b)
    ok = (weights > 0) & (ab_len > _EPS)

    batched = angle_preds.ndim == 2
    ang = angle_preds if batched else angle_preds[None]   # (A, P)
    tan = jnp.clip(jnp.tan(ang), -1e4, 1e4)
    abs_tan = jnp.abs(tan)
    sign = jnp.where(tan > 0, 1.0, -1.0).astype(points.dtype)
    inv_norm = 1.0 / jnp.sqrt(1.0 + tan * tan)        # == |cos a|

    def dots(v):
        return jax.lax.dot_general(
            v, sphere_pts, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    xs, ys, as_ = dots(x0), dots(y0), dots(abu)        # (P, S), axis-shared
    thresh = jnp.cos(2 * angle_tol_deg / 180.0 * jnp.pi)
    r_amp = abs_tan[..., None] * jnp.sqrt(xs * xs + ys * ys)[None]  # (A, P, S)
    rhs = (thresh / jnp.maximum(inv_norm, _EPS)[..., None]
           - sign[..., None] * as_[None])
    ratio = rhs / jnp.maximum(r_amp, _EPS)
    frac = jnp.arccos(jnp.clip(ratio, -1.0, 1.0)) / jnp.pi
    # degenerate cone (tan ~ 0): candidate is the fixed direction sign*ab
    frac = jnp.where(r_amp < 1e-6, (rhs < 0).astype(points.dtype), frac)

    w = jnp.where(ok, weights, 0.0).astype(jnp.float32)
    counts = jnp.einsum("p,aps->as", w, frac.astype(jnp.float32),
                        precision=jax.lax.Precision.DEFAULT)
    vals, idx = jax.lax.top_k(counts, topk)            # (A, k)
    dirs = sphere_pts[idx]                             # (A, k, 3)
    if batched:
        return dirs, vals
    return dirs[0], vals[0]


class BackvoteResult(NamedTuple):
    keep: jax.Array          # (P,) bool — pairs kept by the noisy-pair filter
    pair_weight: jax.Array   # (P,) importance weight of kept pairs (0 if dropped)
    kept_idx: jax.Array      # (keep_count,) static-shape indices of kept pairs —
                             # use to gather a compact pair set for rotation voting


def backvote_filter(
    points: jax.Array,
    tr_preds: jax.Array,      # (P, 2) predicted (proj_len, odist)
    pair_idx: jax.Array,      # (P, 2)
    pair_valid: jax.Array,
    center: jax.Array,        # (3,) voted center
    keep_count: int,
    imp_wt_margin: float = 0.01,
) -> BackvoteResult:
    """Noisy-pair filtering + per-point vote-importance weights (eval.py:252-275).

    Recompute the (proj_len, odist) targets for the *observed* pairs w.r.t. the
    voted center; keep the `keep_count` pairs with smallest prediction-vs-
    geometry error. Each point's usage count over kept pairs becomes an
    importance weight; a pair's weight is the sum of its endpoints' normalized
    counts plus a margin (down-weighting over-voting points in sphere_vote).
    """
    a = points[pair_idx[:, 0]]
    b = points[pair_idx[:, 1]]
    abu, _, _, _ = _pair_frames(a, b)
    rel = a - center
    proj_len = jnp.sum(rel * abu, axis=-1)
    oc = rel - proj_len[:, None] * abu
    odist = jnp.linalg.norm(oc, axis=-1)
    back = jnp.stack([proj_len, odist], axis=-1)
    err = jnp.linalg.norm(tr_preds - back, axis=-1)
    err = jnp.where(pair_valid, err, jnp.inf)

    neg_topk, top_idx = jax.lax.top_k(-err, keep_count)
    keep = jnp.zeros(err.shape, bool).at[top_idx].set(jnp.isfinite(neg_topk))

    flat_idx = pair_idx.reshape(-1)
    flat_keep = jnp.repeat(keep, 2)
    counts = jnp.zeros((points.shape[0],), jnp.float32).at[flat_idx].add(
        flat_keep.astype(jnp.float32)
    )
    counts = counts / jnp.maximum(jnp.max(counts), 1.0)
    pair_wt = counts[pair_idx[:, 0]] + counts[pair_idx[:, 1]] + imp_wt_margin
    return BackvoteResult(keep, jnp.where(keep, pair_wt, 0.0), top_idx.astype(jnp.int32))
