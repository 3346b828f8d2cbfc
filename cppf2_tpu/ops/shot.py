"""SHOT-352 local descriptor, TPU-native.

Re-implementation of the SHOT signature (Tombari et al., ECCV 2010) that the
reference obtains from PCL via its only native extension
(src_shot/shot.cpp:45-100 `compute`; pipeline radii: normal_r = shot_r =
cfg.res * 10 = 2 cm, dataset.py:278, eval.py:210).

Design: instead of PCL's per-neighbor scatter into histogram bins, the
descriptor is assembled as a dense tensor product —

    desc[n, v, c] = sum_k Wspatial[n, k, v] * Wcos[n, k, c]

with Wspatial (32 volumes = 8 azimuth x 2 elevation x 2 radial) and Wcos
(11 cosine bins) built from soft (multi-linear) binning vectors. That turns the
whole descriptor into batched einsums the MXU eats, with zero scatters and
fully static shapes.

Known deltas vs PCL (gated on end-metric parity, SURVEY.md §7): nearest-K
neighbor budget instead of all-in-radius; true quadrilinear interpolation
instead of PCL's separable additive scheme; simple majority sign disambiguation
of the local reference frame. Descriptors are NaN-free by construction
(the reference NaN-scrubs PCL output, dataset.py:281).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cppf2_tpu.ops.eig3 import sym_eig3x3
from cppf2_tpu.ops.neighbors import Neighbors, knn_radius_neighbors

_EPS = 1e-12

N_AZIMUTH = 8
N_ELEVATION = 2
N_RADIAL = 2
N_COS_BINS = 11           # PCL nr_shape_bins=10 -> 11 slots per volume
SHOT_DIM = N_AZIMUTH * N_ELEVATION * N_RADIAL * N_COS_BINS  # 352


def shot_lrf(points: jax.Array, neighbors: Neighbors, radius: float) -> jax.Array:
    """SHOT local reference frames.

    Weighted covariance M = sum (r - d_i)(p_i - p)(p_i - p)^T / sum (r - d_i),
    eigvecs with sign disambiguation by neighbor majority; y = z x x.

    Returns:
        (N, 3, 3) with rows [x, y, z] of the LRF (so `frame @ vec` maps a world
        offset into LRF coordinates).
    """
    rel = neighbors.rel                              # (N, K, 3)
    w = jnp.maximum(radius - neighbors.dist, 0.0) * neighbors.valid
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    cov = jnp.einsum("nk,nki,nkj->nij", w, rel, rel) / jnp.maximum(wsum[..., None], _EPS)
    _, vecs = sym_eig3x3(cov)
    x = vecs[..., 0]
    z = vecs[..., 2]

    def disamb(axis):
        proj = jnp.sum(rel * axis[:, None, :], axis=-1)
        score = jnp.sum(jnp.where(neighbors.valid, jnp.where(proj >= 0, 1.0, -1.0), 0.0), axis=-1)
        s = jnp.where(score >= 0, 1.0, -1.0)
        return axis * s[:, None]

    x = disamb(x)
    z = disamb(z)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-2)


def _soft_bins_centers_half(u: jax.Array, n_bins: int, circular: bool) -> jax.Array:
    """Linear soft binning of u in [0, n_bins] with bin centers at i + 0.5.

    Returns (..., n_bins) weights summing to 1.
    """
    shifted = u - 0.5
    i0 = jnp.floor(shifted)
    frac = shifted - i0
    i0 = i0.astype(jnp.int32)
    if circular:
        b0 = jnp.mod(i0, n_bins)
        b1 = jnp.mod(i0 + 1, n_bins)
    else:
        b0 = jnp.clip(i0, 0, n_bins - 1)
        b1 = jnp.clip(i0 + 1, 0, n_bins - 1)
    one0 = jax.nn.one_hot(b0, n_bins, dtype=u.dtype)
    one1 = jax.nn.one_hot(b1, n_bins, dtype=u.dtype)
    return one0 * (1.0 - frac)[..., None] + one1 * frac[..., None]


def _soft_bins_centers_int(u: jax.Array, n_bins: int) -> jax.Array:
    """Linear soft binning of u in [0, n_bins - 1] with centers at integers."""
    i0 = jnp.floor(u)
    frac = u - i0
    i0 = i0.astype(jnp.int32)
    b0 = jnp.clip(i0, 0, n_bins - 1)
    b1 = jnp.clip(i0 + 1, 0, n_bins - 1)
    one0 = jax.nn.one_hot(b0, n_bins, dtype=u.dtype)
    one1 = jax.nn.one_hot(b1, n_bins, dtype=u.dtype)
    return one0 * (1.0 - frac)[..., None] + one1 * frac[..., None]


def _lrf_spatial_weights(points, neighbors, radius: float):
    """LRF frames + the 32-volume (8 azimuth x 2 elevation x 2 radial) soft
    spatial-binning weights shared by the shape (SHOT-352) and color
    (CSHOT-992) halves — PCL computes these once per point too
    (shot.cpp:45-161 operates on a single LRF/volume assignment).

    Returns:
        (frames (N, 3, 3), w_spatial (N, K, 32) WITHOUT any validity
        weighting — callers apply their own contribution mask).
    """
    frames = shot_lrf(points, neighbors, radius)          # (N, 3, 3) rows x,y,z
    local = jnp.einsum("nab,nkb->nka", frames, neighbors.rel)  # (N, K, 3)
    d = neighbors.dist
    safe_d = jnp.maximum(d, _EPS)

    azimuth = jnp.arctan2(local[..., 1], local[..., 0])        # (-pi, pi]
    a_cont = (azimuth + jnp.pi) / (2.0 * jnp.pi) * N_AZIMUTH   # [0, 8]
    cos_incl = jnp.clip(local[..., 2] / safe_d, -1.0, 1.0)
    e_cont = 1.0 - cos_incl                                    # [0, 2]; boundary at equator
    r_cont = jnp.clip(d / (radius / 2.0), 0.0, 2.0)            # [0, 2]; boundary at r/2

    A = _soft_bins_centers_half(a_cont, N_AZIMUTH, circular=True)     # (N, K, 8)
    E = _soft_bins_centers_half(e_cont, N_ELEVATION, circular=False)  # (N, K, 2)
    R = _soft_bins_centers_half(r_cont, N_RADIAL, circular=False)     # (N, K, 2)
    w_spatial = jnp.einsum("nka,nke,nkr->nkaer", A, E, R).reshape(
        A.shape[0], A.shape[1], N_AZIMUTH * N_ELEVATION * N_RADIAL
    )
    return frames, w_spatial


def compute_shot(
    points: jax.Array,
    normals: jax.Array,
    neighbors: Neighbors,
    radius: float,
    _lrf_spatial=None,
) -> jax.Array:
    """SHOT-352 descriptors for every point.

    Args:
        points: (N, 3). normals: (N, 3) unit (zero rows allowed).
        neighbors: fixed-K neighborhood (self included; self is skipped here
            like PCL skips the zero-distance query point).
        radius: descriptor support radius.
        _lrf_spatial: optional precomputed `_lrf_spatial_weights` result
            (compute_cshot shares it across the shape/color halves).
    Returns:
        (N, 352) float32, L2-normalized per point (zero rows when empty).
    """
    frames, w_spatial = (
        _lrf_spatial if _lrf_spatial is not None
        else _lrf_spatial_weights(points, neighbors, radius)
    )
    d = neighbors.dist
    nb_normal = normals[neighbors.idx]
    has_normal = jnp.sum(nb_normal * nb_normal, axis=-1) > 0.5
    contrib = neighbors.valid & (d > _EPS) & has_normal
    cw = contrib.astype(points.dtype)

    cosine = jnp.clip(
        jnp.sum(nb_normal * frames[:, None, 2, :], axis=-1), -1.0, 1.0
    )
    c_cont = (1.0 + cosine) * (N_COS_BINS - 1) / 2.0           # [0, 10]
    C = _soft_bins_centers_int(c_cont, N_COS_BINS)             # (N, K, 11)

    desc = jnp.einsum(
        "nkv,nkc->nvc", w_spatial * cw[..., None], C
    ).reshape(-1, SHOT_DIM)

    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return jnp.where(norm > _EPS, desc / jnp.maximum(norm, _EPS), 0.0)


def compute_shot_features(
    points: jax.Array,
    valid: jax.Array,
    radius: float,
    k: int = 96,
    exact: bool = False,
):
    """Normals + SHOT descriptors in one call — the drop-in analog of the
    reference's `shot.compute(pc, normal_r, shot_r)` with normal_r == shot_r
    (its only usage: dataset.py:278, eval.py:210).

    Returns:
        (shot (N, 352), normals (N, 3)).
    """
    from cppf2_tpu.ops.normals import estimate_normals

    nbrs = knn_radius_neighbors(points, valid, radius, k, exact=exact)
    normals = estimate_normals(points, nbrs)
    desc = compute_shot(points, normals, nbrs, radius)
    return desc, normals


# --- CSHOT (color SHOT-1344) -------------------------------------------------

N_COLOR_BINS = 31           # PCL nr_color_bins=30 -> 31 slots per volume
CSHOT_DIM = SHOT_DIM + N_AZIMUTH * N_ELEVATION * N_RADIAL * N_COLOR_BINS  # 1344


def _rgb_to_cielab(rgb: jax.Array) -> jax.Array:
    """sRGB [0,1] -> CIELAB (D65), vectorized (PCL RGB2CIELAB equivalent)."""
    c = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    m = jnp.asarray(
        [[0.412453, 0.357580, 0.180423],
         [0.212671, 0.715160, 0.072169],
         [0.019334, 0.119193, 0.950227]], rgb.dtype,
    )
    xyz = c @ m.T
    xyz = xyz / jnp.asarray([0.95047, 1.0, 1.08883], rgb.dtype)
    f = jnp.where(xyz > 0.008856, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def compute_cshot(
    points: jax.Array,
    colors: jax.Array,     # (N, 3) RGB in [0, 1]
    normals: jax.Array,
    neighbors: Neighbors,
    radius: float,
) -> jax.Array:
    """SHOT-1344 color variant — analog of the reference's `shot.compute_color`
    (src_shot/shot.cpp:102-161, PCL SHOTColorEstimation): the 352-d shape
    signature concatenated with a 32-volume x 31-bin histogram of the CIELAB
    color distance |lab_q - lab_p| / 3 between each neighbor and the point,
    L2-normalized jointly."""
    lrf_spatial = _lrf_spatial_weights(points, neighbors, radius)
    shape_desc = compute_shot(
        points, normals, neighbors, radius, _lrf_spatial=lrf_spatial
    )
    _, w_spatial = lrf_spatial

    d = neighbors.dist
    # color half: all in-radius neighbors contribute (no normal requirement,
    # unlike the shape half — PCL's color histogram does not touch normals)
    contrib = neighbors.valid & (d > _EPS)
    cw = contrib.astype(points.dtype)

    lab = _rgb_to_cielab(colors)
    # normalized color distance in [0, 1] (PCL: sum |dL|,|dA|,|dB| over ranges)
    lab_n = lab / jnp.asarray([100.0, 120.0, 120.0], points.dtype)
    cdist = jnp.sum(
        jnp.abs(lab_n[neighbors.idx] - lab_n[:, None, :]), axis=-1
    ) / 3.0
    c_cont = jnp.clip(cdist, 0.0, 1.0) * (N_COLOR_BINS - 1)
    C = _soft_bins_centers_int(c_cont, N_COLOR_BINS)

    cdesc = jnp.einsum(
        "nkv,nkc->nvc", w_spatial * cw[..., None], C
    ).reshape(-1, CSHOT_DIM - SHOT_DIM)

    full = jnp.concatenate([shape_desc, cdesc], axis=-1)
    norm = jnp.linalg.norm(full, axis=-1, keepdims=True)
    return jnp.where(norm > _EPS, full / jnp.maximum(norm, _EPS), 0.0)


def compute_cshot_features(points, colors, valid, radius: float, k: int = 96):
    """Drop-in analog of `shot.compute_color(pc, pc_color, normal_r, shot_r)`."""
    from cppf2_tpu.ops.normals import estimate_normals

    nbrs = knn_radius_neighbors(points, valid, radius, k)
    normals = estimate_normals(points, nbrs)
    return compute_cshot(points, colors, normals, nbrs, radius), normals
