"""Core geometry: backprojection, rotations, SO(3) maps, symmetry canonicalization.

TPU-native (fixed-shape, jittable) equivalents of the reference's numpy geometry
utilities: `backproject` (utils/util.py:2586-2607), `fibonacci_sphere`
(utils/util.py:191-208), `map_sym`/`map_sym_discrete` (utils/util.py:66-81),
`rotx/roty/rotz` (dataset.py:84-101), and a pure-jnp SO(3) quaternion
parameterization replacing the lietorch CUDA extension (eval.py:320-355).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Backprojection
# ---------------------------------------------------------------------------

def backproject_masked(depth: jax.Array, intrinsics: jax.Array, mask: jax.Array):
    """Dense pinhole backprojection of a masked depth map.

    Unlike the reference (utils/util.py:2586-2607), which gathers only masked
    pixels into a dynamic-length array, this produces a *fixed-shape* (H*W, 3)
    cloud plus a validity mask; downstream ops consume the mask. Matches the
    reference's OpenGL-style sign flip of x and y.

    Args:
        depth: (H, W) float meters.
        intrinsics: (3, 3) pinhole K.
        mask: (H, W) bool instance mask.
    Returns:
        points: (H*W, 3) float32, zeros where invalid.
        pixel_yx: (H*W, 2) int32 (row, col) per point.
        valid: (H*W,) bool.
    """
    h, w = depth.shape
    vv, uu = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    valid = (depth > 0) & mask
    k_inv = jnp.linalg.inv(intrinsics)
    uv1 = jnp.stack([uu.astype(depth.dtype), vv.astype(depth.dtype), jnp.ones_like(depth)], axis=-1)
    rays = uv1 @ k_inv.T                     # (H, W, 3)
    pts = rays * (depth / rays[..., 2])[..., None]
    # OpenGL-convention sign flip (reference: utils/util.py:2604-2605)
    pts = pts * jnp.array([-1.0, -1.0, 1.0], dtype=depth.dtype)
    pts = jnp.where(valid[..., None], pts, 0.0)
    pixel_yx = jnp.stack([vv, uu], axis=-1).astype(jnp.int32)
    return pts.reshape(-1, 3), pixel_yx.reshape(-1, 2), valid.reshape(-1)


# ---------------------------------------------------------------------------
# Rotations
# ---------------------------------------------------------------------------

def rotx(a):
    """4x4 rotation about x (reference: dataset.py:97-101)."""
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=jnp.float32)


def roty(a):
    """4x4 rotation about y (reference: dataset.py:91-95)."""
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=jnp.float32)


def rotz(a):
    """4x4 rotation about z (reference: dataset.py:84-88)."""
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, s, 0, 0], [-s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=jnp.float32)


def fibonacci_sphere(samples: int) -> np.ndarray:
    """Evenly distributed unit directions via the golden-angle spiral.

    Host-side constant generator (reference: utils/util.py:191-208); the result is
    baked into the jitted graph as a constant.
    """
    i = np.arange(samples, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1.0 - (i / (samples - 1)) * 2.0
    radius = np.sqrt(np.maximum(0.0, 1.0 - y * y))
    theta = phi * i
    return np.stack([np.cos(theta) * radius, y, np.sin(theta) * radius], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# Symmetry canonicalization
# ---------------------------------------------------------------------------

def map_sym(rot: jax.Array, axis: int) -> jax.Array:
    """Canonicalize a rotation w.r.t. continuous symmetry about `axis`.

    Finds the in-plane rotation S about `axis` minimizing ||S @ rot - I|| in the
    plane orthogonal to `axis` and returns S @ rot (reference: utils/util.py:71-81).
    `axis` is a static int.
    """
    other = [i for i in range(3) if i != axis]
    r00 = rot[other[0], other[0]]
    r01 = rot[other[0], other[1]]
    r10 = rot[other[1], other[0]]
    r11 = rot[other[1], other[1]]
    alpha = jnp.arctan2(r10 - r01, r00 + r11)
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    S = jnp.eye(3, dtype=rot.dtype)
    S = S.at[other[0], other[0]].set(c)
    S = S.at[other[0], other[1]].set(s)
    S = S.at[other[1], other[0]].set(-s)
    S = S.at[other[1], other[1]].set(c)
    return S @ rot


def map_sym_discrete(rot: jax.Array, sym_rots: jax.Array) -> jax.Array:
    """Snap to the nearest member of a discrete symmetry group
    (reference: utils/util.py:66-68).

    Args:
        rot: (3,3). sym_rots: (S,3,3).
    """
    eye = jnp.eye(3, dtype=rot.dtype)
    errs = jnp.linalg.norm(
        jnp.swapaxes(sym_rots, -1, -2) @ rot - eye, axis=(-2, -1)
    )
    idx = jnp.argmin(errs)
    return jnp.swapaxes(sym_rots[idx], -1, -2) @ rot


# ---------------------------------------------------------------------------
# SO(3) parameterizations (replaces lietorch; eval.py:320-355)
# ---------------------------------------------------------------------------

def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix from an (x, y, z, w) quaternion; normalizes internally.

    The alignment optimizer differentiates through this (autodiff replaces
    lietorch's manual CUDA jacobians).
    """
    q = q / (jnp.linalg.norm(q) + 1e-12)
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=q.dtype,
    )


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """(x, y, z, w) quaternion from a rotation matrix (branchless Shepperd).

    All four pivot constructions are evaluated and the numerically largest
    diagonal pivot selects the row: deriving component signs only from the
    antisymmetric part (4*qw*q_i) fails at 180-degree rotations where qw=0
    and every antisymmetric entry vanishes (the old bug: a flip about
    (1,-1,0) came back as a flip about (1,+1,0))."""
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    pivots_sq = jnp.stack([
        1 + tr,                              # 4*qw^2
        1 + m[0, 0] - m[1, 1] - m[2, 2],     # 4*qx^2
        1 - m[0, 0] + m[1, 1] - m[2, 2],     # 4*qy^2
        1 - m[0, 0] - m[1, 1] + m[2, 2],     # 4*qz^2
    ])
    s = jnp.sqrt(jnp.maximum(pivots_sq, 1e-12))  # 2*|pivot|
    d = 1.0 / (2.0 * s)
    # antisymmetric (4*qw*qi) and symmetric (4*qi*qj) off-diagonal sums
    ax, ay, az = m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]
    sxy, sxz, syz = m[0, 1] + m[1, 0], m[0, 2] + m[2, 0], m[1, 2] + m[2, 1]
    cands = jnp.stack([                      # rows: pivot w, x, y, z
        jnp.stack([ax * d[0], ay * d[0], az * d[0], s[0] / 2]),
        jnp.stack([s[1] / 2, sxy * d[1], sxz * d[1], ax * d[1]]),
        jnp.stack([sxy * d[2], s[2] / 2, syz * d[2], ay * d[2]]),
        jnp.stack([sxz * d[3], syz * d[3], s[3] / 2, az * d[3]]),
    ])
    q = cands[jnp.argmax(pivots_sq)]
    return q / (jnp.linalg.norm(q) + 1e-12)


def so3_exp(omega: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3) (Rodrigues), Taylor-safe near zero."""
    theta = jnp.linalg.norm(omega)
    theta_sq = theta * theta
    small = theta < 1e-6
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    wx, wy, wz = omega[0], omega[1], omega[2]
    K = jnp.array([[0.0, -wz, wy], [wz, 0.0, -wx], [-wy, wx, 0.0]], dtype=omega.dtype)
    # K @ K == omega omega^T - theta^2 I, computed elementwise to stay exact on
    # hardware whose default matmul precision is reduced (TPU bf16 passes).
    ksq = jnp.outer(omega, omega) - theta_sq * jnp.eye(3, dtype=omega.dtype)
    return jnp.eye(3, dtype=omega.dtype) + a * K + b * ksq


# ---------------------------------------------------------------------------
# Box / projection helpers (reference: utils/util.py:858-921)
# ---------------------------------------------------------------------------

def get_3d_bbox(scale, shift=0.0) -> np.ndarray:
    """8 corners of an axis-aligned box of size `scale`, as (3, 8)
    (reference: utils/util.py:858-886). Host-side numpy."""
    s = np.asarray(scale, dtype=np.float64)
    if s.ndim == 0:
        s = np.array([s, s, s])
    sx, sy, sz = s / 2.0
    corners = np.array(
        [
            [sx, sy, sz], [sx, sy, -sz], [-sx, sy, sz], [-sx, sy, -sz],
            [sx, -sy, sz], [sx, -sy, -sz], [-sx, -sy, sz], [-sx, -sy, -sz],
        ]
    ) + shift
    return corners.T


def transform_coordinates_3d(coords: np.ndarray, rt: np.ndarray) -> np.ndarray:
    """Apply a 4x4 homogeneous transform to (3, N) coords
    (reference: utils/util.py:890-902)."""
    hom = np.vstack([coords, np.ones((1, coords.shape[1]))])
    out = rt @ hom
    return out[:3] / out[3:4]


def calculate_2d_projections(coords3d: np.ndarray, intrinsics: np.ndarray) -> np.ndarray:
    """Project (3, N) camera-space coords to integer pixels
    (reference: utils/util.py:905-918)."""
    proj = intrinsics @ coords3d
    proj = proj[:2] / proj[2:3]
    return proj.T.astype(np.int32)
