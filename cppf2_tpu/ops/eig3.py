"""Batched closed-form symmetric 3x3 eigendecomposition.

The reference leans on PCL/Eigen's iterative solvers inside the SHOT op
(src_shot/shot.cpp:25-32, 82-89); on TPU an analytic (trigonometric Cardano)
solver is branch-free, fully vectorized over tens of thousands of covariance
matrices, and avoids the lowering of jnp.linalg.eigh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-20


def _cross(a, b):
    return jnp.cross(a, b)


def sym_eig3x3(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Eigendecomposition of batched symmetric 3x3 matrices.

    Args:
        A: (..., 3, 3) symmetric.
    Returns:
        (eigvals, eigvecs): eigvals (..., 3) in descending order; eigvecs
        (..., 3, 3) with eigvecs[..., :, i] the unit eigenvector of eigvals[..., i],
        forming a right-handed orthonormal basis.
    """
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    # Scale for numerical robustness (covariance magnitudes span many decades).
    scale = jnp.maximum(
        jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS
    )
    a00, a11, a22, a01, a02, a12 = (x / scale for x in (a00, a11, a22, a01, a02, a12))

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # Diagonal / isotropic degenerate case: eigenvalues are the diagonal.
    diag_like = p2 < 1e-14
    eigvals = jnp.stack([e1, e2, e3], axis=-1)
    diag_sorted = jnp.sort(jnp.stack([a00, a11, a22], axis=-1), axis=-1)[..., ::-1]
    eigvals = jnp.where(diag_like[..., None], diag_sorted, eigvals)

    rows = jnp.stack(
        [
            jnp.stack([a00, a01, a02], axis=-1),
            jnp.stack([a01, a11, a12], axis=-1),
            jnp.stack([a02, a12, a22], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3) normalized A

    def eigvec_for(lam):
        m = rows - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
        c0 = _cross(m[..., 0, :], m[..., 1, :])
        c1 = _cross(m[..., 0, :], m[..., 2, :])
        c2 = _cross(m[..., 1, :], m[..., 2, :])
        cands = jnp.stack([c0, c1, c2], axis=-2)          # (..., 3, 3)
        norms = jnp.sum(cands * cands, axis=-1)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, _EPS), n[..., 0]

    v1, n1 = eigvec_for(e1)
    v3, n3 = eigvec_for(e3)
    # Fallback axes when the cross products vanish (degenerate spectra).
    ex = jnp.zeros_like(v1).at[..., 0].set(1.0)
    ez = jnp.zeros_like(v3).at[..., 2].set(1.0)
    v1 = jnp.where((n1 < 1e-10)[..., None], ex, v1)
    v3 = jnp.where((n3 < 1e-10)[..., None], ez, v3)
    # Orthogonalize the small-eigenvector against the large one, complete the frame.
    v3 = v3 - jnp.sum(v3 * v1, axis=-1, keepdims=True) * v1
    v3n = jnp.linalg.norm(v3, axis=-1, keepdims=True)
    v3_fb = _cross(v1, jnp.where(jnp.abs(v1[..., :1]) < 0.9, ex, ez))
    v3_fb = v3_fb / jnp.maximum(jnp.linalg.norm(v3_fb, axis=-1, keepdims=True), _EPS)
    v3 = jnp.where(v3n < 1e-10, v3_fb, v3 / jnp.maximum(v3n, _EPS))
    v2 = _cross(v3, v1)

    eigvecs = jnp.stack([v1, v2, v3], axis=-1)  # columns
    return eigvals * scale[..., None], eigvecs
