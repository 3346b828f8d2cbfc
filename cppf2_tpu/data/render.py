"""On-device point-splat depth rendering.

Replaces the reference's pyrender EGL offscreen renderer (dataset.py:206-255)
— unavailable here and host-bound by design — with a TPU-native splat pass:
surface samples are transformed by the object pose, pinhole-projected, and
z-min reduced per pixel (`.at[].min`). Back-facing samples are culled with the
sample normals so hidden back surfaces don't bleed through sampling holes.

Camera convention: OpenCV (+z forward, x right, y down); objects are placed at
positive z. (The reference renders in OpenGL and immediately flips back to
OpenCV, dataset.py:259-262 — we skip the detour.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# NOCS-camera pinhole used by the reference for synthesis (dataset.py:189)
NOCS_INTRINSICS = np.array(
    [[591.0125, 0, 320.0], [0, 590.16775, 240.0], [0, 0, 1.0]], np.float32
)


def splat_render_depth(
    samples: jax.Array,      # (S, 3) canonical surface samples
    normals: jax.Array,      # (S, 3) canonical surface normals
    rotation: jax.Array,     # (3, 3) object rotation (camera frame)
    translation: jax.Array,  # (3,) object translation (camera frame, z > 0)
    scale: jax.Array,        # () metric scale multiplier
    intrinsics: jax.Array,   # (3, 3)
    height: int = 480,
    width: int = 640,
    lambert_dir: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Render a depth map (and a lambertian gray image) of a posed object.

    Returns:
        depth: (H, W) float32, 0 where empty.
        gray: (H, W) float32 in [0, 1], simple lambertian shading (for the
            visual branch's descriptor extraction when no textures exist).
    """
    pts = (samples * scale) @ rotation.T + translation
    nrm = normals @ rotation.T

    # back-face culling: keep samples facing the camera (normal . view < 0)
    facing = jnp.sum(nrm * pts, axis=-1) < 0.0
    z = pts[:, 2]
    ok = facing & (z > 1e-3)

    uvw = pts @ intrinsics.T
    u = uvw[:, 0] / jnp.maximum(uvw[:, 2], 1e-6)
    v = uvw[:, 1] / jnp.maximum(uvw[:, 2], 1e-6)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inside = ok & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)

    pix = jnp.where(inside, vi * width + ui, 0)
    zval = jnp.where(inside, z, jnp.inf)

    zbuf = jnp.full((height * width,), jnp.inf, jnp.float32).at[pix].min(zval)
    # pixel 0 may have collected parked invalid samples
    zbuf = zbuf.at[0].set(
        jnp.where(jnp.any(inside & (pix == 0)), zbuf[0], jnp.inf)
    )
    depth = jnp.where(jnp.isfinite(zbuf), zbuf, 0.0).reshape(height, width)

    if lambert_dir is None:
        lambert_dir = jnp.asarray([0.3, -0.5, -0.8])
    ldir = lambert_dir / jnp.linalg.norm(lambert_dir)
    shade = jnp.clip(-jnp.sum(nrm * ldir, axis=-1), 0.0, 1.0) * 0.85 + 0.15
    # winner-takes shading: samples within a tolerance of their pixel's winning
    # depth contribute; max picks one deterministic representative
    winner = inside & (z <= zbuf[pix] + 1e-5)
    gray = (
        jnp.zeros((height * width,), jnp.float32)
        .at[pix]
        .max(jnp.where(winner, shade, 0.0))
        .reshape(height, width)
    )
    gray = jnp.where(depth > 0, gray, 0.0)
    return depth, gray
