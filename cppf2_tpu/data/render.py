"""On-device rendering: point-splat and barycentric triangle passes.

Replaces the reference's pyrender EGL offscreen renderer (dataset.py:206-255)
— unavailable here and host-bound by design — with TPU-native passes:

  * `splat_render_depth` — surface samples transformed by the object pose,
    pinhole-projected, z-min reduced per pixel (`.at[].min`), back-face
    culled. Fast; can undersample (holes) at close range.
  * `raster_render_depth` — true triangle rasterization: each face emits a
    fixed GxG fragment grid over its screen bbox (static shapes), barycentric
    inside tests, perspective-correct 1/z interpolation, scatter-min. No
    holes while face bboxes fit the fragment grid.

Shading mirrors the reference's randomized pyrender lighting
(dataset.py:247-253: directional + spot lights with random intensity):
`sample_lighting` draws a per-frame light direction / intensity / ambient,
and `procedural_albedo` adds band-limited value-noise texture over canonical
coordinates (the stand-in for ShapeNet textures feeding DINO descriptors,
dataset.py:394-402).

Camera convention: OpenCV (+z forward, x right, y down); objects are placed at
positive z. (The reference renders in OpenGL and immediately flips back to
OpenCV, dataset.py:259-262 — we skip the detour.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# NOCS-camera pinhole used by the reference for synthesis (dataset.py:189)
NOCS_INTRINSICS = np.array(
    [[591.0125, 0, 320.0], [0, 590.16775, 240.0], [0, 0, 1.0]], np.float32
)


class Lighting(NamedTuple):
    direction: jax.Array   # (3,) unit, pointing *from* the light
    intensity: jax.Array   # () diffuse strength
    ambient: jax.Array     # () ambient floor


def default_lighting() -> Lighting:
    d = jnp.asarray([0.3, -0.5, -0.8])
    return Lighting(d / jnp.linalg.norm(d), jnp.float32(0.85), jnp.float32(0.15))


def sample_lighting(key: jax.Array) -> Lighting:
    """Per-frame random lighting (reference: dataset.py:247-253 randomizes
    directional/spot intensities): direction on the camera-side hemisphere,
    diffuse intensity U(0.5, 1.0), ambient U(0.05, 0.3)."""
    k1, k2, k3 = jax.random.split(key, 3)
    d = jax.random.normal(k1, (3,))
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-6)
    # light comes from the camera side (negative z component)
    d = d * jnp.where(d[2] > 0, -1.0, 1.0)
    return Lighting(
        d,
        jax.random.uniform(k2, (), minval=0.5, maxval=1.0),
        jax.random.uniform(k3, (), minval=0.05, maxval=0.3),
    )


def procedural_albedo(pos: jax.Array, key: jax.Array, octaves: int = 4) -> jax.Array:
    """Band-limited value-noise albedo over canonical coordinates in [0.3, 1].

    A stand-in for ShapeNet texture variation: random plane-wave mixture with
    per-octave random direction, frequency and phase; deterministic in `key`.

    Args:
        pos: (..., 3) canonical-frame positions (roughly [-0.5, 0.5]).
        key: PRNG key.
    """
    kd, kf, kp, ka = jax.random.split(key, 4)
    dirs = jax.random.normal(kd, (octaves, 3))
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-6)
    freq = 2.0 ** jnp.arange(octaves) * jax.random.uniform(
        kf, (octaves,), minval=1.5, maxval=3.0
    )
    phase = jax.random.uniform(kp, (octaves,), minval=0.0, maxval=2 * jnp.pi)
    amp = jax.random.uniform(ka, (octaves,), minval=0.3, maxval=1.0)
    amp = amp / jnp.sum(amp) * 1.5
    proj = jnp.einsum("...c,oc->...o", pos, dirs)
    val = jnp.sum(amp * jnp.sin(2 * jnp.pi * freq * proj + phase), axis=-1)
    return 0.65 + 0.35 * jnp.tanh(val)


def _shade(normals_cam: jax.Array, lighting: Lighting) -> jax.Array:
    lambert = jnp.clip(-jnp.sum(normals_cam * lighting.direction, axis=-1), 0.0, 1.0)
    return jnp.clip(lambert * lighting.intensity + lighting.ambient, 0.0, 1.0)


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
    lighting: Optional[Lighting] = None,
    albedo: jax.Array | None = None,    # (S,) per-sample albedo (texture)
) -> Tuple[jax.Array, jax.Array]:
    """Render a depth map (and a shaded gray image) of a posed object.

    Returns:
        depth: (H, W) float32, 0 where empty.
        gray: (H, W) float32 in [0, 1], lambertian shading x albedo (for the
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

    if lighting is None:
        if lambert_dir is not None:  # legacy arg
            d = lambert_dir / jnp.linalg.norm(lambert_dir)
            lighting = Lighting(d, jnp.float32(0.85), jnp.float32(0.15))
        else:
            lighting = default_lighting()
    shade = _shade(nrm, lighting)
    if albedo is not None:
        shade = shade * albedo
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


def raster_render_depth(
    verts: jax.Array,        # (V, 3) canonical vertices
    faces: jax.Array,        # (F, 3) int32
    rotation: jax.Array,     # (3, 3) object rotation (camera frame)
    translation: jax.Array,  # (3,) object translation (camera frame, z > 0)
    scale: jax.Array,        # () metric scale multiplier
    intrinsics: jax.Array,   # (3, 3)
    height: int = 480,
    width: int = 640,
    lighting: Optional[Lighting] = None,
    albedo_key: jax.Array | None = None,  # enables procedural texture
    frag_grid: int = 16,
    face_chunk: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Barycentric triangle rasterization with perspective-correct depth.

    Each face emits a `frag_grid`^2 fragment grid over its integer screen
    bbox (static shapes — the TPU form of a scanline loop); fragments run a
    barycentric inside test, interpolate 1/z linearly in screen space (exact
    for perspective), and scatter-min into the z-buffer. Coverage is exact
    while a face's bbox fits the grid; larger faces degrade gracefully to
    splat-like sampling. Shading is flat lambertian x optional value-noise
    albedo evaluated at the fragment's canonical position.

    Returns (depth (H, W), gray (H, W)) like `splat_render_depth`.
    """
    if lighting is None:
        lighting = default_lighting()
    v_cam = (verts * scale) @ rotation.T + translation        # (V, 3)
    z = jnp.maximum(v_cam[:, 2], 1e-6)
    uvw = v_cam @ intrinsics.T
    sx = uvw[:, 0] / z
    sy = uvw[:, 1] / z
    inv_z = 1.0 / z

    f = faces
    n_faces = f.shape[0]
    pad = -n_faces % face_chunk
    f = jnp.pad(f, ((0, pad), (0, 0)))                        # degenerate pads
    g = frag_grid

    def chunk(fc):
        ax, ay = sx[fc[:, 0]], sy[fc[:, 0]]
        bx, by = sx[fc[:, 1]], sy[fc[:, 1]]
        cx, cy = sx[fc[:, 2]], sy[fc[:, 2]]
        vz = inv_z[fc]                                        # (C, 3)
        vc = v_cam[fc]                                        # (C, 3, 3)
        fn = jnp.cross(vc[:, 1] - vc[:, 0], vc[:, 2] - vc[:, 0])
        fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
        # no back-face culling: winding is not guaranteed consistent (OBJ /
        # procedural meshes) and closed surfaces self-occlude via z-min
        # anyway; orient normals view-side for shading only
        fn = fn * jnp.where(jnp.sum(fn * vc[:, 0], -1) > 0, -1.0, 1.0)[:, None]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)  # signed 2x area
        ok_face = (jnp.abs(area) > 1e-12) & (fc[:, 0] != fc[:, 1])

        x0 = jnp.floor(jnp.minimum(jnp.minimum(ax, bx), cx)).astype(jnp.int32)
        y0 = jnp.floor(jnp.minimum(jnp.minimum(ay, by), cy)).astype(jnp.int32)
        x1 = jnp.ceil(jnp.maximum(jnp.maximum(ax, bx), cx)).astype(jnp.int32)
        y1 = jnp.ceil(jnp.maximum(jnp.maximum(ay, by), cy)).astype(jnp.int32)
        # integer pixel rows/cols covering the bbox; faces wider than the
        # fragment grid stride across it (splat-like degradation, no crop bias)
        strx = jnp.maximum((x1 - x0 + g) // g, 1)
        stry = jnp.maximum((y1 - y0 + g) // g, 1)
        xs = x0[:, None] + jnp.arange(g)[None, :] * strx[:, None]   # (C, g)
        ys = y0[:, None] + jnp.arange(g)[None, :] * stry[:, None]
        px = xs[:, None, :].astype(jnp.float32)               # (C, 1, g)
        py = ys[:, :, None].astype(jnp.float32)               # (C, g, 1)

        # barycentric weights at pixel centers (edge functions)
        w0 = (cx - bx)[:, None, None] * (py - by[:, None, None]) - (
            cy - by
        )[:, None, None] * (px - bx[:, None, None])
        w1 = (ax - cx)[:, None, None] * (py - cy[:, None, None]) - (
            ay - cy
        )[:, None, None] * (px - cx[:, None, None])
        w2 = (bx - ax)[:, None, None] * (py - ay[:, None, None]) - (
            by - ay
        )[:, None, None] * (px - ax[:, None, None])
        s = jnp.sign(area)[:, None, None]
        inside = (w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0)
        b0 = w0 / area[:, None, None]
        b1 = w1 / area[:, None, None]
        b2 = w2 / area[:, None, None]

        frag_inv_z = b0 * vz[:, 0, None, None] + b1 * vz[:, 1, None, None] + b2 * vz[:, 2, None, None]
        valid = (
            inside
            & ok_face[:, None, None]
            & (frag_inv_z > 1e-9)
            & (xs[:, None, :] >= 0) & (xs[:, None, :] < width)
            & (ys[:, :, None] >= 0) & (ys[:, :, None] < height)
        )
        frag_z = 1.0 / jnp.maximum(frag_inv_z, 1e-9)
        pix = jnp.where(
            valid,
            ys[:, :, None] * width + xs[:, None, :],
            0,
        )
        shade = _shade(fn, lighting)                          # (C,)
        if albedo_key is not None:
            # perspective-correct canonical position of each fragment
            vcan = verts[fc]                                  # (C, 3, 3)
            num = (
                b0[..., None] * (vcan[:, 0] * vz[:, 0, None])[:, None, None, :]
                + b1[..., None] * (vcan[:, 1] * vz[:, 1, None])[:, None, None, :]
                + b2[..., None] * (vcan[:, 2] * vz[:, 2, None])[:, None, None, :]
            )
            pcan = num / jnp.maximum(frag_inv_z[..., None], 1e-9)
            frag_shade = shade[:, None, None] * procedural_albedo(pcan, albedo_key)
        else:
            frag_shade = jnp.broadcast_to(shade[:, None, None], frag_z.shape)
        return (
            pix.reshape(-1),
            jnp.where(valid, frag_z, jnp.inf).reshape(-1),
            jnp.where(valid, frag_shade, 0.0).reshape(-1),
            valid.reshape(-1),
        )

    pix_a, z_a, sh_a, ok_a = jax.lax.map(
        chunk, f.reshape(-1, face_chunk, 3)
    )
    pix_a, z_a, sh_a, ok_a = (
        pix_a.reshape(-1), z_a.reshape(-1), sh_a.reshape(-1), ok_a.reshape(-1)
    )

    zbuf = jnp.full((height * width,), jnp.inf, jnp.float32).at[pix_a].min(z_a)
    zbuf = zbuf.at[0].set(
        jnp.where(jnp.any(ok_a & (pix_a == 0)), zbuf[0], jnp.inf)
    )
    depth = jnp.where(jnp.isfinite(zbuf), zbuf, 0.0).reshape(height, width)

    winner = ok_a & (z_a <= zbuf[pix_a] + 1e-5)
    gray = (
        jnp.zeros((height * width,), jnp.float32)
        .at[pix_a]
        .max(jnp.where(winner, sh_a, 0.0))
        .reshape(height, width)
    )
    gray = jnp.where(depth > 0, gray, 0.0)
    return depth, gray
