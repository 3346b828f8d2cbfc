"""Synthetic frame generation: pose sampling -> on-device render -> features.

TPU-native analog of `ShapeNetDirectDataset.get_item_impl` (dataset.py:202-319):
the host draws a mesh + pose + scale; a single jitted device function renders
the depth map, backprojects, voxel-downsamples, computes SHOT features and the
canonical cloud. The reference's host round-trips (pyrender -> numpy -> open3d
-> PCL -> numpy) collapse into one XLA graph per frame; the pkl feature dump
(dataset.py:371-413) becomes unnecessary because features are computed online.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CategoryConfig
from cppf2_tpu.core.downsample import voxel_downsample
from cppf2_tpu.core.geometry import backproject_masked, map_sym
from cppf2_tpu.data.render import (
    NOCS_INTRINSICS,
    default_lighting,
    procedural_albedo,
    raster_render_depth,
    sample_lighting,
    splat_render_depth,
)
from cppf2_tpu.data.shapes import make_category_mesh, sample_surface, subdivide_mesh
from cppf2_tpu.ops.shot import compute_shot_features

_FLIP = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)  # backproject's x/y flip


class SynthFrame(NamedTuple):
    pc: jax.Array        # (n_max, 3) padded downsampled cloud
    pc_canon: jax.Array  # (n_max, 3) canonical coordinates (max-extent normalized)
    shot: jax.Array      # (n_max, 352)
    normal: jax.Array    # (n_max, 3)
    valid: jax.Array     # (n_max,) bool
    count: jax.Array     # () int32
    bound: jax.Array     # (3,) metric bbox extents
    rotation: jax.Array  # (3, 3) gt rotation (cloud frame)
    translation: jax.Array  # (3,) gt translation (cloud frame)
    scale_norm: jax.Array   # () = bound.max()
    gray: jax.Array      # (H, W) lambertian render (visual branch input)
    depth: jax.Array     # (H, W)
    pixel_yx: jax.Array  # (n_max, 2) pixel of each cloud point


def _frame_from_render(
    depth, gray, r_obj, t_obj, scale, bound_canon, intrinsics, res, key,
    n_max, shot_k,
):
    """Shared tail of the frame builders: rendered (depth, gray) -> padded
    cloud + features + canonical frame (the pc_canon invariant lives HERE
    and only here — see CLAUDE.md)."""
    pts_all, pixel_yx, valid_all = backproject_masked(
        depth, intrinsics, depth > 0
    )
    ds = voxel_downsample(pts_all, valid_all, res, n_max, key)
    pc = jnp.where(ds.valid[:, None], pts_all[ds.indices], 0.0)
    pix = jnp.where(ds.valid[:, None], pixel_yx[ds.indices], 0)

    shot, normal = compute_shot_features(pc, ds.valid, res * 10, k=shot_k)

    flip = jnp.asarray(_FLIP)
    rot = flip @ r_obj
    trans = flip @ t_obj
    bound = bound_canon * scale
    scale_norm = jnp.max(bound)
    pc_canon = ((pc - trans) @ rot) / scale_norm
    pc_canon = jnp.where(ds.valid[:, None], pc_canon, 0.0)
    return SynthFrame(
        pc, pc_canon, shot, normal, ds.valid,
        jnp.minimum(ds.count, n_max), bound, rot, trans, scale_norm,
        gray, depth, pix,
    )


@partial(
    jax.jit,
    static_argnames=("res", "n_max", "height", "width", "shot_k", "texture"),
)
def _device_frame(
    samples, sample_normals, r_obj, t_obj, scale, bound_canon,
    intrinsics, res, key, n_max=8192, height=480, width=640, shot_k=64,
    light_key=None, texture: bool = False,
):
    # per-frame randomized lighting + optional value-noise albedo texture
    # (reference: dataset.py:247-253 random lights; :394-402 textured meshes)
    if light_key is None:
        lighting, albedo = default_lighting(), None
    else:
        lk, ak = jax.random.split(light_key)
        lighting = sample_lighting(lk)
        albedo = procedural_albedo(samples, ak) if texture else None
    depth, gray = splat_render_depth(
        samples, sample_normals, r_obj, t_obj, scale, intrinsics,
        height=height, width=width, lighting=lighting, albedo=albedo,
    )
    return _frame_from_render(
        depth, gray, r_obj, t_obj, scale, bound_canon, intrinsics, res, key,
        n_max, shot_k,
    )


@partial(
    jax.jit,
    static_argnames=("res", "n_max", "height", "width", "shot_k", "texture"),
)
def _device_frame_raster(
    verts, faces, r_obj, t_obj, scale, bound_canon,
    intrinsics, res, key, n_max=8192, height=480, width=640, shot_k=64,
    light_key=None, texture: bool = False,
):
    """Triangle-raster variant of `_device_frame` (hole-free at close range)."""
    if light_key is None:
        lighting, albedo_key = default_lighting(), None
    else:
        lk, ak = jax.random.split(light_key)
        lighting = sample_lighting(lk)
        albedo_key = ak if texture else None
    depth, gray = raster_render_depth(
        verts, faces, r_obj, t_obj, scale, intrinsics,
        height=height, width=width, lighting=lighting, albedo_key=albedo_key,
    )
    return _frame_from_render(
        depth, gray, r_obj, t_obj, scale, bound_canon, intrinsics, res, key,
        n_max, shot_k,
    )


def _pad_mesh(verts: np.ndarray, faces: np.ndarray, v_mult=1024, f_mult=2048):
    """Pad mesh buffers to shape-bucket multiples so jitted raster frames
    compile once per bucket, not per mesh. Padded faces are (0,0,0) —
    degenerate, culled in the raster pass."""
    vp = -len(verts) % v_mult
    fp = -len(faces) % f_mult
    verts = np.pad(verts, ((0, vp), (0, 0)))
    faces = np.pad(faces, ((0, fp), (0, 0)))
    return verts.astype(np.float32), faces.astype(np.int32)


@dataclasses.dataclass
class SyntheticFrameGenerator:
    """Streams randomized synthetic frames for a category.

    Pose distribution follows the reference (dataset.py:216-226): either the
    NOCS-subset rotation — yaw U(0, 2pi) . pitch U(10°, 80°) . roll U(±20°) —
    or full SO(3); translation x, y ~ U(±0.3), z ~ U(0.6, 2.0) in front of the
    camera; metric scale from the category's range (dataset.py:165-172).
    """

    cat: CategoryConfig
    n_max: int = 8192
    full_rot: bool = False
    surface_samples: int = 250000
    height: int = 480
    width: int = 640
    shot_k: int = 64
    seed: int = 0
    min_points: int = 100    # retry threshold (dataset.py:275-276)
    randomize_lighting: bool = True   # per-frame light dir/intensity/ambient
    texture: bool = True              # value-noise albedo (visual branch input)
    renderer: str = "splat"           # "splat" | "raster"
    z_range: tuple = (0.6, 2.0)       # camera distance (dataset.py:226)
    # training-side filter: redraw poses until the mug handle is visible.
    # Invisible-handle frames make the yaw component of the canonical-coord
    # targets unobservable — label noise for the rotation head (the eval
    # protocol forgives those frames via gt_handle_visibility instead).
    require_handle_visible: bool = False

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)
        # scale the NOCS pinhole to the render resolution (reference renders at
        # exactly 640x480, dataset.py:210; smaller sizes are for tests)
        k = NOCS_INTRINSICS.copy()
        k[0] *= self.width / 640.0
        k[1] *= self.height / 480.0
        self.intrinsics = jnp.asarray(k)

    def _draw_pose(self):
        if self.full_rot:
            from scipy.stats import special_ortho_group

            r = special_ortho_group.rvs(3, random_state=self.rng).astype(np.float32)
        else:
            ya = self.rng.uniform(0, 2 * np.pi)
            xa = self.rng.uniform(np.deg2rad(10), np.deg2rad(80))
            yya = self.rng.uniform(-np.deg2rad(20), np.deg2rad(20))

            def ry(a):
                c, s = np.cos(a), np.sin(a)
                return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)

            def rx(a):
                c, s = np.cos(a), np.sin(a)
                return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)

            r = ry(yya) @ rx(xa) @ ry(ya)
        t = np.array(
            [
                self.rng.uniform(-0.3, 0.3),
                self.rng.uniform(-0.3, 0.3),
                self.rng.uniform(*self.z_range),
            ],
            np.float32,
        )
        return r, t

    def next_frame(self, mesh=None) -> SynthFrame:
        for _ in range(20):
            if mesh is None:
                m, meta = make_category_mesh(self.cat.name, self.rng, return_meta=True)
            else:
                m, meta = mesh, {}
            bound_canon = (m[0].max(0) - m[0].min(0)).astype(np.float32)
            r_obj, t_obj = self._draw_pose()
            scale = np.float32(self.rng.uniform(*self.cat.scale_range))
            key = jax.random.key(int(self.rng.integers(0, 2**31)))
            light_key = (
                jax.random.key(int(self.rng.integers(0, 2**31)))
                if self.randomize_lighting
                else None
            )
            common = dict(
                n_max=self.n_max, height=self.height, width=self.width,
                shot_k=self.shot_k, light_key=light_key, texture=self.texture,
            )
            if self.renderer == "raster":
                # subdivide coarse faces below the fragment-grid size
                # (canonical meshes are ~unit sized: 1/48 ≈ 6 px at close
                # range); a fixed caller-supplied mesh is subdivided once,
                # not per frame/retry
                # cache key = identity + a content fingerprint, so a caller
                # that mutates the same mesh tuple's arrays in place still
                # gets fresh subdivided geometry
                fp = None
                if mesh is not None:
                    fp = (id(mesh), m[0].shape, float(np.sum(m[0])))
                if fp is not None and getattr(self, "_subdiv_for", None) == fp:
                    verts, faces = self._subdiv_cache
                else:
                    sv, sf = subdivide_mesh(m, max_edge=1.0 / 48.0)
                    verts, faces = _pad_mesh(sv, sf)
                    if fp is not None:
                        self._subdiv_for = fp
                        self._subdiv_cache = (verts, faces)
                frame = _device_frame_raster(
                    jnp.asarray(verts), jnp.asarray(faces),
                    jnp.asarray(r_obj), jnp.asarray(t_obj), scale,
                    jnp.asarray(bound_canon), self.intrinsics,
                    float(self.cat.res), key, **common,
                )
            else:
                samples, normals = sample_surface(m, self.surface_samples, self.rng)
                frame = _device_frame(
                    jnp.asarray(samples), jnp.asarray(normals),
                    jnp.asarray(r_obj), jnp.asarray(t_obj), scale,
                    jnp.asarray(bound_canon), self.intrinsics,
                    float(self.cat.res), key, **common,
                )
            # ONE host roundtrip per attempt: each np.asarray/int() through
            # the axon relay costs ~80 ms; batch everything we need
            count, pc, pc_canon, valid, rot, trans, scale_norm = jax.device_get(
                (frame.count, frame.pc, frame.pc_canon, frame.valid,
                 frame.rotation, frame.translation, frame.scale_norm)
            )
            if int(count) >= self.min_points:
                if self.cat.up_sym:
                    # canonicalize the continuous symmetry (dataset.py:265-266):
                    # rot' = map_sym(rot^T, up)^T and re-derive pc_canon
                    rot_c = np.asarray(
                        map_sym(jnp.asarray(rot.T), self.cat.up_axis_index)
                    ).T
                    pc_canon = ((pc - trans) @ rot_c / float(scale_norm))
                    pc_canon = np.where(
                        valid[:, None], pc_canon, 0.0
                    ).astype(np.float32)
                    frame = frame._replace(
                        rotation=jnp.asarray(rot_c), pc_canon=jnp.asarray(pc_canon)
                    )
                # NOCS handle-visibility flag (mug): does the rendered cloud
                # contain handle points? (eval gates yaw on this — the
                # protocol's gt_handle_visibility, utils/util.py:588-663)
                self.last_meta = meta
                self.last_handle_visible = 1
                if "handle_cut" in meta:
                    pcc = pc_canon[valid]
                    ax, az = meta["axis_xz"]
                    cyl = np.hypot(pcc[:, 0] - ax, pcc[:, 2] - az)
                    self.last_handle_visible = int(
                        (cyl > meta["handle_cut"]).sum() >= 15
                    )
                    if self.require_handle_visible and not self.last_handle_visible:
                        continue  # redraw pose/mesh until the yaw cue is visible
                    if not self.last_handle_visible:
                        # Body-only cloud: yaw is unobservable, so the
                        # canonical x/z of every target point would be label
                        # noise w.r.t. the input. Re-canonicalize the yaw the
                        # same way up-symmetric categories do (map_sym,
                        # dataset.py:265-266): targets become a deterministic
                        # function of the visible geometry, and the eval
                        # protocol already forgives yaw on these frames
                        # (gt_handle_visibility=0, utils/util.py:637-657).
                        # This keeps body-only clouds in-distribution for the
                        # center/scale heads — the round-2 handle-visible-only
                        # training filter left them OOD, which measured as a
                        # ~6 cm camera-z center bias and ~1.5x scale
                        # over-prediction on every hidden-handle eval frame.
                        rot_c = np.asarray(
                            map_sym(jnp.asarray(rot.T), self.cat.up_axis_index)
                        ).T
                        pc_canon = ((pc - trans) @ rot_c / float(scale_norm))
                        pc_canon = np.where(
                            valid[:, None], pc_canon, 0.0
                        ).astype(np.float32)
                        frame = frame._replace(
                            rotation=jnp.asarray(rot_c),
                            pc_canon=jnp.asarray(pc_canon),
                        )
                return frame
        raise RuntimeError("could not render a frame with enough points")

    def batch(self, size: int) -> Dict[str, np.ndarray]:
        """Stack frames into the training-batch pytree (train/loop.py)."""
        frames = [self.next_frame() for _ in range(size)]
        return {
            "pc": np.stack([np.asarray(f.pc) for f in frames]),
            "pc_canon": np.stack([np.asarray(f.pc_canon) for f in frames]),
            "shot": np.stack([np.asarray(f.shot) for f in frames]),
            "normal": np.stack([np.asarray(f.normal) for f in frames]),
            "bound": np.stack([np.asarray(f.bound) for f in frames]),
            "count": np.stack([np.int32(f.count) for f in frames]),
        }
