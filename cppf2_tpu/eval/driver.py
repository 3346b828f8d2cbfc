"""REAL275 evaluation driver: detections -> per-instance pose -> NOCS mAP.

Re-architecture of the reference's eval loop (eval.py:54-412): per instance,
crop the masked RGB, sample DINO descriptors at cloud pixels, preprocess the
depth to a padded cloud + SHOT features, and run the jitted ensemble pose
graph; results are accumulated in the NOCS pkl schema (pred_RTs with the scale
norm folded into the rotation, unit-normalized pred_scales) and scored with
`compute_degree_cm_map`.

Detections (masks + class ids) come from upstream pkls exactly like the
reference consumes SAR-Net Mask-RCNN results (eval.py:74-127); this
environment carries no detector weights, so detection inputs are data, not a
component we re-train.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CATEGORIES, PipelineConfig, SYNSET_NAMES, get_category
from cppf2_tpu.eval.nocs_map import compute_degree_cm_map
from cppf2_tpu.infer.frontend import (
    auto_crop,
    mask_bbox,
    preprocess_frame,
    resize_crop,
)
from cppf2_tpu.infer.pipeline import estimate_pose_ensemble
from cppf2_tpu.models import DinoBranch, ShotBranch
from cppf2_tpu.models.dinov2 import (
    bbox_crop_descriptors,
    bbox_crop_token_grid,
    sample_crop_descriptors,
)

# REAL275 evaluation intrinsics (eval.py:82)
REAL275_INTRINSICS = np.array(
    [[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]], np.float32
)


@dataclass
class CategoryModels:
    shot_model: ShotBranch
    shot_params: dict
    dino_model: DinoBranch
    dino_params: dict
    _pose_fns: dict = None  # (pipe, run_opt) -> jitted ensemble graph

    def pose_fn(self, cat, pipe: PipelineConfig, run_opt: bool,
                use_visual: bool = True, use_geo: bool = True):
        """One jitted ensemble graph per configuration — the whole
        sample->vote->align->select pipeline compiles once and is reused
        across every instance of the category."""
        if self._pose_fns is None:
            self._pose_fns = {}
        k = (pipe, run_opt, use_visual, use_geo)
        if k not in self._pose_fns:
            dino_m, shot_m = self.dino_model, self.shot_model

            @jax.jit
            def fn(dino_params, shot_params, pc, valid, count, desc, shot,
                   normal, key):
                def dino_apply(p, pts, ti):
                    return dino_m.apply(p, pts, desc, ti)

                def shot_apply(p, pts, ti):
                    return shot_m.apply(p, pts, shot, normal, ti)

                return estimate_pose_ensemble(
                    dino_apply, dino_params, shot_apply, shot_params,
                    pc, valid, count, key, cat, pipe, run_opt=run_opt,
                    use_visual=use_visual, use_geo=use_geo,
                )

            self._pose_fns[k] = fn
        return self._pose_fns[k]


def _reference_ckpt_path(root: str, branch: str, name: str):
    """Locate a reference-release Lightning checkpoint for a category.

    The reference evaluates from `{root}/{branch}/{name}-num_more-3/
    lightning_logs/version_0/checkpoints/last.ckpt` with a hydra cfg sidecar
    at `{...}-num_more-3/.hydra/config.yaml` (eval.py:88-99); a flat
    `{root}/{branch}/{name}/last.ckpt` is accepted too."""
    pats = [
        os.path.join(root, branch, f"{name}-num_more-*", "lightning_logs",
                     "version_*", "checkpoints", "last.ckpt"),
        os.path.join(root, branch, name, "last.ckpt"),
    ]
    def natkey(path):
        # numeric-aware ordering: version_10 > version_9 (a lexicographic
        # sort would silently pick the older run)
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", path)]

    for p in pats:
        hits = sorted(glob.glob(p), key=natkey)
        if hits:
            return hits[-1]
    return None


def _check_hydra_sidecar(ckpt_path: str, cat) -> None:
    """Validate the run's hydra cfg against the category (tuple size must
    match the compiled pipeline; a mismatch would silently mis-shape the
    MLP inputs). The sidecar is optional — bare ckpts load unchecked."""
    d = os.path.dirname(ckpt_path)
    for _ in range(4):
        cand = os.path.join(d, ".hydra", "config.yaml")
        if os.path.exists(cand):
            import re

            with open(cand) as f:
                text = f.read()
            m = re.search(r"^\s*num_more:\s*(\d+)", text, re.M)
            if m and int(m.group(1)) + 2 != cat.tuple_size:
                raise ValueError(
                    f"{cand}: num_more={m.group(1)} implies tuple size "
                    f"{int(m.group(1)) + 2}, but category '{cat.name}' uses "
                    f"{cat.tuple_size}"
                )
            return
        d = os.path.dirname(d)


def load_category_models(
    ckpt_root: str, categories=None, infer_dtype: str = "bfloat16"
) -> Dict[str, CategoryModels]:
    """Restore per-category branch checkpoints from `{root}/{branch}/{cat}`.

    Accepts, in order of preference: packed `params.msgpack`, an orbax run
    directory, or a reference-release Lightning `last.ckpt` tree (ported via
    `models/porting.py` — BASELINE.md parity path (a)). Missing checkpoints
    fall back to randomly initialized params (the pipeline still runs;
    accuracy requires training — BASELINE.md path (b))."""
    from cppf2_tpu.train.checkpoints import (
        latest_checkpoint,
        load_params_msgpack,
        restore_params,
    )

    out = {}
    for name in categories or CATEGORIES:
        cat = CATEGORIES[name]
        # inference compute dtype: bf16 halves MLP/gather traffic on the MXU
        # path; params stay f32 (flax casts at compute)
        shot_m = ShotBranch(tuple_size=cat.tuple_size, dtype=infer_dtype)
        dino_m = DinoBranch(tuple_size=cat.tuple_size, dtype=infer_dtype)
        i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
        pc0 = jnp.zeros((16, 3))
        sp = shot_m.init(
            jax.random.key(0), pc0, jnp.zeros((16, 352)), jnp.zeros((16, 3)), i0
        )
        dp = dino_m.init(jax.random.key(1), pc0, jnp.zeros((16, 1024)), i0)
        for branch in ("shot", "dino"):
            if not ckpt_root:
                continue
            # prefer packed pretrained params, else the latest orbax run
            # ckpt, else a reference-release Lightning checkpoint tree
            packed = os.path.join(ckpt_root, branch, name, "params.msgpack")
            last = latest_checkpoint(os.path.join(ckpt_root, branch, name))
            ref_ck = _reference_ckpt_path(ckpt_root, branch, name)
            params = None
            if os.path.exists(packed):
                params = load_params_msgpack(packed, sp if branch == "shot" else dp)
            elif last:
                params = restore_params(last)
            elif ref_ck:
                from cppf2_tpu.models.porting import load_beyondcppf_checkpoint

                _check_hydra_sidecar(ref_ck, cat)
                params = load_beyondcppf_checkpoint(ref_ck, branch)
            if params is not None:
                if branch == "shot":
                    sp = params
                else:
                    dp = params
        out[name] = CategoryModels(shot_m, sp, dino_m, dp)
    return out


@jax.jit
def _cloud_extent(pc, valid):
    """Per-axis extent of the valid cloud prefix, on device (the host-side
    formulation needed a (n, 3) fetch per instance)."""
    mx = jnp.max(jnp.where(valid[:, None], pc, -jnp.inf), axis=0)
    mn = jnp.min(jnp.where(valid[:, None], pc, jnp.inf), axis=0)
    return mx - mn


@jax.jit
def _kp_to_crop(pixel_yx, inv_transform):
    """Map cloud pixels (y, x) to crop-local (x, y) via the inverse of the
    resize_crop affine, on device."""
    xy = pixel_yx[:, ::-1].astype(jnp.float32)
    ones = jnp.ones((xy.shape[0], 1), xy.dtype)
    return (jnp.concatenate([xy, ones], axis=-1) @ inv_transform.T)[:, :2]


class PendingInstance(NamedTuple):
    """Device handles of one dispatched instance, not yet fetched.

    The relay charges ~80 ms per host sync; `dispatch_instance` +
    `fetch_instances` batch a whole frame's instances into ONE
    `jax.device_get` (eval.py:132-205 runs per-image instance loops, so the
    frame is the natural sync unit)."""

    dev: tuple                # (count, extent, rot, trans, scale, snorm, loss)
    res: float                # category voxel resolution for the extent guard


def dispatch_instance(
    rgb: np.ndarray,          # (H, W, 3) uint8
    depth_m: np.ndarray,      # (H, W) float meters
    mask: np.ndarray,         # (H, W) bool
    intrinsics: np.ndarray,
    models: CategoryModels,
    cat_name: str,
    pipe: PipelineConfig,
    key,
    dino_extractor=None,
    run_opt: bool = True,
    use_visual: Optional[bool] = None,
    use_geo: bool = True,
    crop="auto",
) -> PendingInstance:
    """Dispatch one detected instance's full pose graph; no host sync.

    `use_visual` defaults to whether a DINO extractor is available — an
    untrained visual branch with zero descriptors shouldn't compete in the
    ensemble (the reference's geo_branch/visual_branch flags, eval.py:62-63).
    """
    if use_visual is None:
        use_visual = dino_extractor is not None
    cat = get_category(cat_name)
    k1, k2 = jax.random.split(key)

    # dense-pass crop: the bbox is known host-side; use the windowed fast
    # path when the instance fits (most REAL275 instances), full-frame else
    if crop == "auto":
        crop = auto_crop(mask)
    fi = preprocess_frame(
        jnp.asarray(depth_m.astype(np.float32)), jnp.asarray(mask),
        jnp.asarray(intrinsics.astype(np.float32)), k1,
        res=cat.res, n_max=pipe.n_points, shot_k=pipe.neighbor_k, crop=crop,
    )

    # visual descriptors at the cloud's pixels, from the masked crop. The
    # whole instance runs with ONE host sync (the combined fetch below —
    # each sync through the relay costs ~80 ms, CLAUDE.md): the cloud-extent
    # guard and the pixel->crop keypoint transform run on DEVICE, and `desc`
    # stays a device array end-to-end (fetching the (n, 1024) f32 tensor
    # costs seconds at relay bandwidth; measured 0.55 inst/s because of it).
    # Degenerate instances (count < 32, blown-up extent) burn one wasted
    # pose dispatch — they are rare and the sync they'd save costs more.
    bbox = mask_bbox(mask)
    if use_visual and dino_extractor is not None and bbox is not None:
        # (gated on use_visual too: in geo-only mode the pose graph never
        # consumes desc, so a ViT forward here would be pure waste)
        # (an all-empty detection mask has no bbox: skip the crop — the pose
        # dispatch still runs and _finalize_instance rejects it via count<32)
        rgb_masked = np.where(mask[..., None], rgb, 0).astype(np.uint8)
        crop_img, transform = resize_crop(rgb_masked, bbox=bbox, out_size=256)
        inv_t = jnp.asarray(np.linalg.inv(transform).astype(np.float32))
        # upload the crop as uint8 (196 KB) and normalize on device —
        # `crop / 255.0` would ship 1.5 MB of float64 through the relay
        desc = dino_extractor(
            jnp.asarray(crop_img).astype(jnp.float32) / 255.0,
            _kp_to_crop(fi.pixel_yx, inv_t),
        )
    else:
        desc = jnp.zeros((pipe.n_points, 1024), jnp.float32)
    est = models.pose_fn(cat, pipe, run_opt, use_visual, use_geo)(
        models.dino_params, models.shot_params,
        fi.pc, fi.valid, fi.count, desc, fi.shot, fi.normal, k2,
    )
    return PendingInstance(
        (fi.count, _cloud_extent(fi.pc, fi.valid), est.rotation,
         est.translation, est.scale, est.scale_norm, est.loss),
        cat.res,
    )


def _finalize_instance(res: float, fetched):
    count, extent, rot, trans, scale, snorm, loss = fetched
    if int(count) < 32:
        return None
    if np.asarray(extent).max() / res > 1000:
        # degenerate-extent guard (eval.py:200)
        return None
    # shared assembly: the SAME snorm clamping as pose_errors/parallel_eval
    # (an unclamped snorm=0 would write a det-0 rotation block that poisons
    # the native IoU kernel with NaNs)
    from cppf2_tpu.eval.pose_errors import _assemble_rt

    rt, scales = _assemble_rt(rot, trans, scale, snorm)
    return rt, scales, float(loss)


def fetch_instances(pendings):
    """ONE host sync for a batch of dispatched instances; per-instance results
    are (RT 4x4, scales 3, loss) in the NOCS convention (R * |s| in the
    rotation block, unit-normalized scales) or None for degenerate inputs
    (eval.py:200-201, 370-372)."""
    if not pendings:
        return []
    vals = jax.device_get(tuple(p.dev for p in pendings))
    return [_finalize_instance(p.res, v) for p, v in zip(pendings, vals)]


def estimate_instance(*args, **kwargs):
    """Pose one detected instance (dispatch + immediate single-instance
    fetch); see `dispatch_instance` / `fetch_instances` for the batched
    one-sync-per-frame path."""
    return fetch_instances([dispatch_instance(*args, **kwargs)])[0]


# ---------------------------------------------------------------------------
# Batched frame path: one vmapped program per (category, crop tier, batch)
# ---------------------------------------------------------------------------

class PendingFrameGroup(NamedTuple):
    """Device handles for one vmapped group of same-(category, crop) instances.

    Where `dispatch_instance` issues ~a dozen relay dispatches per instance
    (preprocess, descriptor extraction, pose graph), the batched path runs a
    whole group as ONE XLA program vmapped over the instance axis — the
    per-dispatch relay floor (~4-5 ms each) is paid once per group, the ViT
    and branch-MLP matmuls batch on the MXU, and masks upload as one array."""

    dev: tuple                # stacked (count, extent, rot, trans, scale,
                              #          snorm, loss), leading axis = batch
    res: float
    idxs: tuple               # original instance index per non-padded row


# frame-wide ViT stage programs, shared across categories (the ViT is
# category-independent) — keyed on the extractor's behavior + the pack's
# chunk-size signature. Multi-chunk signatures are capped: each novel one
# costs a fresh ViT compile through the relay (minutes, though cached on
# disk via JAX_COMPILATION_CACHE_DIR), so past the cap dispatch_frame falls
# back to per-chunk singles — the (b,) signatures, bounded by len(buckets).
_VIT_STAGE_CACHE: dict = {}
_VIT_STAGE_MULTI_CAP = 8


def _vit_stage_fn(extractor, batches: tuple):
    """Build (and cache) the frame-wide batched ViT program.

    ALL of a frame's instance crops — across category and crop-tier groups —
    run as ONE vmapped `bbox_crop_token_grid` forward (the heavy half of the
    reference's per-instance crop+DINO stage, eval.py:179-205), then split
    in-graph into the per-group (grids, txys) slices the pose programs
    consume. Splitting inside the jit keeps the slices fused — device-side
    post-hoc slicing would cost one relay dispatch (~5 ms floor) per group.
    Pulling the ViT out of the pose programs also removes the ViT-L graph
    from every per-category compile."""
    key = (extractor.cfg, extractor.stride, extractor.out_size, batches)
    if key in _VIT_STAGE_CACHE:
        return _VIT_STAGE_CACHE[key]
    vit = extractor.model
    stride = extractor.stride
    out_size = extractor.out_size

    @jax.jit
    def fn(vit_params, rgb_u8, masks):
        rgb = rgb_u8.astype(jnp.float32) / 255.0

        def one(mask):
            return bbox_crop_token_grid(
                vit, vit_params, rgb, mask, out_size=out_size, stride=stride,
            )

        grids, txys = jax.vmap(one)(masks)
        out, off = [], 0
        for b in batches:
            out.append((grids[off:off + b], txys[off:off + b]))
            off += b
        return tuple(out)

    _VIT_STAGE_CACHE[key] = fn
    return fn


def _pack_vit_chunks(batches, cap):
    """First-fit-decreasing packing of per-chunk ViT batch sizes into packs
    of total <= cap. Returns [(chunk_ids, sizes)] — typically ONE pack (one
    ViT dispatch) for a whole REAL275 frame."""
    order = sorted(range(len(batches)), key=lambda c: -batches[c])
    packs = []  # [ids, sizes, total]
    for ci in order:
        b = batches[ci]
        for p in packs:
            if p[2] + b <= cap:
                p[0].append(ci)
                p[1].append(b)
                p[2] += b
                break
        else:
            packs.append([[ci], [b], b])
    return [(ids, tuple(sizes)) for ids, sizes, _ in packs]


def _frame_group_fn(models: CategoryModels, cat, pipe: PipelineConfig,
                    run_opt: bool, use_visual: bool, use_geo: bool,
                    crop: int, stride: int, extractor, batch: int):
    """Build (and cache) the vmapped per-group pose program.

    The group — dense preprocess, descriptor sampling from the precomputed
    frame-wide ViT token grids (`sample_crop_descriptors`, same
    bbox-rescaled-crop convention the branch checkpoints were trained on),
    and the two-branch ensemble — compiles as one program; all param trees
    enter as jit ARGUMENTS (closure pytrees inline into the serialized
    module and blow the relay's compile-size cap). The ViT forward itself
    lives in `_vit_stage_fn`, batched once per frame.
    """
    if models._pose_fns is None:
        models._pose_fns = {}
    # key the compile cache on the extractor's *behavior* (cfg is a frozen
    # dataclass), not id(): a gc'd extractor's address can be reused and
    # silently hit a program that closed over the old model config
    ext_key = (None if extractor is None
               else (extractor.cfg, extractor.stride, extractor.out_size,
                     extractor.interp_impl))
    k = ("frame", pipe, run_opt, use_visual, use_geo, crop, stride,
         ext_key, batch)
    if k in models._pose_fns:
        return models._pose_fns[k]
    dino_m, shot_m = models.dino_model, models.shot_model
    visual = extractor is not None
    out_size = extractor.out_size if visual else 0
    interp_impl = extractor.interp_impl if visual else None

    @jax.jit
    def fn(dino_params, shot_params, grids, txys, depth, masks,
           intrinsics, keys):
        def one(mask, key, grid, txy):
            k1, k2 = jax.random.split(key)
            fi = preprocess_frame(
                depth, mask, intrinsics, k1, res=cat.res,
                n_max=pipe.n_points, shot_k=pipe.neighbor_k, crop=crop,
            )
            if visual:
                desc = sample_crop_descriptors(
                    grid, fi.pixel_yx, txy, out_size=out_size,
                    stride=stride, interp_impl=interp_impl,
                )
            else:
                desc = jnp.zeros((pipe.n_points, 1024), jnp.float32)

            def dino_apply(p, pts, ti):
                return dino_m.apply(p, pts, desc, ti)

            def shot_apply(p, pts, ti):
                return shot_m.apply(p, pts, fi.shot, fi.normal, ti)

            est = estimate_pose_ensemble(
                dino_apply, dino_params, shot_apply, shot_params,
                fi.pc, fi.valid, fi.count, k2, cat, pipe, run_opt=run_opt,
                use_visual=use_visual, use_geo=use_geo,
            )
            return (fi.count, _cloud_extent(fi.pc, fi.valid), est.rotation,
                    est.translation, est.scale, est.scale_norm, est.loss)

        in_axes = (0, 0, 0, 0) if visual else (0, 0, None, None)
        return jax.vmap(one, in_axes=in_axes)(masks, keys, grids, txys)

    models._pose_fns[k] = fn
    return fn


def dispatch_frame(
    rgb: np.ndarray,          # (H, W, 3) uint8
    depth_m: np.ndarray,      # (H, W) float meters
    detections,               # iterable of (category_name, (H, W) bool mask)
    intrinsics: np.ndarray,
    models: Dict[str, CategoryModels],
    pipe: PipelineConfig,
    key,
    dino_extractor=None,
    run_opt: bool = True,
    use_visual: Optional[bool] = None,
    use_geo: bool = True,
    buckets=(1, 2, 4, 8),
):
    """Dispatch ALL of a frame's instances as vmapped per-(category, crop)
    group programs; no host sync. Finalize with `fetch_frames`.

    Groups are padded up to the next bucket size (padded rows repeat the last
    mask and are dropped at fetch) so the compile cache stays at
    O(categories x tiers x len(buckets)) programs rather than one per
    instance count. The reference runs this loop one instance at a time on
    the host (eval.py:132-205)."""
    if use_visual is None:
        use_visual = dino_extractor is not None
    buckets = tuple(sorted(buckets))
    groups: Dict[tuple, list] = {}
    singles = []  # (idx, PendingInstance): masks too large for any crop tier
    for idx, (cat_name, mask) in enumerate(detections):
        tier = auto_crop(mask)
        if tier is None:
            # full-frame dense pass + host-side crop descriptors — the
            # in-graph window can't cover this instance; rare at REAL275 scale
            key, sub = jax.random.split(key)
            singles.append((idx, dispatch_instance(
                rgb, depth_m, mask, intrinsics, models[cat_name], cat_name,
                pipe, sub, dino_extractor=dino_extractor, run_opt=run_opt,
                use_visual=use_visual, use_geo=use_geo, crop=None,
            )))
            continue
        groups.setdefault((cat_name, tier), []).append((idx, mask))

    pendings = []
    if groups:
        visual_on = dino_extractor is not None and use_visual
        depth_j = jnp.asarray(depth_m.astype(np.float32))
        k_j = jnp.asarray(intrinsics.astype(np.float32))
        # .stride is required, not getattr'd with a default: a duck-typed
        # extractor missing it must fail loudly rather than silently run at
        # a descriptor resolution its checkpoint wasn't trained on
        stride = dino_extractor.stride if visual_on else 0

    # chunk oversized groups into max-bucket pieces so the compile cache
    # stays bounded at O(categories x tiers x len(buckets)) programs
    # regardless of how many same-tier detections a frame carries
    chunks = []  # (cat_name, crop, idxs, (batch, H, W) masks, batch)
    for (cat_name, crop), members in groups.items():
        for lo in range(0, len(members), buckets[-1]):
            chunk = members[lo:lo + buckets[-1]]
            batch = next(b for b in buckets if b >= len(chunk))
            idxs = tuple(i for i, _ in chunk)
            masks = [m for _, m in chunk]
            masks += [masks[-1]] * (batch - len(masks))
            chunks.append((cat_name, crop, idxs, np.stack(masks), batch))

    # frame-wide ViT stage: every chunk's crops batch through as few ViT
    # dispatches as fit the bucket cap (typically ONE per frame), split
    # in-graph into per-chunk (grids, txys). rgb feeds only this stage:
    # geo-only frames skip the ~0.9 MB upload (~0.2 s at relay bandwidth).
    grids_by_chunk: Dict[int, tuple] = {}
    if chunks and visual_on:
        rgb_j = jnp.asarray(rgb)
        n_multi = sum(len(k[3]) > 1 for k in _VIT_STAGE_CACHE)
        for ids, sizes in _pack_vit_chunks(
                [c[4] for c in chunks], buckets[-1]):
            ext_key = (dino_extractor.cfg, dino_extractor.stride,
                       dino_extractor.out_size)
            novel_multi = (len(sizes) > 1
                           and (*ext_key, sizes) not in _VIT_STAGE_CACHE)
            if novel_multi and n_multi >= _VIT_STAGE_MULTI_CAP:
                # novel multi-chunk signature past the compile budget:
                # dispatch each chunk alone ((b,) programs, bounded set)
                packs = [([ci], (b,)) for ci, b in zip(ids, sizes)]
            else:
                packs = [(ids, sizes)]
                # count only NEWLY compiled multi signatures against the
                # cap — reusing a cached one costs no compile budget
                n_multi += novel_multi
            for pids, psizes in packs:
                vfn = _vit_stage_fn(dino_extractor, psizes)
                mstack = np.concatenate([chunks[ci][3] for ci in pids])
                parts = vfn(dino_extractor.params, rgb_j, jnp.asarray(mstack))
                for ci, part in zip(pids, parts):
                    grids_by_chunk[ci] = part

    for ci, (cat_name, crop, idxs, masks, batch) in enumerate(chunks):
        cat = get_category(cat_name)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, batch)
        fn = _frame_group_fn(
            models[cat_name], cat, pipe, run_opt, use_visual, use_geo,
            crop, stride, dino_extractor if visual_on else None, batch,
        )
        m = models[cat_name]
        grids, txys = grids_by_chunk.get(ci, (jnp.zeros(1), jnp.zeros(1)))
        dev = fn(m.dino_params, m.shot_params, grids, txys,
                 depth_j, jnp.asarray(masks), k_j, keys)
        pendings.append(PendingFrameGroup(dev, cat.res, idxs))
    pendings.extend(singles)
    return pendings


def fetch_frames(pendings):
    """ONE host sync for every group dispatched for a frame. Returns
    {original instance index -> (RT, scales, loss) or None} with the same
    result convention and degenerate-input guards as `fetch_instances`.
    Accepts the (idx, PendingInstance) singles `dispatch_frame` emits for
    masks too large for any crop tier."""
    if not pendings:
        return {}
    vals = jax.device_get(tuple(
        p.dev if isinstance(p, PendingFrameGroup) else p[1].dev
        for p in pendings
    ))
    out = {}
    for p, v in zip(pendings, vals):
        if isinstance(p, PendingFrameGroup):
            for row, idx in enumerate(p.idxs):
                fetched = tuple(np.asarray(x)[row] for x in v)
                out[idx] = _finalize_instance(p.res, fetched)
        else:
            idx, pi = p
            out[idx] = _finalize_instance(pi.res, v)
    return out


def _debug_frame(res, posed, base, rgb, out_dir):
    """Reference eval.py:374-395 debug output: per-instance rotation/
    translation errors vs the first same-class gt, plus one pose-overlay
    PNG per frame under {out_dir}/debug/."""
    import cv2

    from cppf2_tpu.eval.pose_errors import pose_error_degree_cm
    from cppf2_tpu.utils.viz import draw_pose_overlay

    gt_ids = [int(c) for c in res["gt_class_ids"]]
    overlay = rgb.copy() if rgb is not None else None
    for i in posed:
        cls_id = int(res["pred_class_ids"][i])
        cat = SYNSET_NAMES[cls_id]
        if cls_id in gt_ids:
            g = gt_ids.index(cls_id)
            hv = int(np.asarray(res["gt_handle_visibility"])[g])
            err = pose_error_degree_cm(
                res["pred_RTs"][i], res["gt_RTs"][g], cat,
                handle_visibility=hv)
            print(f"[debug] {base} inst {i} {cat}: "
                  f"rot {err[0]:.1f} deg, tr {err[1]:.1f} cm")
        if overlay is not None:
            overlay = draw_pose_overlay(
                overlay, res["pred_RTs"][i], res["pred_scales"][i],
                REAL275_INTRINSICS)
    if overlay is not None and posed:
        dbg_dir = os.path.join(out_dir, "debug")
        os.makedirs(dbg_dir, exist_ok=True)
        cv2.imwrite(os.path.join(dbg_dir, base.replace(".pkl", "") + ".png"),
                    np.asarray(overlay)[:, :, ::-1])


def evaluate_real275(
    detections_dir: str,
    image_root: str,
    out_dir: str,
    ckpt_root: str = "ckpts",
    pipe: Optional[PipelineConfig] = None,
    dino_ckpt: Optional[str] = None,
    limit: Optional[int] = None,
    run_opt: bool = True,
    seed: int = 0,
    debug: bool = False,
):
    """Full REAL275 evaluation (gated on dataset + detection pkls on disk).

    `debug=True` mirrors the reference's debug path (eval.py:374-395):
    per-instance rotation/translation errors against the first same-class
    gt are printed, and a pose-overlay PNG per frame lands in
    `{out_dir}/debug/`.
    """
    import cv2

    pipe = pipe or PipelineConfig()
    pkls = sorted(glob.glob(os.path.join(detections_dir, "results_*.pkl")))
    assert pkls, f"no detection pkls under {detections_dir}"
    if limit:
        pkls = pkls[:limit]

    models = load_category_models(ckpt_root)
    dino_extractor = None
    if dino_ckpt:
        from cppf2_tpu.models.dinov2 import (
            DinoFeatureExtractor,
            load_backbone,
            load_dinov2_params,
        )

        # a trained compact backbone (train/driver.py --branch dino-e2e)
        # ships as {prefix}.msgpack + {prefix}.json; a reference DINOv2
        # checkpoint is a torch .pth
        prefix = (dino_ckpt[: -len(".msgpack")]
                  if dino_ckpt.endswith(".msgpack") else dino_ckpt)
        bb = None
        if os.path.exists(prefix + ".json"):
            from cppf2_tpu.ops.pallas_kernels import on_tpu

            bb = load_backbone(
                prefix, attn_impl="pallas" if on_tpu() else "hbm"
            )
        if bb is not None:
            bb_params, bb_cfg, bb_stride, bb_out = bb
            dino_extractor = DinoFeatureExtractor(
                params=bb_params, cfg=bb_cfg, stride=bb_stride, out_size=bb_out
            )
        else:
            params = load_dinov2_params(dino_ckpt)
            if params is not None:
                dino_extractor = DinoFeatureExtractor(params=params)

    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.key(seed)
    results = []

    # depth-2 pipeline: frame k+1's host work (image decode, mask stacking,
    # dispatch) runs while frame k's groups compute on device — the fetch
    # (the frame's ONE host sync) happens only after the next dispatch is in
    # flight, so the chip never idles on cv2/pickle time
    pending_frame = None  # (res, det_idx, pendings, pkl_basename, rgb)

    def _finish(pf):
        res, det_idx, pends, base, rgb_dbg = pf
        outs = fetch_frames(pends)
        posed = []
        for j, i in enumerate(det_idx):
            out = outs.get(j)
            if out is None:
                continue
            rt, scales, _ = out
            res["pred_RTs"][i] = rt
            res["pred_scales"][i] = scales
            posed.append(i)
        if debug:
            _debug_frame(res, posed, base, rgb_dbg, out_dir)
        results.append(res)
        with open(os.path.join(out_dir, base), "wb") as f:
            pickle.dump(res, f)

    for pkl_path in pkls:
        with open(pkl_path, "rb") as f:
            res = pickle.load(f)
        if "gt_handle_visibility" not in res:
            res["gt_handle_visibility"] = np.ones_like(res["gt_class_ids"])
        image_path = os.path.join(
            image_root, os.path.relpath(res["image_path"], "data/real/test")
        )
        bgr = cv2.imread(image_path + "_color.png")
        raw_depth = cv2.imread(image_path + "_depth.png", -1)
        if bgr is None or raw_depth is None:
            # fail fast with the offending path — an unchecked None would
            # TypeError hours into a full run with no hint which file broke
            raise FileNotFoundError(
                f"unreadable REAL275 frame: {image_path}_color.png / _depth.png"
            )
        rgb = bgr[:, :, ::-1]
        depth = raw_depth.astype(np.float32) / 1000.0

        n_inst = len(res["pred_class_ids"])
        res["pred_RTs"] = np.stack([np.eye(4) for _ in range(n_inst)])
        res["pred_scales"] = np.ones((n_inst, 3))
        # the whole image runs as vmapped per-(category, crop) group programs
        # with ONE host sync (each sync costs ~80 ms through the relay, and
        # batching the instances onto the vmap axis amortizes the ~4-5 ms
        # per-dispatch relay floor and batches the ViT/MLP matmuls)
        dets, det_idx = [], []
        for i in range(n_inst):
            cls_id = int(res["pred_class_ids"][i])
            cat_name = SYNSET_NAMES[cls_id]
            if cat_name not in CATEGORIES:
                continue
            dets.append((cat_name, res["pred_masks"][:, :, i].astype(bool)))
            det_idx.append(i)
        key, sub = jax.random.split(key)
        pends = dispatch_frame(
            rgb, depth, dets, REAL275_INTRINSICS, models, pipe, sub,
            dino_extractor=dino_extractor, run_opt=run_opt,
        )
        if pending_frame is not None:
            _finish(pending_frame)
        pending_frame = (res, det_idx, pends, os.path.basename(pkl_path),
                         rgb if debug else None)
    if pending_frame is not None:
        _finish(pending_frame)

    return compute_degree_cm_map(
        results, SYNSET_NAMES, os.path.join(out_dir, "plots"),
        degree_thresholds=(5, 10, 15), shift_thresholds=(5, 10, 15),
        iou_3d_thresholds=tuple(np.linspace(0, 1, 101)),
        iou_pose_thres=0.1, use_matches_for_pose=True,
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--detections", required=True)
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", default="nocs_output")
    ap.add_argument("--ckpts", default="ckpts")
    ap.add_argument("--dino-ckpt", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--no-opt", action="store_true")
    ap.add_argument("--debug", action="store_true",
                    help="per-instance errors + overlay PNGs (eval.py:374-395)")
    args = ap.parse_args()
    evaluate_real275(
        args.detections, args.images, args.out, args.ckpts,
        dino_ckpt=args.dino_ckpt, limit=args.limit, run_opt=not args.no_opt,
        debug=args.debug,
    )


if __name__ == "__main__":
    main()
