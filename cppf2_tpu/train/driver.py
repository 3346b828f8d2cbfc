"""Training driver CLI: train a category branch end-to-end on synthetic frames.

Replaces the reference's hydra + Lightning entrypoints (train_shot.py:133-150,
train_dino.py:142-161): frames stream from the on-device synthetic generator
(no pkl dump stage), batches are data-parallel over every visible device, and
checkpoints/metrics go through orbax / a jsonl log.

Usage:
    python -m cppf2_tpu.train.driver --category mug --branch shot \
        --epochs 101 --steps-per-epoch 200 --out ckpts/shot/mug
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CATEGORIES, TrainConfig
from cppf2_tpu.data.synthetic import SyntheticFrameGenerator
from cppf2_tpu.models import DinoBranch, ShotBranch
from cppf2_tpu.parallel import make_mesh, replicate, shard_batch
from cppf2_tpu.train import create_train_state
from cppf2_tpu.train.checkpoints import latest_checkpoint, restore_checkpoint, save_checkpoint
from cppf2_tpu.train.loop import make_train_step


def _frame_crop_kp(frame, out_size: int = 256):
    """Host-side crop + keypoint prep shared by the frozen-backbone
    descriptor pass and end-to-end visual training: bbox-square rescale the
    lambertian render to `out_size` (the reference's resize_crop convention,
    dataset.py:322-337) and map cloud pixels into crop space.

    Returns (crop (S, S, 3) f32 in [0,1], kp_local (N, 2) f32 (x, y))."""
    import jax

    from cppf2_tpu.infer.frontend import mask_bbox, resize_crop

    gray, depth, pix = jax.device_get((frame.gray, frame.depth, frame.pixel_yx))
    bbox = mask_bbox(depth > 0)
    rgb = np.repeat(np.asarray(gray)[..., None], 3, axis=-1)
    crop, transform = resize_crop(rgb, bbox=bbox, out_size=out_size)
    kp = np.asarray(pix)[:, ::-1].astype(np.float64)
    kp_local = (
        np.linalg.inv(transform)
        @ np.concatenate([kp, np.ones((len(kp), 1))], -1).T
    ).T[:, :2]
    return crop.astype(np.float32), kp_local.astype(np.float32)


def _frame_descriptors(frame, extractor, out_size: int = None):
    """DINOv2 descriptors for a synthetic frame's cloud points: crop the
    lambertian render around the depth bbox and sample patch tokens at the
    cloud pixels (the analog of dump_data's descriptor pass,
    dataset.py:394-402).

    Returns a DEVICE array — the (n, 1024) descriptors feed device-side
    consumers (train step / pose graph); fetching them to host costs ~1-3 s
    per frame through the relay (measured: the old np.asarray round-trip made
    streaming-pool dino training 3x slower end-to-end). The host-side inputs
    (gray, depth, pixels) come over in ONE batched fetch."""
    import jax.numpy as jnp

    if out_size is None:
        # follow the extractor's crop convention (256 for the shipped
        # checkpoints; trained compact backbones record theirs in the sidecar)
        out_size = getattr(extractor, "out_size", 256)
    crop, kp_local = _frame_crop_kp(frame, out_size)
    return extractor(jnp.asarray(crop), jnp.asarray(kp_local))


def train_category(
    category: str,
    branch: str = "shot",
    cfg: TrainConfig = None,
    out_dir: str = None,
    n_points: int = 2048,
    batch_per_device: int = 1,
    frames_in_pool: int = 64,
    resume: bool = True,
    log_every: int = 20,
    ckpt_every_epochs: int = 10,
    render_hw=(480, 640),
    dino_extractor=None,
    records: str = None,
    progress=print,
    vit_cfg=None,
    e2e_stride: int = 8,
    e2e_out_size: int = 256,
    backbone_lr_scale: float = 1.0,
):
    """Train one branch for one category. Returns the final TrainState.

    Frame pool: rendering is host-orchestrated and slower than the train step,
    so a pool of `frames_in_pool` frames is pre-generated and refreshed
    incrementally — the analog of the reference's 100-dump-per-model replay
    buffer (dataset.py:341-364), but regenerated online. Alternatively pass
    `records` (a container written by data/records.py::dump_frames) to replay
    a pre-generated dataset through the native mmap reader — the exact analog
    of the reference's ShapeNetExportDataset.
    """
    cat = CATEGORIES[category]
    cfg = cfg or TrainConfig(n_points=n_points)
    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    batch_size = batch_per_device * n_dev

    gen = SyntheticFrameGenerator(
        cat, n_max=n_points, height=render_hw[0], width=render_hw[1],
        seed=cfg.seed,
    )
    vit_model = None
    if branch == "shot":
        model = ShotBranch(tuple_size=cat.tuple_size, num_bins=cfg.num_bins)
        feat_keys = ("shot", "normal")
    elif branch == "dino-e2e":
        # end-to-end visual: train a compact ViT backbone THROUGH the tuple
        # loss (no frozen extractor; the reference has no such capability —
        # its backbone is a frozen torch.hub DINOv2, dataset.py:62-80)
        import dataclasses as _dc

        from cppf2_tpu.models.dinov2 import VIT_S14, DinoViT

        model = DinoBranch(tuple_size=cat.tuple_size, num_bins=cfg.num_bins)
        feat_keys = ("crop", "kp")
        if vit_cfg is None:
            # pos-embed grid = the training token grid: no bicubic resample
            # inside every forward, and eval at the same crop/stride matches
            vit_cfg = _dc.replace(
                VIT_S14, pretrain_grid=e2e_out_size // e2e_stride
            )
        vit_model = DinoViT(vit_cfg)
    else:
        model = DinoBranch(tuple_size=cat.tuple_size, num_bins=cfg.num_bins)
        feat_keys = ("desc",)
        if dino_extractor is None:
            # no DINOv2 checkpoint in this environment: a randomly initialized
            # (but fixed) backbone still yields consistent train/eval features
            from cppf2_tpu.models.dinov2 import DinoFeatureExtractor

            progress("[train] no DINOv2 params given — using a fixed random backbone")
            dino_extractor = DinoFeatureExtractor()
            dino_extractor.init_random(hw=(256, 256), seed=cfg.seed)

    keys = ("pc", "pc_canon", "bound", "count") + feat_keys

    def to_batch(frames):
        return {k: jnp.asarray(np.stack([f[k] for f in frames])) for k in keys}

    def frame_np():
        f = gen.next_frame()
        out = {
            "pc": np.asarray(f.pc), "pc_canon": np.asarray(f.pc_canon),
            "bound": np.asarray(f.bound), "count": np.int32(f.count),
        }
        if branch == "shot":
            out["shot"] = np.asarray(f.shot)
            out["normal"] = np.asarray(f.normal)
        elif branch == "dino-e2e":
            out["crop"], out["kp"] = _frame_crop_kp(f, e2e_out_size)
        else:
            # this CLI pool batches via np.stack — fetch once here
            out["desc"] = np.asarray(_frame_descriptors(f, dino_extractor))
        return out

    reader = None
    if records:
        from cppf2_tpu.data.records import RecordReader

        reader = RecordReader(records)
        progress(f"[train] replaying {len(reader)} records from {records} "
                 f"({reader.backend} backend)")
        pool = [
            {k: v[0] for k, v in reader.batch([i]).items()}
            for i in range(min(frames_in_pool, len(reader)))
        ]
    else:
        progress(f"[train] filling frame pool ({frames_in_pool})...")
        pool = [frame_np() for _ in range(frames_in_pool)]

    i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
    f0 = pool[0]
    if branch == "dino-e2e":
        from cppf2_tpu.train.visual import (
            create_visual_train_state,
            make_visual_train_step,
        )

        state = create_visual_train_state(
            vit_model, model, cfg, jax.random.key(cfg.seed),
            out_size=e2e_out_size, stride=e2e_stride,
        )
    else:
        if branch == "shot":
            example = (jnp.asarray(f0["pc"]), jnp.asarray(f0["shot"]),
                       jnp.asarray(f0["normal"]), i0)
        else:
            example = (jnp.asarray(f0["pc"]), jnp.asarray(f0["desc"]), i0)
        state = create_train_state(model, example, cfg, jax.random.key(cfg.seed))
    if out_dir and resume:
        last = latest_checkpoint(out_dir)
        if last:
            state = restore_checkpoint(last, state)
            progress(f"[train] resumed from {last} at step {int(state.step)}")

    if branch == "dino-e2e":
        step_fn = make_visual_train_step(
            vit_model, model, cfg, out_size=e2e_out_size, stride=e2e_stride,
            backbone_lr_scale=backbone_lr_scale,
        )
    else:
        step_fn = make_train_step(model, cfg, branch=branch)
    state = replicate(state, mesh)
    log_path = os.path.join(out_dir, "metrics.jsonl") if out_dir else None
    if log_path:
        os.makedirs(out_dir, exist_ok=True)

    rng = np.random.default_rng(cfg.seed + 1)
    t0 = time.time()
    start_epoch = int(state.step) // cfg.steps_per_epoch
    for epoch in range(start_epoch, cfg.max_epochs):
        for it in range(cfg.steps_per_epoch):
            picks = rng.choice(len(pool), size=batch_size)
            batch = shard_batch(to_batch([pool[i] for i in picks]), mesh)
            state, metrics = step_fn(
                state, batch, jax.random.key(int(rng.integers(0, 2**31)))
            )
            # refresh one pool frame per step (host render overlaps device
            # step; for record replay, swap in another stored record)
            slot = int(rng.integers(0, len(pool)))
            if reader is not None:
                rid = int(rng.integers(0, len(reader)))
                pool[slot] = {k: v[0] for k, v in reader.batch([rid]).items()}
            else:
                pool[slot] = frame_np()
            s = int(state.step)
            if s % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m |= {"step": s, "epoch": epoch, "wall": time.time() - t0}
                progress(f"[train] {json.dumps(m)}")
                if log_path:
                    with open(log_path, "a") as fh:
                        fh.write(json.dumps(m) + "\n")
        if out_dir and ((epoch + 1) % ckpt_every_epochs == 0 or epoch + 1 == cfg.max_epochs):
            path = save_checkpoint(out_dir, jax.device_get(state))
            progress(f"[train] saved {path}")
    if branch == "dino-e2e" and out_dir:
        # ship the pair of artifacts the eval side consumes: the tuple head
        # as the standard branch params.msgpack (load_category_models) and
        # the backbone as backbone.msgpack(+json) for DinoFeatureExtractor
        from cppf2_tpu.models.dinov2 import save_backbone
        from cppf2_tpu.train.checkpoints import export_params_msgpack

        host = jax.device_get(state)
        export_params_msgpack(
            os.path.join(out_dir, "params.msgpack"), host.params["branch"]
        )
        bb = save_backbone(
            os.path.join(out_dir, "backbone"), host.params["backbone"],
            vit_cfg, stride=e2e_stride, out_size=e2e_out_size,
        )
        progress(f"[train] exported branch params.msgpack + {bb}")
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--category", required=True, choices=list(CATEGORIES))
    ap.add_argument("--branch", default="shot",
                    choices=["shot", "dino", "dino-e2e"])
    ap.add_argument("--epochs", type=int, default=101)
    ap.add_argument("--steps-per-epoch", type=int, default=200)
    ap.add_argument("--n-points", type=int, default=2048)
    ap.add_argument("--tuples", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--records", default=None,
                    help="replay a data/records.py container instead of rendering")
    ap.add_argument("--backbone-lr-scale", type=float, default=1.0,
                    help="dino-e2e only: scale backbone grads vs the head "
                         "(<1 damps the from-scratch ViT if the MLP LR is "
                         "too hot for it)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    cfg = TrainConfig(
        lr=args.lr, max_epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        tuples_per_step=args.tuples, n_points=args.n_points, seed=args.seed,
    )
    out = args.out or f"ckpts/{args.branch}/{args.category}"
    train_category(args.category, args.branch, cfg, out, n_points=args.n_points,
                   records=args.records,
                   backbone_lr_scale=args.backbone_lr_scale)


if __name__ == "__main__":
    main()
