"""Sim-to-real on the reference's example capture: train on the provided YCB
mesh, pose the real RGB-D frame.

The framework analog of train_custom.ipynb cells 4-13: render synthetic views
of example_data/obj_000015.ply (full SO(3)), train the SHOT branch, then run
the real frame (YCB-V intrinsics, depth/10000) through the inference path and
write the pose overlay.

    python examples/sim2real_ycb.py --steps 20000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from cppf2_tpu.config import CategoryConfig, PipelineConfig, TrainConfig
from cppf2_tpu.core.geometry import fibonacci_sphere
from cppf2_tpu.data.shapes import load_ply
from cppf2_tpu.data.synthetic import SyntheticFrameGenerator
from cppf2_tpu.infer.frontend import preprocess_frame
from cppf2_tpu.infer.pipeline import estimate_pose_branch
from cppf2_tpu.models import ShotBranch
from cppf2_tpu.train import create_train_state
from cppf2_tpu.train.loop import make_train_step
from cppf2_tpu.utils.viz import draw_pose_overlay

EXAMPLE = "/root/reference/example_data"
# YCB-V camera (train_custom.ipynb cell 11)
YCBV_K = np.array(
    [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]], np.float32
)


def main(steps=20000, n_points=4096, out="predictions/sim2real"):
    v, f = load_ply(os.path.join(EXAMPLE, "obj_000015.ply"))
    v = v * 0.001                      # mm -> m (notebook cell 4)
    v = v - (v.max(0) + v.min(0)) / 2  # center
    ext = float((v.max(0) - v.min(0)).max())
    mesh = ((v / ext).astype(np.float32), f)   # canonical: max extent 1
    cat = CategoryConfig("custom", 0, scale_range=(ext, ext))
    print(f"[sim2real] mesh extent {ext*100:.1f} cm, {len(v)} verts")

    gen = SyntheticFrameGenerator(cat, n_max=n_points, full_rot=True, shot_k=48, seed=0)
    pool = [gen.next_frame(mesh=mesh) for _ in range(100)]
    print("[sim2real] rendered 100 training frames")

    cfg = TrainConfig(tuples_per_step=8192, n_points=n_points)
    model = ShotBranch(tuple_size=cat.tuple_size)
    f0 = pool[0]
    i0 = jnp.zeros((8, cat.tuple_size), jnp.int32)
    state = create_train_state(model, (f0.pc, f0.shot, f0.normal, i0), cfg, jax.random.key(0))
    step = make_train_step(model, cfg, branch="shot")
    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(steps):
        fr = pool[int(rng.integers(0, len(pool)))]
        batch = {"pc": fr.pc[None], "pc_canon": fr.pc_canon[None], "shot": fr.shot[None],
                 "normal": fr.normal[None], "bound": fr.bound[None],
                 "count": jnp.int32(fr.count)[None]}
        state, metrics = step(state, batch, jax.random.key(i))
    print(f"[sim2real] {steps} steps in {time.time()-t0:.0f}s, loss {float(metrics['total']):.3f}")

    # --- the real frame
    import cv2

    rgb = cv2.imread(os.path.join(EXAMPLE, "rgb.png"))[:, :, ::-1]
    depth = cv2.imread(os.path.join(EXAMPLE, "depth.png"), -1).astype(np.float32) / 10000.0
    mask = cv2.imread(os.path.join(EXAMPLE, "mask.png"), -1)
    mask = (mask > 0) if mask.ndim == 2 else mask.sum(-1) > 0

    pipe = PipelineConfig(n_points=n_points, num_pairs=20000)
    fi = preprocess_frame(
        jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(YCBV_K),
        jax.random.key(1), res=cat.res, n_max=n_points, shot_k=48,
    )
    print(f"[sim2real] real cloud: {int(fi.count)} points")
    sphere = jnp.asarray(fibonacci_sphere(pipe.sphere_samples))
    u = jax.random.uniform(jax.random.key(2), (pipe.num_pairs, cat.tuple_size))
    ti = jnp.floor(u * fi.count).astype(jnp.int32)

    def shot_apply(params, points, tidx):
        return model.apply(params, points, fi.shot, fi.normal, tidx)

    est = estimate_pose_branch(
        shot_apply, state.params, fi.pc, fi.valid, fi.count, ti,
        jax.random.key(3), cat, pipe, sphere, run_opt=True,
    )
    rt = np.eye(4)
    rt[:3, :3] = np.asarray(est.rotation) * float(est.scale_norm)
    rt[:3, 3] = np.asarray(est.translation)
    scales = np.asarray(est.scale) / float(est.scale_norm)
    pc_host = np.asarray(fi.pc)[np.asarray(fi.valid)]
    centroid = pc_host.mean(0)
    print(f"[sim2real] T = {rt[:3,3]}  (cloud centroid {centroid})")
    print(f"[sim2real] predicted bound = {np.asarray(est.scale)*100} cm (mesh {((v.max(0)-v.min(0))*100)} cm)")
    print(f"[sim2real] recon loss = {float(est.loss):.4f}")

    os.makedirs(out, exist_ok=True)
    overlay = draw_pose_overlay(rgb, rt, scales, YCBV_K)
    cv2.imwrite(os.path.join(out, "overlay.png"), overlay[:, :, ::-1])
    np.savez(os.path.join(out, "pose.npz"), RT=rt, scales=scales)
    print(f"[sim2real] overlay -> {out}/overlay.png")
    return rt, scales, float(est.loss)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    args = ap.parse_args()
    main(steps=args.steps)
