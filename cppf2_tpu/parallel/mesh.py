"""Device-mesh parallelism utilities.

The reference is strictly single-GPU (SURVEY.md §2.8: no DP/TP/PP/EP anywhere);
this framework's scaling axes on TPU are:

  * data parallelism over ICI for training — frames sharded over the mesh
    'data' axis, gradients psum'd by GSPMD (train/loop.py);
  * tuple-sharded voting for inference — an instance's 50k-tuple workload
    split over chips, with vote accumulators combined by psum (the honest TPU
    analog of a "communication backend" for this pipeline);
  * embarrassingly-parallel eval over images across chips/slices.

TP/PP are intentionally absent: the models are ~1M-param MLPs; the scale axis
is vote count and batch, not parameter count.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_slice_mesh(n_slices: int = 2, chips_per_slice: int = 4) -> Mesh:
    """Two-level (slice, chip) mesh for multi-pod scaling.

    Axis layout follows the DCN-outer convention (scaling-book recipe): the
    leading `dcn` axis crosses slices (slow interconnect — only image-level,
    embarrassingly-parallel work should shard over it), the trailing `data`
    axis stays within a slice (ICI — tuple/vote collectives ride here).
    On real hardware, device order from `jax.devices()` already groups chips
    by slice, so reshaping to (n_slices, chips_per_slice) puts each row's
    collectives on ICI.
    """
    n = n_slices * chips_per_slice
    devs = jax.devices()
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]).reshape(n_slices, chips_per_slice),
                ("dcn", "data"))


def image_sharded_tuple_vote(
    dirs_b: jax.Array,      # (B, V, 3) per-image candidate directions
    weights_b: jax.Array,   # (B, V)
    sphere_pts: jax.Array,  # (S, 3)
    angle_tol_deg: float,
    mesh: Mesh,
):
    """Two-level sharded sphere vote: images over the slow `dcn` axis, each
    image's vote workload over the fast `data` (ICI) axis.

    The psum reduces over `data` ONLY — no collective crosses the DCN axis
    (each slice owns its images outright), which is exactly the layout rule
    for multi-slice scaling: DCN carries independent work, ICI carries
    reductions. Returns ((B, 3) best dirs, (B,) counts).
    """
    def local(d, w, sph):
        # d: (B/n_dcn, V/n_data, 3); w: (B/n_dcn, V/n_data)
        thresh = jnp.cos(2 * angle_tol_deg / 180.0 * jnp.pi)
        cos = jnp.einsum(
            "bvc,sc->bvs", d, sph, preferred_element_type=jnp.float32
        )
        hits = (cos > thresh).astype(jnp.float32)
        part = jnp.einsum(
            "bv,bvs->bs", w.astype(jnp.float32), hits,
            preferred_element_type=jnp.float32,
        )
        return jax.lax.psum(part, "data")

    counts = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dcn", "data", None), P("dcn", "data"), P(None, None)),
        out_specs=P("dcn", None),
    )(dirs_b, weights_b, sphere_pts)
    best = jnp.argmax(counts, axis=-1)
    return sphere_pts[best], jnp.take_along_axis(counts, best[:, None], -1)[:, 0]


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place a batch pytree with the leading (frame) axis sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def tuple_sharded_sphere_vote(
    dirs: jax.Array,        # (V, 3) candidate directions, V divisible by mesh size
    weights: jax.Array,     # (V,)
    sphere_pts: jax.Array,  # (S, 3)
    angle_tol_deg: float,
    mesh: Mesh,
    axis: str = "data",
):
    """Sphere accumulation with the vote axis sharded over the mesh.

    Each device counts its shard of votes against the (replicated) sphere and
    the partial counts are reduced with a psum over ICI — the pattern to scale
    a single instance's vote workload beyond one chip.
    """
    def local(d, w, sph):
        thresh = jnp.cos(2 * angle_tol_deg / 180.0 * jnp.pi)
        cos = jax.lax.dot_general(
            d, sph, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        hits = (cos > thresh).astype(jnp.float32)
        part = jax.lax.dot_general(
            w.astype(jnp.float32)[None, :], hits, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        return jax.lax.psum(part, axis)

    counts = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None)),
        out_specs=P(),
    )(dirs, weights, sphere_pts)
    best = jnp.argmax(counts)
    return sphere_pts[best], counts[best]
