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
    from jax.experimental.shard_map import shard_map

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

    counts = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None)),
        out_specs=P(),
    )(dirs, weights, sphere_pts)
    best = jnp.argmax(counts)
    return sphere_pts[best], counts[best]
