"""Pallas TPU kernels for the vote-accumulation hot ops.

Two accumulation patterns dominate the inference graph after the pyramid
re-design (ops/voting.py):

  * `hist16_pallas` — joint 16^3 histogram of quantized votes. The XLA
    formulation materializes (V, 16) and (V, 256) one-hot operands in HBM
    (~0.5 GB of traffic at eval scale); the kernel builds them per-chunk in
    VMEM, contracts on the MXU, and keeps the (16, 256) accumulator in VMEM
    scratch across the grid — HBM traffic drops to the vote ids themselves.

  * `sphere_accumulate_pallas` — weighted thresholded-cosine accumulation
    over the fibonacci sphere (eval.py:37-51 semantics), fusing the cosine
    matmul, threshold compare, weight multiply and reduction per chunk.

Status: both kernels are numerically exact vs the XLA formulations
(scripts/pallas_parity.py), but on this v5e-via-relay environment a fixed
~0.5 ms per grid step makes them 5-15x *slower* than XLA's fused one-hot
matmuls, whose HBM traffic the hardware already streams at full bandwidth.
The production voting path (ops/voting.py) therefore uses the XLA
formulations; these kernels are kept as the drop-in fused alternative for
hardware where the tradeoff flips, with the parity script as the gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 16
_CHUNK = 4096


def _hist16_kernel(ids_ref, ok_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    ids = ids_ref[:, :]          # (C, 4): x, y, z, pad
    ok = ok_ref[:, :]            # (C, 1) float mask
    x = ids[:, 0:1]
    yz = ids[:, 1:2] * _G + ids[:, 2:3]
    ar16 = jax.lax.broadcasted_iota(jnp.int32, (1, _G), 1)
    ar256 = jax.lax.broadcasted_iota(jnp.int32, (1, _G * _G), 1)
    x1h = (x == ar16).astype(jnp.bfloat16) * ok.astype(jnp.bfloat16)
    yz1h = (yz == ar256).astype(jnp.bfloat16)
    acc_ref[:, :] += jax.lax.dot_general(
        x1h, yz1h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def hist16_pallas(ids3: jax.Array, ok: jax.Array, interpret: bool = False) -> jax.Array:
    """16^3 histogram: ids3 (V, 3) int32 in [0, 16), ok (V,) bool -> (16, 256)."""
    v = ids3.shape[0]
    chunk = min(_CHUNK, v)
    num = -(-v // chunk)
    pad = num * chunk - v
    ids_p = jnp.pad(ids3, ((0, pad), (0, 1)))            # (V', 4)
    ok_p = jnp.pad(ok.astype(jnp.float32), (0, pad))[:, None]

    return pl.pallas_call(
        _hist16_kernel,
        grid=(num,),
        in_specs=[
            pl.BlockSpec((chunk, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_G, _G * _G), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_G, _G * _G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_G, _G * _G), jnp.float32)],
        interpret=interpret,
    )(ids_p, ok_p)


def _sphere_kernel(thresh_ref, dirs_ref, w_ref, sph_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    cos = jax.lax.dot_general(
        dirs_ref[:, :], sph_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (C, S)
    hits = (cos > thresh_ref[0]).astype(jnp.float32) * w_ref[:, :]
    acc_ref[:, :] += jnp.sum(hits, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def sphere_accumulate_pallas(
    dirs: jax.Array,       # (V, 3) unit candidate directions
    weights: jax.Array,    # (V,)
    sphere_pts: jax.Array, # (S, 3)
    angle_tol_deg: float,
    interpret: bool = False,
) -> jax.Array:
    """counts[s] = sum_v w_v * [dirs_v . sph_s > cos(2 tol)] -> (S,)."""
    v = dirs.shape[0]
    s = sphere_pts.shape[0]
    s_pad = -(-s // 128) * 128
    # VMEM budget: the (chunk, s_pad) cosine block dominates; keep under ~6 MB
    chunk = min(2048, v)
    num = -(-v // chunk)
    pad = num * chunk - v
    dirs_p = jnp.pad(dirs, ((0, pad), (0, 5)))           # (V', 8)
    w_p = jnp.pad(weights.astype(jnp.float32), (0, pad))[:, None]
    sph_p = jnp.pad(sphere_pts.T, ((0, 5), (0, s_pad - s)))  # (8, S')
    thresh = jnp.array([jnp.cos(2 * angle_tol_deg / 180.0 * jnp.pi)], jnp.float32)

    counts = pl.pallas_call(
        _sphere_kernel,
        grid=(num,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, s_pad), jnp.float32)],
        interpret=interpret,
    )(thresh, dirs_p, w_p, sph_p)
    return counts[0, :s]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
