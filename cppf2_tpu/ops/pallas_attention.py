"""Pallas TPU multi-head attention for the DINOv2 ViT.

Why: at ViT-L/stride-4 scale (h=16, T=4097, hd=64) the XLA attention path
materializes (h, T, T) bf16 logits/exp tensors in HBM — 537 MB each, ~4.1
ms/layer, 99 of the 117 ms ViT forward measured on v5e (xplane trace). XLA
cannot fuse a transcendental into a dot operand, so chunking in plain JAX
reduces peak memory but not traffic.

Here one (head, query-block) grid step holds the head's ENTIRE K and V in
VMEM (T_pad*64*2B ~ 0.56 MB each), computes the full logits row block
(BQ, T_pad) f32 in VMEM, softmaxes in-register, and writes only the (BQ, hd)
output — HBM traffic per layer drops from ~1.6 GB to ~34 MB. No online
softmax needed: a single pass sees every key.

Inference-only (no grad), no masking beyond key-padding, which is exactly the
ViT use case (frozen backbone).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def auto_block_q(t: int) -> int:
    """Largest query block from the lane-friendly set that divides `t`
    (so the kernel adds no padding of its own); 128 if none divides — the
    kernel then pads to the next 128 multiple, the cheapest residual.

    Candidates are capped so the kernel's two (BQ, T) f32 buffers (logits +
    exp) stay within ~8 MB of VMEM: BQ * T * 8 bytes <= 2^23 — at T=4096 a
    512 block would need ~16.8 MB and Mosaic fails the compile."""
    for b in (512, 384, 256, 128):
        if t % b == 0 and b * t * 8 <= (1 << 23):
            return b
    return 128


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int):
    # q: (1, BQ, hd) bf16 (pre-scaled); k/v: (1, T_pad, hd) bf16
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, T_pad) f32
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < t_real, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        e.astype(jnp.bfloat16), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, hd) f32
    o_ref[0] = (pv / s).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret", "t_real", "out_dtype")
)
def mha_pallas(
    q: jax.Array,   # (h, T, hd) — pre-scaled by 1/sqrt(hd)
    k: jax.Array,   # (h, T, hd)
    v: jax.Array,   # (h, T, hd)
    block_q: int = 256,
    interpret: bool = False,
    t_real: int = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Full-softmax attention; returns (h, T, hd) in `out_dtype`.

    `t_real` marks the number of real tokens when the caller already padded T
    (DinoViT pads the token axis ONCE for the whole 24-layer stack — per-layer
    pads/slices cost ~4 ms of pure layout traffic at ViT-L scale); keys at or
    beyond `t_real` are masked out, padded query rows produce garbage the
    caller slices off.
    """
    h, t, hd = q.shape
    if t_real is None:
        t_real = t
    t_pad = -(-t // block_q) * block_q
    pad = t_pad - t
    qb = jnp.pad(q.astype(jnp.bfloat16), ((0, 0), (0, pad), (0, 0)))
    kb = jnp.pad(k.astype(jnp.bfloat16), ((0, 0), (0, pad), (0, 0)))
    vb = jnp.pad(v.astype(jnp.bfloat16), ((0, 0), (0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_mha_kernel, t_real=t_real),
        out_shape=jax.ShapeDtypeStruct((h, t_pad, hd), out_dtype),
        grid=(h, t_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda hh, i: (hh, i, 0)),
            # whole K/V per head; index depends only on the head, so the
            # pipeline re-uses the resident copy across query blocks
            pl.BlockSpec((1, t_pad, hd), lambda hh, i: (hh, 0, 0)),
            pl.BlockSpec((1, t_pad, hd), lambda hh, i: (hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda hh, i: (hh, i, 0)),
        interpret=interpret,
    )(qb, kb, vb)
    return out[:, :t, :]
