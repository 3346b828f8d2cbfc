"""DINOv2 ViT in flax + feature interpolation at keypoints.

JAX re-implementation of the frozen visual backbone the reference pulls from
torch.hub (`dinov2_vitl14`, dataset.py:62-80) and its bilinear patch-token
sampling (`interpolate_features`, dataset.py:40-59, F.grid_sample semantics
with align_corners=False).

Weights: `port_torch_state_dict` maps an official DINOv2 checkpoint
state_dict (torch) onto these modules. No network egress exists in this
environment, so checkpoints must be provided on disk; with none present the
model runs with random weights (pipeline-correct, not feature-accurate) —
gate on `load_dinov2_params(path)`.

Architecture (ViT-L/14, no registers): 14x14 conv patch embed -> cls token +
interpolated pos embed -> 24 pre-norm blocks (MHA 16 heads + LayerScale,
MLP 4x + LayerScale) -> final LayerNorm; `forward_features` returns the normed
patch tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-5
    # position-embed grid of the pretrained checkpoint (518/14 = 37)
    pretrain_grid: int = 37
    # compute dtype: bf16 keeps matmuls on the MXU fast path; params stay f32
    compute_dtype: str = "bfloat16"
    # attention implementation: "hbm" materializes (T, T) logits in bf16;
    # "chunked" streams key/value blocks with an online softmax (flash-style
    # in plain XLA; reduces peak memory, not traffic — measured slower);
    # "pallas" is the fused VMEM-resident kernel (ops/pallas_attention.py)
    # that avoids the (T, T) HBM tensors entirely
    attn_impl: str = "hbm"
    attn_chunk: int = 512
    # pallas kernel query-block rows; 0 = auto (pad the token axis to the
    # nearest 128 multiple and pick the largest dividing block — at stride 8
    # the fixed 256 block forces T 1025 -> 1280 and the WHOLE stack's
    # qkv/proj/mlp matmuls run 12% fat; auto pads 1025 -> 1152 with bq=384)
    attn_block_q: int = 256
    # linear-layer quantization: "none" keeps bf16 matmuls; "int8" runs the
    # qkv/proj/mlp contractions as W8A8 (per-channel weight scales x
    # per-token activation scales) on the MXU's 2x int8 path — weights must
    # first pass through `quantize_vit_params` (DinoFeatureExtractor does
    # this automatically). Attention stays bf16.
    quant: str = "none"


VIT_L14 = ViTConfig()
VIT_S14 = ViTConfig(embed_dim=384, depth=12, num_heads=6)
VIT_B14 = ViTConfig(embed_dim=768, depth=12, num_heads=12)


class _QDense(nn.Module):
    """Dense layer with an optional W8A8 int8 fast path.

    Param layout matches `nn.Dense` ({kernel, bias}) plus a `qscale`
    per-output-channel dequant scale, so ported f32 checkpoints drop in and
    `quantize_vit_params` converts them in place (kernel -> int8, qscale ->
    max|w|/127 per column). At apply time the path is chosen by the kernel's
    dtype: int8 kernels run a dynamic per-token activation quant and an
    int8 x int8 -> int32 MXU contraction (2x the bf16 rate on v5e);
    anything else falls back to the plain bf16 matmul.
    """

    features: int
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d_in, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        qscale = self.param(
            "qscale", nn.initializers.ones, (self.features,), jnp.float32
        )
        dt = jnp.dtype(self.cfg.compute_dtype)
        if kernel.dtype == jnp.int8:
            ax = (
                jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
                / 127.0
            )
            ax = jnp.maximum(ax, 1e-12)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / ax), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, kernel, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (
                y.astype(jnp.float32) * ax * qscale[None, :] + bias
            ).astype(dt)
        return (x.astype(dt) @ kernel.astype(dt)) + bias.astype(dt)


def quantize_vit_params(variables, cfg: ViTConfig = VIT_L14):
    """Convert a DinoViT param tree to the int8 W8A8 layout in place.

    Every transformer Dense kernel (qkv/proj/mlp_fc1/mlp_fc2) becomes an int8
    matrix with a per-output-channel `qscale = max|w_col| / 127`; LayerNorm,
    LayerScale, patch embed and embeddings stay as they are. Use with a
    `ViTConfig(quant="int8")` model.
    """
    import copy

    variables = copy.deepcopy(jax.device_get(variables))
    params = variables["params"]

    def q(dense):
        # stacked block layout: kernel (depth, d_in, d_out), per-layer
        # per-output-channel scales (depth, d_out)
        w = np.asarray(dense["kernel"], np.float32)
        s = np.maximum(np.abs(w).max(axis=1), 1e-12) / 127.0
        dense["kernel"] = np.clip(np.round(w / s[:, None, :]), -127, 127).astype(
            np.int8
        )
        dense["qscale"] = s.astype(np.float32)

    blk = params["blocks"]
    q(blk["attn"]["qkv"])
    q(blk["attn"]["proj"])
    q(blk["mlp_fc1"])
    q(blk["mlp_fc2"])
    return variables


class _Attention(nn.Module):
    """Multi-head self-attention tuned for this chip.

    `jax.nn.dot_product_attention` costs ~17.5 ms/layer at T=4097 (f32 logits
    materialized, ~3 GB of HBM traffic); Pallas flash attention is slower
    still through the axon relay (~16 ms/layer, per-grid-step overhead). This
    formulation measures ~6 ms/layer: logits and exp() live in HBM as bf16,
    reductions run in f32, and the softmax denominator divides the (T, D)
    output after the PV matmul instead of the (T, T) weight matrix — halving
    traffic on the largest tensors without touching the math.
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, t_real=None):
        d = self.cfg.embed_dim
        h = self.cfg.num_heads
        hd = d // h
        t = x.shape[0]
        dt = jnp.dtype(self.cfg.compute_dtype)
        if self.cfg.quant == "int8":
            qkv = _QDense(3 * d, self.cfg, name="qkv")(x)
        else:
            qkv = nn.Dense(3 * d, name="qkv", dtype=dt)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        qh = (q * (1.0 / np.sqrt(hd))).reshape(t, h, hd).transpose(1, 0, 2)
        kh = k.reshape(t, h, hd).transpose(1, 0, 2)
        vh = v.reshape(t, h, hd).transpose(1, 0, 2)

        if self.cfg.attn_impl == "pallas":
            from cppf2_tpu.ops.pallas_attention import auto_block_q, mha_pallas
            from cppf2_tpu.ops.pallas_kernels import on_tpu

            o = mha_pallas(
                qh, kh, vh,
                block_q=self.cfg.attn_block_q or auto_block_q(t),
                interpret=not on_tpu(), t_real=t_real, out_dtype=dt,
            )
        elif self.cfg.attn_impl == "chunked":
            o = _chunked_attention(qh, kh, vh, self.cfg.attn_chunk, dt)
        else:
            logits = jnp.einsum("htd,hsd->hts", qh, kh, preferred_element_type=dt)
            m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
            e = jnp.exp((logits - m).astype(jnp.float32)).astype(dt)
            s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            o = jnp.einsum("hts,hsd->htd", e, vh, preferred_element_type=jnp.float32) / s
        out = o.transpose(1, 0, 2).reshape(t, d).astype(dt)
        if self.cfg.quant == "int8":
            return _QDense(d, self.cfg, name="proj")(out)
        return nn.Dense(d, name="proj", dtype=dt)(out)


def _chunked_attention(qh, kh, vh, chunk: int, dt):
    """Online-softmax attention over key/value chunks (flash-style, plain XLA).

    qh/kh/vh: (h, T, hd); returns (h, T, hd) f32. Each scan step touches one
    (h, T, chunk) logit block instead of the full (h, T, T) tensor, so peak
    HBM residency drops from O(T^2) to O(T * chunk) while the running
    max/sum/accumulator stay f32.
    """
    h, t, hd = kh.shape
    pad = (-t) % chunk
    if pad:
        kp = jnp.pad(kh, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(vh, ((0, 0), (0, pad), (0, 0)))
    else:
        kp, vp = kh, vh
    n_chunks = kp.shape[1] // chunk
    kc = kp.reshape(h, n_chunks, chunk, hd).transpose(1, 0, 2, 3)
    vc = vp.reshape(h, n_chunks, chunk, hd).transpose(1, 0, 2, 3)
    # padded keys must not receive weight: mask their logits to -inf
    valid = (jnp.arange(n_chunks * chunk) < t).reshape(n_chunks, chunk)

    def step(carry, kv):
        m_run, s_run, o_run = carry
        k_blk, v_blk, valid_blk = kv
        logits = jnp.einsum(
            "htd,hsd->hts", qh, k_blk, preferred_element_type=jnp.float32
        )
        logits = jnp.where(valid_blk[None, None, :], logits, -jnp.inf)
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_run, m_blk)
        scale = jnp.exp(m_run - m_new)
        e = jnp.exp(logits - m_new).astype(dt)
        s_new = s_run * scale + jnp.sum(e.astype(jnp.float32), -1, keepdims=True)
        pv = jnp.einsum("hts,hsd->htd", e, v_blk, preferred_element_type=jnp.float32)
        o_new = o_run * scale + pv
        return (m_new, s_new, o_new), None

    m0 = jnp.full((h, t, 1), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((h, t, 1), jnp.float32)
    o0 = jnp.zeros((h, t, hd), jnp.float32)
    (m_f, s_f, o_f), _ = jax.lax.scan(step, (m0, s0, o0), (kc, vc, valid))
    return o_f / s_f


class _Block(nn.Module):
    """One transformer block, shaped for `nn.scan` (returns a (carry, y)
    pair): the whole depth-24 stack compiles as ONE scanned block with
    stacked params instead of 24 unrolled clones. That keeps a single copy
    of the block HLO (and of the Pallas attention custom-call payload) in
    the serialized module — ~24x smaller programs, much faster remote
    compiles, and the combined ViT+pose graph stays under the relay's
    compile-request size cap."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, t_real=None):
        c = self.cfg
        ls1 = self.param(
            "ls1", lambda k: jnp.full((c.embed_dim,), c.layerscale_init, jnp.float32)
        )
        ls2 = self.param(
            "ls2", lambda k: jnp.full((c.embed_dim,), c.layerscale_init, jnp.float32)
        )
        dt = jnp.dtype(c.compute_dtype)
        x = x + ls1 * _Attention(c, name="attn")(
            nn.LayerNorm(name="norm1")(x), t_real
        ).astype(jnp.float32)
        if c.quant == "int8":
            h = _QDense(int(c.embed_dim * c.mlp_ratio), c, name="mlp_fc1")(
                nn.LayerNorm(name="norm2")(x)
            )
            h = _QDense(c.embed_dim, c, name="mlp_fc2")(nn.gelu(h))
        else:
            h = nn.Dense(int(c.embed_dim * c.mlp_ratio), name="mlp_fc1", dtype=dt)(
                nn.LayerNorm(name="norm2")(x)
            )
            h = nn.Dense(c.embed_dim, name="mlp_fc2", dtype=dt)(nn.gelu(h))
        return x + ls2 * h.astype(jnp.float32), None


class DinoViT(nn.Module):
    """forward_features: (H, W, 3) image in [0,1] -> (h/p, w/p, D) patch tokens."""

    cfg: ViTConfig = VIT_L14

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        c = self.cfg
        p = c.patch_size
        gh, gw = img.shape[0] // p, img.shape[1] // p
        x = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = _PatchEmbed(c, name="patch_embed")(x, gh, gw)

        cls_tok = self.param(
            "cls_token", nn.initializers.zeros, (1, c.embed_dim), jnp.float32
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1 + c.pretrain_grid * c.pretrain_grid, c.embed_dim),
            jnp.float32,
        )
        pos_patch = pos[1:].reshape(c.pretrain_grid, c.pretrain_grid, c.embed_dim)
        if (gh, gw) != (c.pretrain_grid, c.pretrain_grid):
            pos_patch = jax.image.resize(
                pos_patch, (gh, gw, c.embed_dim), method="bicubic"
            )
        x = x + pos_patch.reshape(gh * gw, c.embed_dim)
        tokens = jnp.concatenate([cls_tok + pos[:1], x], axis=0)

        # pad the token axis ONCE for the whole stack on the pallas path:
        # per-layer pad/slice of three (h, T, hd) tensors measured ~4 ms of
        # pure layout traffic at ViT-L/T=4097. Padded rows are zeros; they
        # normalize to zeros, are masked out as attention *keys* via t_real,
        # and get sliced off at the end.
        t_real = tokens.shape[0]
        if c.attn_impl == "pallas":
            mult = c.attn_block_q or 128
            t_pad = -(-t_real // mult) * mult
            tokens = jnp.pad(tokens, ((0, t_pad - t_real), (0, 0)))

        blocks = nn.scan(
            _Block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.depth,
            in_axes=nn.broadcast,
        )(c, name="blocks")
        # the residual stream runs in f32 (each block returns f32); the scan
        # carry must be a fixed point, so enter the stack in f32 too
        tokens, _ = blocks(tokens.astype(jnp.float32), t_real)
        tokens = nn.LayerNorm(name="norm")(tokens)
        return tokens[1:t_real].reshape(gh, gw, c.embed_dim)


class _PatchEmbed(nn.Module):
    """Patch embedding as an explicit unfold + matmul.

    Equivalent to the stride-p VALID conv (params keep nn.Conv's
    {kernel (p, p, 3, D), bias} layout so torch porting is unchanged), but
    ~17x faster on this chip: the conv lowering measured 1.8 ms for a
    4.9 GFLOP op (2.8 TFLOP/s), while patch extraction is a pure reshape and
    the contraction is a plain (T, p*p*3) x (p*p*3, D) MXU matmul.
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, gh: int, gw: int):
        c = self.cfg
        p = c.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, 3, c.embed_dim),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c.embed_dim,), jnp.float32
        )
        dt = jnp.dtype(c.compute_dtype)
        patches = (
            x.reshape(gh, p, gw, p, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(gh * gw, p * p * 3)
        )
        w = kernel.reshape(p * p * 3, c.embed_dim)
        return patches.astype(dt) @ w.astype(dt) + bias.astype(dt)


# ---------------------------------------------------------------------------
# Bilinear sampling at keypoints (dataset.py:40-59 semantics)
# ---------------------------------------------------------------------------

def _linear_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, half-pixel centers —
    identical semantics to jax.image.resize(method="bilinear") when
    upscaling (antialias is a no-op for scale >= 1)."""
    src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(src).astype(np.int64)
    t = (src - lo).astype(np.float64)
    w = np.zeros((n_out, n_in))
    rows = np.arange(n_out)
    w[rows, np.clip(lo, 0, n_in - 1)] += 1.0 - t
    w[rows, np.clip(lo + 1, 0, n_in - 1)] += t
    return w.astype(np.float32)


def resize_bilinear_matmul(img: jax.Array, oh: int, ow: int) -> jax.Array:
    """Bilinear upscale as two small separable matmuls (R_h @ img @ R_w^T).

    Matches jax.image.resize(..., method="bilinear") for upscales; expressed
    as dot_generals so the op lands on the MXU instead of whatever gather/
    window lowering the backend picks for the resize HLO. Downscales are
    rejected: there jax.image.resize applies an antialias kernel the two-tap
    matrix silently wouldn't.
    """
    h, w, c = img.shape
    if oh < h or ow < w:
        raise ValueError(
            f"resize_bilinear_matmul is upscale-only ({h}x{w} -> {oh}x{ow}); "
            "use jax.image.resize for downscales (antialias differs)")
    rh = jnp.asarray(_linear_resize_matrix(h, oh))
    rw = jnp.asarray(_linear_resize_matrix(w, ow))
    hi = jax.lax.Precision.HIGHEST  # exactness is cheap at this size
    t1 = jnp.einsum("oh,hwc->owc", rh, img, precision=hi)
    return jnp.einsum("pw,owc->opc", rw, t1, precision=hi)


def interpolate_features(
    feat_grid: jax.Array,   # (gh, gw, D) patch-token grid
    pts_xy: jax.Array,      # (K, 2) pixel coords in the *input image* space
    image_hw: Tuple[int, int],
    stride: int,
    normalize: bool = True,
    impl: str = "gather",
) -> jax.Array:
    """Sample the token grid at keypoint pixel locations.

    Matches torch F.grid_sample(bilinear, align_corners=False) driven through
    the reference's coordinate mapping (dataset.py:46-47): keypoint pixel ->
    normalized by (size * stride) -> grid sample over the (h/stride, w/stride)
    token grid. Out-of-range samples are zero-padded.

    impl="gather" takes the four bilinear taps as row gathers; impl="onehot"
    folds them into ONE (K, gh*gw) combination matrix and a single MXU matmul
    against the flattened grid — row gathers of D=1024 descriptors are
    HBM-unfriendly on this backend while one-hot matmuls are its fastest
    accumulation primitive (CLAUDE.md), same trick as the vote histograms.
    """
    gh, gw, d = feat_grid.shape
    h, w = image_hw
    # normalized in [-1, 1] (pixel-center convention)
    nx = ((pts_xy[:, 0] + 0.5) / w) * 2 - 1
    ny = ((pts_xy[:, 1] + 0.5) / h) * 2 - 1
    # align_corners=False: unnormalize onto the token grid
    fx = ((nx + 1) * gw - 1) / 2
    fy = ((ny + 1) * gh - 1) / 2

    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = fx - x0
    wy = fy - y0

    if impl == "onehot":
        taps = (
            (y0, x0, (1 - wx) * (1 - wy)),
            (y0, x0 + 1, wx * (1 - wy)),
            (y0 + 1, x0, (1 - wx) * wy),
            (y0 + 1, x0 + 1, wx * wy),
        )
        comb = None
        for yy, xx, wt in taps:
            inb = (yy >= 0) & (yy < gh) & (xx >= 0) & (xx < gw)
            # out-of-range taps get index -1 -> an all-zero one-hot row
            idx = jnp.where(inb, yy * gw + xx, -1)
            t = jax.nn.one_hot(idx, gh * gw, dtype=jnp.float32) * wt[:, None]
            comb = t if comb is None else comb + t
        # bf16 operands / f32 accumulation: the bilinear weights are in [0,1]
        # and the result is L2-normalized, so bf16 mantissa error (~4e-3)
        # is far below the bf16 ViT forward's own noise floor
        out = jax.lax.dot_general(
            comb.astype(jnp.bfloat16),
            feat_grid.reshape(gh * gw, d).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        def tap(yy, xx):
            inb = (yy >= 0) & (yy < gh) & (xx >= 0) & (xx < gw)
            val = feat_grid[jnp.clip(yy, 0, gh - 1), jnp.clip(xx, 0, gw - 1)]
            return jnp.where(inb[:, None], val, 0.0)

        out = (
            tap(y0, x0) * ((1 - wx) * (1 - wy))[:, None]
            + tap(y0, x0 + 1) * (wx * (1 - wy))[:, None]
            + tap(y0 + 1, x0) * ((1 - wx) * wy)[:, None]
            + tap(y0 + 1, x0 + 1) * (wx * wy)[:, None]
        )
    if normalize:
        out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
    return out


class DinoFeatureExtractor:
    """Crop-image -> per-keypoint descriptors, the analog of the reference's
    `DINOV2` module (dataset.py:62-80): resize to (h/stride*14, w/stride*14),
    forward, bilinear-sample patch tokens at keypoints, L2-normalize."""

    def __init__(self, params=None, cfg: ViTConfig = None, stride: int = 4,
                 interp_impl: str = "gather", out_size: int = 256):
        if cfg is None:
            # production default: the fused Pallas kernel on TPU (50 ms/crop
            # vs 119 for the HBM path at ViT-L/stride-4); interpret-mode
            # Pallas is slow, so plain XLA off-TPU
            from cppf2_tpu.ops.pallas_kernels import on_tpu

            cfg = dataclasses.replace(
                VIT_L14, attn_impl="pallas" if on_tpu() else "hbm"
            )
        self.cfg = cfg
        self.stride = stride
        self.interp_impl = interp_impl
        self.out_size = out_size  # bbox-square crop resolution (driver path)
        self.model = DinoViT(cfg)
        self.params = self._cast(params)
        self._jit = jax.jit(self._run, static_argnames=("hw",))

    def _cast(self, params):
        """Keep frozen weights in the compute dtype: reading 300M params as
        f32 and casting per forward costs ~100 ms/call on this chip; storing
        kernels in bf16 measured 222 -> 121 ms for the ViT-L forward. 1-D
        params (LayerNorm/LayerScale/biases) stay f32. With quant="int8",
        transformer Dense kernels are quantized once here and left int8."""
        if params is None:
            return params
        if self.cfg.quant == "int8":
            leaves = jax.tree.leaves(params)
            if not any(jnp.dtype(x.dtype) == jnp.int8 for x in leaves):
                params = quantize_vit_params(params, self.cfg)
        if jnp.dtype(self.cfg.compute_dtype) == jnp.float32:
            return params
        dt = jnp.dtype(self.cfg.compute_dtype)
        # Matmul kernels go bf16; LayerNorm/LayerScale/bias vectors stay f32.
        # Leaves under "blocks" carry a leading (depth,) scan axis, so the
        # vector/matrix cutoff there is ndim 3, not 2.
        from jax.tree_util import tree_map_with_path

        def cast(path, x):
            stacked = any(getattr(k, "key", None) == "blocks" for k in path)
            min_ndim = 3 if stacked else 2
            if x.ndim >= min_ndim and jnp.dtype(x.dtype) != jnp.int8:
                return x.astype(dt)
            return x

        return tree_map_with_path(cast, params)

    def init_random(self, hw=(256, 256), seed=0):
        h, w = hw
        ph, pw = h // self.stride, w // self.stride
        img = jnp.zeros((ph * 14, pw * 14, 3), jnp.float32)
        self.params = self._cast(self.model.init(jax.random.key(seed), img))
        return self.params

    def _run(self, params, image, pts_xy, hw):
        h, w = hw
        ph, pw = h // self.stride, w // self.stride
        resized = jax.image.resize(image, (ph * 14, pw * 14, 3), method="bilinear")
        grid = self.model.apply(params, resized)
        return interpolate_features(grid, pts_xy, (h, w), self.stride,
                                    impl=self.interp_impl)

    def __call__(self, image: jax.Array, pts_xy: jax.Array) -> jax.Array:
        """image: (H, W, 3) in [0,1]; pts_xy: (K, 2) crop-pixel coords."""
        assert self.params is not None, "load or init DINOv2 params first"
        return self._jit(self.params, image, pts_xy, tuple(image.shape[:2]))


def masked_window_descriptors(
    model: "DinoViT",
    params,
    rgb: jax.Array,        # (H, W, 3) float in [0,1], full frame
    mask: jax.Array,       # (H, W) bool instance mask
    pixel_yx: jax.Array,   # (n, 2) int image pixels per cloud point
    window_yx: jax.Array,  # (2,) int crop-window origin (FrameInputs.window_yx)
    crop: int = 256,
    stride: int = 4,
    interp_impl: str = "gather",
) -> jax.Array:
    """Fully in-graph visual frontend: window-slice the masked RGB, resize,
    run the ViT, and bilinearly sample patch tokens at the cloud's pixels.

    The jit-fused analog of the host path (`eval/driver.py::estimate_instance`:
    resize_crop + DinoFeatureExtractor), using the *same* bbox-centered
    window `preprocess_frame` used for the depth — so depth, SHOT and
    descriptors come out of ONE compiled program with zero host hops. Unlike
    the reference's bbox-square scaling (dataset.py:322-337) the window is a
    fixed `crop` size, so the object keeps its native pixel scale — a
    DIFFERENT descriptor convention from the training path
    (train/driver.py::_frame_descriptors rescales the bbox to 256). Use
    `bbox_crop_descriptors` when the consumer was trained on rescaled crops
    (every shipped checkpoint); this variant remains for scale-invariant
    profiling of the frontend.
    """
    y0, x0 = window_yx[0], window_yx[1]
    h, w = rgb.shape[:2]
    c = min(crop, h) if isinstance(h, int) else crop
    img = jax.lax.dynamic_slice(rgb, (y0, x0, jnp.int32(0)), (c, min(crop, w), 3))
    m = jax.lax.dynamic_slice(mask, (y0, x0), (c, min(crop, w)))
    img = img * m[..., None]
    ph, pw = img.shape[0] // stride, img.shape[1] // stride
    resized = jax.image.resize(img, (ph * 14, pw * 14, 3), method="bilinear")
    grid = model.apply(params, resized)
    kp_xy = (pixel_yx[:, ::-1] - jnp.stack([x0, y0])[None, :]).astype(jnp.float32)
    return interpolate_features(grid, kp_xy, img.shape[:2], stride,
                                impl=interp_impl)


def _hat_sample_matrix(src_coords: jax.Array, n_src: int) -> jax.Array:
    """(n_dst, n_src) two-tap bilinear sampling matrix at TRACED source
    coordinates: row i holds weights (1-t, t) at floor/ceil of src_coords[i].

    The hat form max(0, 1 - |src - j|) reproduces exactly the two-tap weights
    cv2.warpAffine(INTER_LINEAR) uses, with BORDER_CONSTANT(0) falling out of
    the clipping (out-of-range coords get partial/zero row mass). Shapes are
    static; the coordinates (hence weights) may be traced values — this is
    what lets a bbox-dependent warp live inside one jitted program.
    """
    src = jnp.arange(n_src, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src_coords[:, None] - src[None, :]))


def bbox_crop_descriptors(
    model: "DinoViT",
    params,
    rgb: jax.Array,        # (H, W, 3) float in [0,1], full frame
    mask: jax.Array,       # (H, W) bool instance mask
    pixel_yx: jax.Array,   # (n, 2) int image pixels per cloud point
    out_size: int = 256,
    stride: int = 8,
    interp_impl: str = "gather",
    padding: float = 0.0,
) -> jax.Array:
    """Fully in-graph visual frontend with the reference's bbox-square
    rescale convention (dataset.py:322-337): mask -> bbox -> square crop
    resized to `out_size` -> ViT -> bilinear token sampling at cloud pixels.

    Semantically identical to the host path (`frontend.resize_crop` +
    `DinoFeatureExtractor`) and to the TRAINING descriptor path
    (train/driver.py::_frame_descriptors), so checkpoints trained on rescaled
    crops see in-distribution descriptors — unlike `masked_window_descriptors`
    whose fixed native-scale window changes the object's apparent size. The
    warp is two thin hat-weight matmuls with traced bbox coordinates (static
    shapes; parity vs the cv2.warpAffine host path tested in
    tests/test_dinov2.py::TestBboxCropDescriptors), so a whole frame group
    still batches as ONE vmapped XLA program.
    """
    grid, txys = bbox_crop_token_grid(
        model, params, rgb, mask, out_size=out_size, stride=stride,
        padding=padding,
    )
    return sample_crop_descriptors(
        grid, pixel_yx, txys, out_size=out_size, stride=stride,
        interp_impl=interp_impl,
    )


def bbox_crop_transform(
    mask: jax.Array, out_size: int, padding: float = 0.0
) -> jax.Array:
    """Device-side mask bbox -> square-crop transform (tx, ty, s): crop pixel
    (x, y) samples the image at (s*x + tx, s*y + ty). The bbox/centering
    convention is frontend.resize_crop_transform (reference dataset.py:
    322-337)."""
    h, w = mask.shape
    xs = mask.any(axis=0)
    ys = mask.any(axis=1)
    ix = jnp.arange(w, dtype=jnp.int32)
    iy = jnp.arange(h, dtype=jnp.int32)
    left = jnp.min(jnp.where(xs, ix, w))
    right = jnp.max(jnp.where(xs, ix, -1)) + 1
    top = jnp.min(jnp.where(ys, iy, h))
    bottom = jnp.max(jnp.where(ys, iy, -1)) + 1
    size = jnp.maximum(right - left, bottom - top).astype(jnp.float32)
    size = size * (1.0 + padding)
    cx = (right + left).astype(jnp.float32) / 2.0
    cy = (bottom + top).astype(jnp.float32) / 2.0
    s = size / out_size
    tx = cx - s * (out_size / 2.0)
    ty = cy - s * (out_size / 2.0)
    return jnp.stack([tx, ty, s])


def bbox_crop_token_grid(
    model: "DinoViT",
    params,
    rgb: jax.Array,        # (H, W, 3) float in [0,1], full frame
    mask: jax.Array,       # (H, W) bool instance mask
    out_size: int = 256,
    stride: int = 8,
    padding: float = 0.0,
):
    """The heavy half of `bbox_crop_descriptors`: masked bbox-square warp +
    ViT forward. Returns (token grid (out/stride, out/stride, D), (tx, ty, s)).
    Split out so a frame's instances — across category/tier groups — can batch
    through ONE vmapped ViT program, with the cheap per-cloud sampling
    (`sample_crop_descriptors`) staying in the per-category pose program."""
    h, w = rgb.shape[:2]
    img = rgb * mask[..., None].astype(rgb.dtype)
    txys = bbox_crop_transform(mask, out_size, padding)
    tx, ty, s = txys[0], txys[1], txys[2]
    i = jnp.arange(out_size, dtype=jnp.float32)
    ry = _hat_sample_matrix(s * i + ty, h)          # (out, H)
    rx = _hat_sample_matrix(s * i + tx, w)          # (out, W)
    hi = jax.lax.Precision.HIGHEST
    crop = jnp.einsum("oh,hwc->owc", ry, img, precision=hi)
    crop = jnp.einsum("pw,owc->opc", rx, crop, precision=hi)
    ph = pw = out_size // stride
    resized = resize_bilinear_matmul(crop, ph * 14, pw * 14)
    return model.apply(params, resized), txys


def sample_crop_descriptors(
    grid: jax.Array,        # (out/stride, out/stride, D) token grid
    pixel_yx: jax.Array,    # (n, 2) int image pixels per cloud point
    txys: jax.Array,        # (3,) crop transform from bbox_crop_token_grid
    out_size: int = 256,
    stride: int = 8,
    interp_impl: str = "gather",
) -> jax.Array:
    """The cheap half of `bbox_crop_descriptors`: bilinear token sampling of a
    precomputed crop grid at cloud pixels (reference dataset.py:40-59).

    NOTE: do not try to shrink this by projecting the grid through the DINO
    branch's desc_transform (1024->256) BEFORE sampling: interpolation is
    followed by per-point L2 normalization (reference dataset.py:59 —
    checkpoints are trained on unit descriptors), which does not commute
    with a linear map; border-overflow taps also zero-pad (attenuating the
    would-be bias). An exact projected variant needs per-point ||interp||
    reconstructed from neighbor-Gram channel maps — implement that only if
    a profile shows this sampling stage is actually hot."""
    kp = pixel_yx[:, ::-1].astype(jnp.float32)      # (n, 2) as (x, y)
    kp_local = (kp - txys[None, :2]) / txys[2]
    return interpolate_features(grid, kp_local, (out_size, out_size), stride,
                                impl=interp_impl)


# ---------------------------------------------------------------------------
# Torch checkpoint porting
# ---------------------------------------------------------------------------

def port_torch_state_dict(sd: Dict[str, Any], cfg: ViTConfig = VIT_L14):
    """Map an official DINOv2 torch state_dict onto DinoViT's param pytree.

    Accepts either torch tensors or numpy arrays as values. Key layout follows
    facebookresearch/dinov2 (patch_embed.proj, blocks.N.{norm1,attn.qkv,...}).
    """

    def a(x):
        return np.asarray(getattr(x, "detach", lambda: x)() if hasattr(x, "detach") else x)

    params: Dict[str, Any] = {}
    params["patch_embed"] = {
        # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
        "kernel": a(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "bias": a(sd["patch_embed.proj.bias"]),
    }
    params["cls_token"] = a(sd["cls_token"]).reshape(1, cfg.embed_dim)
    params["pos_embed"] = a(sd["pos_embed"]).reshape(-1, cfg.embed_dim)
    def stk(suffix, transpose=False):
        # per-layer torch tensors -> ONE stacked array with a leading
        # (depth,) axis, matching the nn.scan'd block layout
        arrs = [a(sd[f"blocks.{i}.{suffix}"]) for i in range(cfg.depth)]
        out = np.stack([x.T if transpose else x for x in arrs])
        return out

    params["blocks"] = {
        "norm1": {"scale": stk("norm1.weight"), "bias": stk("norm1.bias")},
        "norm2": {"scale": stk("norm2.weight"), "bias": stk("norm2.bias")},
        "ls1": stk("ls1.gamma"),
        "ls2": stk("ls2.gamma"),
        "attn": {
            "qkv": {
                "kernel": stk("attn.qkv.weight", transpose=True),
                "bias": stk("attn.qkv.bias"),
            },
            "proj": {
                "kernel": stk("attn.proj.weight", transpose=True),
                "bias": stk("attn.proj.bias"),
            },
        },
        "mlp_fc1": {
            "kernel": stk("mlp.fc1.weight", transpose=True),
            "bias": stk("mlp.fc1.bias"),
        },
        "mlp_fc2": {
            "kernel": stk("mlp.fc2.weight", transpose=True),
            "bias": stk("mlp.fc2.bias"),
        },
    }
    params["norm"] = {"scale": a(sd["norm.weight"]), "bias": a(sd["norm.bias"])}
    return {"params": params}


def save_backbone(prefix: str, params, cfg: ViTConfig,
                  stride: int = 8, out_size: int = 256) -> str:
    """Persist a trained backbone as `{prefix}.msgpack` + `{prefix}.json`.

    The JSON sidecar records the architecture + the descriptor convention
    (stride / crop size) the backbone was trained with, so `load_backbone`
    can rebuild a matching `DinoFeatureExtractor` with no template params.
    Runtime knobs (compute dtype, attention impl) are NOT serialized — they
    are environment choices made at load time.
    """
    import json as _json
    import os as _os

    from flax import serialization

    d = _os.path.dirname(prefix)
    if d:
        _os.makedirs(d, exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x, np.float32), jax.device_get(params))
    with open(prefix + ".msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(host))
    meta = {
        "patch_size": cfg.patch_size, "embed_dim": cfg.embed_dim,
        "depth": cfg.depth, "num_heads": cfg.num_heads,
        "mlp_ratio": cfg.mlp_ratio, "layerscale_init": cfg.layerscale_init,
        "pretrain_grid": cfg.pretrain_grid,
        "stride": stride, "out_size": out_size,
    }
    with open(prefix + ".json", "w") as f:
        _json.dump(meta, f, indent=1)
    return prefix + ".msgpack"


def load_backbone(prefix: str, **cfg_overrides):
    """Load a `save_backbone` artifact. Returns (params, cfg, stride,
    out_size) or None if absent. `cfg_overrides` set runtime fields
    (e.g. attn_impl='pallas', compute_dtype='bfloat16')."""
    import json as _json
    import os as _os

    from flax import serialization

    if not _os.path.exists(prefix + ".msgpack"):
        return None
    with open(prefix + ".json") as f:
        meta = _json.load(f)
    stride = int(meta.pop("stride"))
    out_size = int(meta.pop("out_size"))
    cfg = ViTConfig(**meta, **cfg_overrides)
    with open(prefix + ".msgpack", "rb") as f:
        params = serialization.msgpack_restore(f.read())
    return params, cfg, stride, out_size


def load_dinov2_params(path: str, cfg: ViTConfig = VIT_L14):
    """Load a DINOv2 torch checkpoint from disk (gated: returns None if absent)."""
    import os

    if not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return port_torch_state_dict(sd, cfg)
