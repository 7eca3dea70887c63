"""Weight-only quantization: qint8 / int4 (affine, grouped) + mxfp8 / mxfp4 /
nvfp4 (microscaling float).

Capability parity with the reference's quantization surface
(``Sources/Flux2Core/Configuration/QuantizationConfig.swift:40-148``; MLX
quantize semantics used in ``WeightLoader.swift:793-819``):

  - qint8: 8-bit affine, group 64          (near-lossless, -47% memory)
  - int4 : 4-bit affine, group 64          (-72% memory)
  - mxfp8: e4m3 values, power-of-2 scale, group 32
  - mxfp4: e2m1 values, power-of-2 scale, group 32
  - nvfp4: e2m1 values, e4m3 float scale, group 16
  - nf4: QLoRA NormalFloat4 codebook (16 normal-quantile values in [-1,1]),
    per-group absmax scale, group 64 (TrainingQuantization nf4,
    LoRATrainingConfig.swift:18)

Representation: ``QTensor`` — a registered pytree whose children are the
code/scale(/bias) arrays and whose aux data (format, group size, original
input dim) is static, so QTensors flow through jit/scan/vmap like ordinary
leaves. Grouping is along the INPUT feature axis (the contraction axis),
matching MLX's row-group layout; int4/fp4 codes pack two nibbles per uint8
along that axis. Works on 2D [in, out] and stacked 3D [L, in, out] leaves.

Compute: ``q_matmul(x, w)`` dispatches — plain arrays hit the MXU directly;
QTensors run XLA dequantize-then-matmul (measured at bf16-GEMM speed on v5e;
quantization is a memory-at-rest win). A Pallas fused dequant-matmul kernel
(``FLUX2_PALLAS_DEQUANT=1``) keeps even the working set at quantized width
for HBM-bound deployments; see the q_matmul docstring and the knowledge
base for the measured trade-off.
"""

from __future__ import annotations

import contextlib as _contextlib
import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FORMATS = ("bf16", "qint8", "int4", "nf4", "mxfp8", "mxfp4", "nvfp4")

GROUP_SIZES = {"qint8": 64, "int4": 64, "nf4": 64, "mxfp8": 32, "mxfp4": 32, "nvfp4": 16}

# e2m1 (sign + 2-bit exponent + 1-bit mantissa) value table for fp4 codes.
_E2M1_VALUES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
    dtype=np.float32,
)

# QLoRA NormalFloat4: quantiles of N(0,1) normalized to [-1, 1]
# (bitsandbytes reference values; symmetric around a true zero code).
_NF4_VALUES = np.array(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0],
    dtype=np.float32,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """Quantized weight: codes + per-group scale (+ bias for affine formats)."""

    q: jnp.ndarray  # [.., in(/2 packed), out]
    scale: jnp.ndarray  # [.., in/g, out]
    bias: Optional[jnp.ndarray]  # [.., in/g, out] (affine int formats only)
    format: str  # static
    group_size: int  # static
    orig_in: int  # static

    def tree_flatten(self):
        children = (self.q, self.scale, self.bias)
        return children, (self.format, self.group_size, self.orig_in)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale, bias = children
        return cls(q, scale, bias, *aux)

    @property
    def nbytes(self) -> int:
        n = self.q.nbytes + self.scale.nbytes
        return n + (self.bias.nbytes if self.bias is not None else 0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class W8A8Tensor:
    """Runtime W8A8 weight: symmetric int8 codes + per-column f32 scale.

    The *compute* format for quantized inference on the MXU (the storage
    format stays the MLX-parity QTensor). Per-column weight scale + per-token
    dynamic activation scale let the kernel accumulate in int32 across ALL
    K blocks and rescale once at the end (a single rank-1 f32 epilogue);
    see quant_kernels.w8a8_matmul.
    """

    q: jnp.ndarray  # int8 [.., K, N]
    scale: jnp.ndarray  # f32 [.., 1, N]
    orig_in: int  # static

    def tree_flatten(self):
        return (self.q, self.scale), (self.orig_in,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def nbytes(self) -> int:
        return self.q.nbytes + self.scale.nbytes


def _requant_slicewise(w: Any, quant2d):
    """Run ``quant2d([K, N] float) -> pytree`` over a dense array or stored
    QTensor, slice-by-slice for stacked [L, K, N] leaves so the dense/f32
    transient is ONE layer (Dev-32B whole-stack transients OOM a 16 GB chip
    — QTensor inputs dequantize inside the map, never all at once)."""
    if isinstance(w, QTensor):
        *lead, _, d_out = w.q.shape
        d_in = w.orig_in
        if w.q.ndim == 2:
            return jax.jit(lambda qt: quant2d(dequantize(qt, jnp.bfloat16)))(w), lead, d_in, d_out

        aux = (w.format, w.group_size, w.orig_in)

        def conv(children):
            qs, ss, bs = children
            return quant2d(dequantize(QTensor(qs, ss, bs, *aux), jnp.bfloat16))

        flat = (
            w.q.reshape(-1, *w.q.shape[len(lead):]),
            w.scale.reshape(-1, *w.scale.shape[len(lead):]),
            None if w.bias is None else w.bias.reshape(-1, *w.bias.shape[len(lead):]),
        )
        return jax.lax.map(conv, flat), lead, d_in, d_out

    *lead, d_in, d_out = w.shape
    if w.ndim == 2:
        return jax.jit(quant2d)(w), lead, d_in, d_out
    return jax.lax.map(quant2d, w.reshape(-1, d_in, d_out)), lead, d_in, d_out


def to_w8a8(w: Any) -> Any:
    """Convert a dense weight or a stored QTensor into the W8A8 compute format."""
    if isinstance(w, W8A8Tensor):
        return w

    def quant2d(w2):  # [K, N] any float -> (int8 [K, N], f32 [1, N])
        wf = w2.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
        scale = jnp.maximum(amax, 1e-30) / 127.0
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return q, scale

    (q, scale), lead, d_in, d_out = _requant_slicewise(w, quant2d)
    q = q.reshape(*lead, d_in, d_out)
    scale = scale.reshape(*lead, 1, d_out)
    return W8A8Tensor(q, scale, d_in)


def dequantize_w8a8(w: W8A8Tensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (w.q.astype(jnp.float32) * w.scale).astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class W4A8Tensor:
    """Runtime W4A8 weight: packed symmetric int4 codes + per-(K-block, col)
    f32 scale.

    Codes live in [-7, 7], packed two per byte with SPLIT-HALF block packing:
    within each K block of ``block`` rows, packed row r holds code row
    ``r`` in the low nibble and code row ``r + block/2`` in the high nibble.
    The kernel unpacks a block with two shifts and one concat — order
    preserved, no interleave (quant_kernels._kernel_w4a8). One scale per
    (K-block, column): the kernel accumulates int32 within a block and f32
    across blocks. Quarter HBM vs bf16: Dev-32B weights drop to 15.3 GiB —
    a tp=2 pair of v5e chips (7.6 GiB/device) instead of 8 for bf16.
    """

    q: jnp.ndarray  # uint8 [.., K/2, N]
    scale: jnp.ndarray  # f32 [.., K/block, N]
    block: int  # static
    orig_in: int  # static

    def tree_flatten(self):
        return (self.q, self.scale), (self.block, self.orig_in)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def nbytes(self) -> int:
        return self.q.nbytes + self.scale.nbytes


W4A8_BLOCK = 512


def to_w4a8(w: Any, block: int = W4A8_BLOCK) -> Any:
    """Convert a dense weight or stored QTensor to W4A8. Returns the input
    unchanged when K doesn't tile by ``block`` (dense fallback applies)."""
    if isinstance(w, W4A8Tensor):
        return w
    d_in = w.orig_in if isinstance(w, QTensor) else w.shape[-2]
    d_out = w.q.shape[-1] if isinstance(w, QTensor) else w.shape[-1]
    if d_in % block:
        return dequantize(w, jnp.bfloat16) if isinstance(w, QTensor) else w
    half = block // 2

    def quant2d(w2):  # [K, N] float -> (uint8 [K/2, N], f32 [K/block, N])
        wf = w2.astype(jnp.float32).reshape(d_in // block, block, d_out)
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        scale = jnp.maximum(amax, 1e-30) / 7.0
        q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)  # [G, block, N]
        lo = (q[:, :half] + 8).astype(jnp.uint8)  # store offset-by-8 nibbles
        hi = (q[:, half:] + 8).astype(jnp.uint8)
        packed = (lo | (hi << 4)).reshape(d_in // 2, d_out)
        return packed, scale.squeeze(-2)

    (q, scale), lead, d_in, d_out = _requant_slicewise(w, quant2d)
    q = q.reshape(*lead, d_in // 2, d_out)
    scale = scale.reshape(*lead, d_in // block, d_out)
    return W4A8Tensor(q, scale, block, d_in)


def dequantize_w4a8(w: W4A8Tensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    *lead, _, d_out = w.q.shape
    d_in, block = w.orig_in, w.block
    half = block // 2
    p = w.q.reshape(*lead, d_in // block, half, d_out).astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = (p >> 4) - 8
    codes = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)  # [.., G, block, N]
    scale = jnp.expand_dims(w.scale, -2)
    return (codes * scale).reshape(*lead, d_in, d_out).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, (QTensor, W8A8Tensor, W4A8Tensor))


# When True, W8A8 matmuls route through the custom_partitioning wrapper so
# GSPMD keeps the int8 codes sharded instead of all-gathering them around the
# opaque pallas call. Scoped: Flux2Pipeline._mesh_ctx enters
# partitioned_runtime() around its sharded compute, so unsharded encoders and
# other pipelines in the same process keep the plain kernel path.
_PARTITIONED_RUNTIME = False


def set_partitioned_runtime(enabled: bool) -> None:
    global _PARTITIONED_RUNTIME
    _PARTITIONED_RUNTIME = bool(enabled)


@_contextlib.contextmanager
def partitioned_runtime(enabled: bool = True):
    """Scope the custom_partitioning routing to a with-block (trace time)."""
    global _PARTITIONED_RUNTIME
    prev = _PARTITIONED_RUNTIME
    _PARTITIONED_RUNTIME = bool(enabled)
    try:
        yield
    finally:
        _PARTITIONED_RUNTIME = prev


# ---------------------------------------------------------------------------
# Quantize / dequantize
# ---------------------------------------------------------------------------


def quantize(w: jnp.ndarray, fmt: str, group_size: Optional[int] = None) -> QTensor:
    """Quantize a weight [.., in, out] along the input axis."""
    if fmt == "bf16":
        raise ValueError("bf16 is the unquantized format")
    g = group_size or GROUP_SIZES[fmt]
    *lead, d_in, d_out = w.shape
    if d_in % g:
        raise ValueError(f"in dim {d_in} not divisible by group size {g}")
    wf = jnp.asarray(w, jnp.float32).reshape(*lead, d_in // g, g, d_out)

    if fmt in ("qint8", "int4"):
        bits = 8 if fmt == "qint8" else 4
        levels = (1 << bits) - 1
        wmin = jnp.min(wf, axis=-2, keepdims=True)
        wmax = jnp.max(wf, axis=-2, keepdims=True)
        scale = (wmax - wmin) / levels
        scale = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round((wf - wmin) / scale), 0, levels).astype(jnp.uint8)
        q = q.reshape(*lead, d_in, d_out)
        if fmt == "int4":
            q = _pack_nibbles(q)
        return QTensor(q, scale.squeeze(-2).astype(jnp.float32), wmin.squeeze(-2).astype(jnp.float32), fmt, g, d_in)

    if fmt == "nf4":
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        scale = jnp.where(amax == 0, 1.0, amax)
        vals = jnp.asarray(_NF4_VALUES)
        codes = jnp.argmin(jnp.abs((wf / scale)[..., None] - vals), axis=-1).astype(jnp.uint8)
        q = _pack_nibbles(codes.reshape(*lead, d_in, d_out))
        return QTensor(q, scale.squeeze(-2).astype(jnp.float32), None, fmt, g, d_in)

    if fmt in ("mxfp8", "mxfp4", "nvfp4"):
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        amax = jnp.where(amax == 0, 1.0, amax)
        target_max = 448.0 if fmt == "mxfp8" else 6.0  # e4m3 max / e2m1 max
        if fmt == "nvfp4":
            # float (e4m3-representable) scale
            scale = (amax / target_max).astype(jnp.float8_e4m3fn).astype(jnp.float32)
            scale = jnp.where(scale == 0, 2.0**-16, scale)
        else:
            # power-of-two shared scale (OCP microscaling)
            scale = 2.0 ** jnp.ceil(jnp.log2(amax / target_max))
        scaled = wf / scale
        if fmt == "mxfp8":
            q = scaled.astype(jnp.float8_e4m3fn).reshape(*lead, d_in, d_out)
        else:
            q = _pack_nibbles(_encode_e2m1(scaled).reshape(*lead, d_in, d_out))
        return QTensor(q, scale.squeeze(-2).astype(jnp.float32), None, fmt, g, d_in)

    raise ValueError(f"unknown quantization format {fmt}")


def dequantize(qw: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    fmt, g, d_in = qw.format, qw.group_size, qw.orig_in
    q = qw.q
    if fmt in ("int4", "nf4", "mxfp4", "nvfp4"):
        q = _unpack_nibbles(q, d_in)
    *lead, _, d_out = q.shape
    scale = jnp.expand_dims(qw.scale, -2)  # [.., G, 1, out]
    if fmt in ("qint8", "int4"):
        codes = q.reshape(*lead, d_in // g, g, d_out).astype(jnp.float32)
        bias = jnp.expand_dims(qw.bias, -2)
        w = codes * scale + bias
    elif fmt == "mxfp8":
        vals = q.astype(jnp.float32).reshape(*lead, d_in // g, g, d_out)
        w = vals * scale
    elif fmt == "nf4":
        vals = jnp.asarray(_NF4_VALUES)[q.astype(jnp.int32)]
        w = vals.reshape(*lead, d_in // g, g, d_out) * scale
    else:  # e2m1 codebook
        vals = jnp.asarray(_E2M1_VALUES)[q.astype(jnp.int32)]
        w = vals.reshape(*lead, d_in // g, g, d_out) * scale
    return w.reshape(*lead, d_in, d_out).astype(dtype)


def _encode_e2m1(x: jnp.ndarray) -> jnp.ndarray:
    """Round float values to the nearest e2m1 code (0..15)."""
    vals = jnp.asarray(_E2M1_VALUES)  # [16]
    dist = jnp.abs(x[..., None] - vals)
    return jnp.argmin(dist, axis=-1).astype(jnp.uint8)


def _pack_nibbles(q: jnp.ndarray) -> jnp.ndarray:
    """[.., in, out] 0..15 -> [.., in/2, out] uint8 (low nibble = even row)."""
    *lead, d_in, d_out = q.shape
    q2 = q.reshape(*lead, d_in // 2, 2, d_out)
    return (q2[..., 0, :] | (q2[..., 1, :] << 4)).astype(jnp.uint8)


def _unpack_nibbles(q: jnp.ndarray, d_in: int) -> jnp.ndarray:
    *lead, _, d_out = q.shape
    low = q & 0xF
    high = q >> 4
    return jnp.stack([low, high], axis=-2).reshape(*lead, d_in, d_out)


# ---------------------------------------------------------------------------
# Matmul dispatch
# ---------------------------------------------------------------------------


def q_matmul(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w where w is a plain array or a QTensor.

    Default path: XLA dequantize-then-matmul — measured at bf16-matmul speed
    on v5e (the dequant materialization hides behind the compute-bound GEMM)
    while weights at rest stay quantized in HBM. The Pallas fused
    dequant-matmul (opt-in via FLUX2_PALLAS_DEQUANT=1) keeps the *working
    set* at quantized width too, but its in-kernel dequant is currently
    VPU-bound (25-200x slower at DiT shapes — see
    docs/knowledge/decisions/quantization-formats.md); use only when HBM,
    not speed, is the binding constraint.
    """
    if not is_quantized(w):
        return x @ w
    if isinstance(w, W8A8Tensor):
        if _PARTITIONED_RUNTIME and w.q.ndim == 2:
            # Under a mesh: SPMD-native column/row-parallel rules keep the
            # quantized codes sharded (parallel/quant_partition.py).
            from flux2_tpu.parallel.quant_partition import w8a8_matmul_partitioned

            return w8a8_matmul_partitioned(x, w)
        from flux2_tpu.ops import quant_kernels

        if jax.default_backend() == "tpu" and w.q.ndim == 2 and quant_kernels.w8a8_supported(x, w):
            return quant_kernels.w8a8_matmul(x, w)
        return x @ dequantize_w8a8(w, dtype=x.dtype)
    if isinstance(w, W4A8Tensor):
        if _PARTITIONED_RUNTIME and w.q.ndim == 2:
            from flux2_tpu.parallel.quant_partition import w4a8_matmul_partitioned

            return w4a8_matmul_partitioned(x, w)
        from flux2_tpu.ops import quant_kernels

        if jax.default_backend() == "tpu" and w.q.ndim == 2 and quant_kernels.w4a8_supported(x, w):
            return quant_kernels.w4a8_matmul(x, w)
        return x @ dequantize_w4a8(w, dtype=x.dtype)
    if (
        os.environ.get("FLUX2_PALLAS_DEQUANT", "0") == "1"
        and w.format in ("qint8", "int4")
        and jax.default_backend() == "tpu"
        and w.q.ndim == 2
    ):
        from flux2_tpu.ops import quant_kernels

        if quant_kernels.supported(x, w):
            return quant_kernels.dequant_matmul(x, w)
    return x @ dequantize(w, dtype=x.dtype)


# Leaves that are never matmul weights: norm scales, biases, token-embedding
# tables (gather-indexed — x_embedder/context_embedder projections are
# matmuls and stay eligible), VAE BatchNorm stats. At 24B scale a stacked
# norm leaf ([40, 5120] = 205k elements) exceeds min_size, so size alone is
# not a safe filter — quantizing one breaks the layer scan (mismatched
# leading axes) and RMSNorm (W8A8Tensor has no elementwise multiply).
_NON_MATMUL_KEYS = ("norm", "bias", "embed_tokens", "embedding", "bn", "running_")


def _path_is_matmul(path) -> bool:
    joined = "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    ).lower()
    return not any(tag in joined for tag in _NON_MATMUL_KEYS)


def quantize_params(params: Any, fmt: str, min_size: int = 1 << 16) -> Any:
    """Quantize every float 2D+ matmul-weight leaf larger than min_size
    elements.

    Norm scales, biases, embeddings, and small leaves stay unquantized —
    same policy as the reference's on-the-fly quantize
    (Flux2Pipeline.swift:567-578) — filtered by key name, not just size.
    """
    if fmt == "bf16":
        return params
    if fmt == "w8a8":
        return w8a8_params(params, min_size=min_size)
    if fmt == "w4a8":
        return w4a8_params(params, min_size=min_size)

    def visit(path, leaf):
        if (
            _path_is_matmul(path)
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.size >= min_size
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.shape[-2] % GROUP_SIZES[fmt] == 0
            and (fmt not in ("int4", "nf4", "mxfp4", "nvfp4") or leaf.shape[-2] % 2 == 0)
        ):
            return quantize(leaf, fmt)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def w8a8_params(params: Any, min_size: int = 1 << 16) -> Any:
    """Convert eligible weight leaves (dense or stored QTensor) to W8A8.

    The speed deployment for quantized serving: int8 codes halve weight HBM
    AND run the matmuls on the MXU's int8 path (quant_kernels.w8a8_matmul).
    """

    def visit(path, leaf):
        if isinstance(leaf, QTensor):
            return to_w8a8(leaf)
        if (
            _path_is_matmul(path)
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.size >= min_size
            and jnp.issubdtype(leaf.dtype, jnp.floating)
        ):
            return to_w8a8(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params, is_leaf=is_quantized)


def w4a8_params(params: Any, block: int = W4A8_BLOCK, min_size: int = 1 << 16) -> Any:
    """Convert eligible weight leaves to W4A8 — the quarter-HBM int4
    runtime (fit format: Dev-32B on tp=2 v5e instead of 8 chips)."""

    def visit(path, leaf):
        if isinstance(leaf, QTensor):
            return to_w4a8(leaf, block)
        if (
            _path_is_matmul(path)
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.size >= min_size
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.shape[-2] % block == 0
        ):
            return to_w4a8(leaf, block)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params, is_leaf=is_quantized)


def param_bytes(params: Any) -> int:
    return sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(params) if hasattr(leaf, "nbytes"))


def dequantize_params(params: Any, dtype=jnp.bfloat16) -> Any:
    """Expand every QTensor leaf back to a dense array.

    The speed-first deployment recipe: store/ship prequantized checkpoints
    (fast, integrity-validated loads), then dequantize once at load so the
    runtime runs at bf16-GEMM speed — quantized runtime is reserved for
    HBM-bound fits (see q_matmul).
    """

    def visit(leaf):
        if isinstance(leaf, W8A8Tensor):
            return dequantize_w8a8(leaf, dtype)
        if isinstance(leaf, W4A8Tensor):
            return dequantize_w4a8(leaf, dtype)
        return dequantize(leaf, dtype) if is_quantized(leaf) else leaf

    return jax.tree_util.tree_map(visit, params, is_leaf=is_quantized)
