"""Pallas TPU fused dequant-matmul for grouped int8/int4 weights.

The TPU-native replacement for MLX's quantizedMM (the reference's qint8/int4
inference path). Weight codes stream HBM->VMEM at the quantized width and
dequantize in VMEM right before the MXU dot, so the matmul's HBM traffic is
1/2 (int8) or 1/4 (int4) of bf16 — the win that makes weight-only quant
worth it on a bandwidth-bound chip.

Grid: (M/bm, N/bn, K/bk) with K innermost; an f32 accumulator in VMEM
carries across K blocks. Scales/biases are grouped along K (group_size g),
so each K block covers bk/g whole groups (bk is chosen as a multiple of g).
int4 codes arrive packed two-per-byte along K and unpack in-kernel.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BM = 256
DEFAULT_BN = 512
DEFAULT_BK = 512


def supported(x: jnp.ndarray, w: Any) -> bool:
    if x.shape[-1] != w.orig_in:
        return False
    if w.orig_in % DEFAULT_BK or w.q.shape[-1] % 128:
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    return m >= 8


def _kernel_int8(x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref, *, bk, g):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk]
    codes = q_ref[:].astype(jnp.int32).astype(jnp.float32)  # [bk, bn]
    scale = s_ref[:]  # [bk//g, bn]
    bias = b_ref[:]
    # Expand group scales to rows: [bk, bn]
    scale_rows = jnp.repeat(scale, g, axis=0)
    bias_rows = jnp.repeat(bias, g, axis=0)
    w = (codes * scale_rows + bias_rows).astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kb == num_kb - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_int4(x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref, *, bk, g):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk]
    packed = q_ref[:].astype(jnp.int32)  # [bk//2, bn], low nibble = even k row
    low = (packed & 0xF).astype(jnp.float32)
    high = ((packed >> 4) & 0xF).astype(jnp.float32)
    # Interleave rows back: codes[2i] = low[i], codes[2i+1] = high[i].
    bk_half, bn = low.shape
    codes = jnp.stack([low, high], axis=1).reshape(bk_half * 2, bn)
    scale_rows = jnp.repeat(s_ref[:], g, axis=0)
    bias_rows = jnp.repeat(b_ref[:], g, axis=0)
    w = (codes * scale_rows + bias_rows).astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kb == num_kb - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def dequant_matmul(
    x: jnp.ndarray,
    w: Any,
    bm: int = DEFAULT_BM,
    bn: int = DEFAULT_BN,
    bk: int = DEFAULT_BK,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [.., K] @ QTensor[K, N] -> [.., N]."""
    *lead, k = x.shape
    n = w.q.shape[-1]
    g = w.group_size
    assert bk % g == 0 and k % g == 0

    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    bm = min(bm, _round_up(m, 8))
    bn = min(bn, n)
    while n % bn:  # supported() guarantees n % 128 == 0, so this floors at 128
        bn //= 2
    bk = min(bk, k)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // bm, n // bn, k // bk)
    is_int4 = w.format == "int4"
    kernel = _kernel_int4 if is_int4 else _kernel_int8
    q_rows = bk // 2 if is_int4 else bk

    out = pl.pallas_call(
        functools.partial(kernel, bk=bk, g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((q_rows, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bk // g, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bk // g, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, w.q, w.scale, w.bias)

    return out[:m].reshape(*lead, n)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# ---------------------------------------------------------------------------
# W8A8: int8 activations x int8 weights on the MXU
# ---------------------------------------------------------------------------
#
# The round-1 fused dequant kernel above is VPU-bound: it converts uint8
# codes to float *before* the dot, so the conversion throughput (not the MXU)
# sets the speed. The W8A8 kernel keeps codes int8 all the way INTO the MXU:
#
#   1. quantize the activation tile in-kernel (per-row dynamic symmetric int8,
#      one scale per [row, K-block] — VPU, O(bm*bk));
#   2. int8 x int8 -> int32 MXU dot (measured 71.6 T/s vs bf16's 60.9 T/s on
#      v5e at identical tiling — docs/knowledge/decisions/quantization-formats.md);
#   3. rescale the int32 partial by (act_scale[row] * weight_scale[kblock, col])
#      and accumulate in an f32 VMEM scratch.
#
# Weight layout: symmetric int8 codes [K, N] with one f32 scale per COLUMN —
# see quant.W8A8Tensor / quant.to_w8a8. Activations quantize dynamically to
# one symmetric int8 scale per TOKEN (row). Both scales being K-invariant
# lets the kernel accumulate raw int32 across every K block and rescale
# exactly once: out = (xq @ wq) * xs[row] * ws[col] — the epilogue is a
# single rank-1 f32 multiply instead of one per K block.
#
# Activation quantization runs as an XLA prologue (one fused pass over x)
# rather than in-kernel: in-kernel quant re-does O(bm*bk) VPU work for every
# N block of the grid.

W8A8_BM = 512
W8A8_BN = 1024
W8A8_BK = 1024


def _kernel_w8a8(xq_ref, xs_ref, q_ref, s_ref, o_ref, acc_ref):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        xq_ref[:], q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [bm, bn] int32 on the MXU

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        xs = xs_ref[0, :][:, None]  # per-token activation scale [bm, 1]
        ws = s_ref[0, :][None, :]  # per-column weight scale [1, bn]
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * (xs * ws)).astype(o_ref.dtype)


def w8a8_supported(x: jnp.ndarray, w: Any) -> bool:
    if x.shape[-1] != w.orig_in:
        return False
    k, n = w.q.shape[-2:]
    return k % 256 == 0 and n % 256 == 0


def w8a8_matmul(
    x: jnp.ndarray,
    w: Any,
    bm: int = W8A8_BM,
    bn: int = W8A8_BN,
    bk: int = W8A8_BK,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [.., K] @ W8A8Tensor[K, N] -> [.., N] (dynamic per-token activation quant)."""
    *lead, k = x.shape
    n = w.q.shape[-1]

    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    bm = min(bm, _round_up(m, 8))
    bn = min(bn, n)
    while n % bn:  # w8a8_supported() guarantees n % 256 == 0: floors at 256
        bn //= 2
    bk = min(bk, k)
    while k % bk:
        bk //= 2
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    # XLA prologue: symmetric int8 per token (row).
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [m, 1]
    xs = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / xs), -127.0, 127.0).astype(jnp.int8)

    grid = (m_pad // bm, n // bn, k // bk)
    out = pl.pallas_call(
        _kernel_w8a8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((1, bm), lambda i, j, kk: (0, i)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, xs.T, w.q, w.scale)

    return out[:m].reshape(*lead, n)


# ---------------------------------------------------------------------------
# W4A8: int8 activations x packed-int4 weights on the MXU
# ---------------------------------------------------------------------------
#
# Weight HBM traffic is 1/4 of bf16 — the fit format (Dev-32B weights drop
# to 15.3 GiB: tp=2 v5e instead of 8 chips; Klein-9B to 4.6 GiB).
# Codes are symmetric int4 in [-7, 7], packed two per byte
# with SPLIT-HALF packing within each K block (quant.to_w4a8): packed row r
# of a block holds code rows r (low nibble) and r + block/2 (high nibble),
# so the in-kernel unpack is two shifts + one concat along sublanes — order
# preserved, no interleave, and all INTEGER ops (the round-1 fused-dequant
# kernel was VPU-bound precisely because it converted codes to float before
# the dot). Scales are per (K-block, column): int32 accumulation within a
# block, f32 accumulation across blocks.

W4A8_BM = 512
W4A8_BN = 1024


def _kernel_w4a8(xq_ref, xs_ref, q_ref, s_ref, o_ref, acc_ref):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = q_ref[:].astype(jnp.int32)  # uint8 [bk/2, bn] (Mosaic can't shift i8 vectors)
    lo = ((packed & 0xF) - 8).astype(jnp.int8)
    hi = ((packed >> 4) - 8).astype(jnp.int8)
    wq = jnp.concatenate([lo, hi], axis=0)  # [bk, bn] int8, rows in order
    idot = jax.lax.dot_general(
        xq_ref[:], wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    xs = xs_ref[kb, :][:, None]  # activation scale for this K block [bm, 1]
    ws = s_ref[kb, :][None, :]  # weight scale for this K block [1, bn]
    acc_ref[:] += idot.astype(jnp.float32) * (xs * ws)

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def w4a8_supported(x: jnp.ndarray, w: Any) -> bool:
    if x.shape[-1] != w.orig_in:
        return False
    k2, n = w.q.shape[-2:]
    return (2 * k2) % w.block == 0 and n % 256 == 0 and w.block % 256 == 0


def w4a8_matmul(
    x: jnp.ndarray,
    w: Any,
    bm: int = W4A8_BM,
    bn: int = W4A8_BN,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [.., K] @ W4A8Tensor[K, N] -> [.., N].

    Activation quantization: symmetric int8 per (row, K-block) as an XLA
    prologue; per-block scales pair with the weight's per-block scales in
    the f32 cross-block accumulate."""
    *lead, k = x.shape
    n = w.q.shape[-1]
    bk = w.block  # kernel K block == weight scale block (split-half packing unit)
    kb = k // bk

    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    bm = min(bm, _round_up(m, 8))
    bn = min(bn, n)
    while n % bn:  # w4a8_supported() guarantees n % 256 == 0: floors at 256
        bn //= 2
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    xr = x2.astype(jnp.float32).reshape(m_pad, kb, bk)
    amax = jnp.max(jnp.abs(xr), axis=-1)
    xs = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    xq = (
        jnp.clip(jnp.round(xr / xs[:, :, None]), -127.0, 127.0)
        .astype(jnp.int8)
        .reshape(m_pad, k)
    )
    xs_t = xs.T  # [kb, m]

    grid = (m_pad // bm, n // bn, kb)
    out = pl.pallas_call(
        _kernel_w4a8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((kb, bm), lambda i, j, kk: (0, i)),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((kb, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, xs_t, w.q, w.scale)

    return out[:m].reshape(*lead, n)
