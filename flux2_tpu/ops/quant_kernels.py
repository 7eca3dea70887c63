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
