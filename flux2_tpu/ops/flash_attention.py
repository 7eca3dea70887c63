"""Pallas TPU flash attention for the FLUX.2 DiT.

The DiT's joint attention is full bidirectional (no causal mask) over the
concatenated [txt ; img(; ref)] sequence — up to ~45k tokens with multiple
reference images. The XLA path materializes [B, H, S, S] logits (2 GB bf16 at
S=4608 for Dev-32B), which turns the hot loop HBM-bound. This kernel computes
attention with a tiled online softmax so only [block_q, block_k] tiles ever
exist in VMEM — the TPU-native replacement for the reference's
``MLXFast.scaledDotProductAttention`` (Flux2Attention.swift:168).

Grid: (B*H, num_q_blocks, num_k_blocks), with the k axis innermost so the
accumulator scratch carries across k blocks for a fixed q block. Logits
accumulate in f32 on the MXU; the m/l online-softmax state lives in VMEM
scratch. Sequence lengths not divisible by the block size are handled by
padding with masked (ignored) keys.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = None  # adaptive: whole KV in one block when it fits (see _pick_block_k)
# Largest single KV block: one block removes every online-softmax rescale
# pass. Measured on v5e, Klein-4B 1024^2 (S_kv = 4608): one block =
# 239.6 ms/step vs 273.5 at block_k=512 (-12%). 4608 is also the empirical
# ceiling — at bq=512 the kernel's scoped VMEM (16 MB: f32 logits tile +
# operand buffers) compiles at 4608 keys and OOMs at 5120 (probed on v5e).
MAX_SINGLE_BLOCK_K = 4608
TILED_BLOCK_K = 1024  # beyond that, 1024 beat 512 at full-model level
# Ceiling for divisor-derived tiled block_k: the f32 logits tile
# (block_q x block_k) must fit scoped VMEM next to the operand buffers
# (single-block probing put the bq=512 ceiling at 4608 keys; leave slack
# for double-buffered K/V).
MAX_TILED_BLOCK_K = 3072
NEG_INF = -1e30
# Kill-switch: force the classic per-row running-max online softmax even
# for bounded_logits callers (exact for unbounded logit ranges, ~20% slower
# in the long-S multi-k-block regime).
_EXACT_MAX = os.environ.get("FLUX2_FLASH_EXACT_MAX", "0") == "1"


def _pick_block_k(s_k: int) -> int:
    """Adaptive KV tile: whole KV when it fits; else the largest 128-multiple
    divisor of the padded length (no padded tile -> interior tiles skip the
    kv_len mask entirely, the long-sequence VPU hot path); else 1024."""
    padded = _round_up(s_k, 128)
    if padded <= MAX_SINGLE_BLOCK_K:
        return padded
    blocks = padded // 128
    best = 0
    for m in range(1, min(blocks, MAX_TILED_BLOCK_K // 128) + 1):
        if blocks % m == 0:
            best = m * 128
    return best if best >= 512 else TILED_BLOCK_K


def supported(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> bool:
    """Shape gate for the kernel: 4D [B,H,S,D], D multiple of 128, S >= 128."""
    if q.ndim != 4 or k.shape != v.shape:
        return False
    d = q.shape[-1]
    return d % 128 == 0 and q.shape[2] >= 128 and k.shape[2] >= 128


def _flash_kernel_lse(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
    *, scale, kv_len, block_q, block_k, blocked_span=None, padded_kv_len=None,
    const_anchor=False,
):
    _flash_body(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                scale=scale, kv_len=kv_len, block_q=block_q, block_k=block_k,
                blocked_span=blocked_span, padded_kv_len=padded_kv_len,
                const_anchor=const_anchor)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, scale, kv_len, block_q, block_k, blocked_span=None, padded_kv_len=None,
    const_anchor=False,
):
    _flash_body(q_ref, k_ref, v_ref, o_ref, None, m_ref, l_ref, acc_ref,
                scale=scale, kv_len=kv_len, block_q=block_q, block_k=block_k,
                blocked_span=blocked_span, padded_kv_len=padded_kv_len,
                const_anchor=const_anchor)


def _flash_body(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
    *, scale, kv_len, block_q, block_k, blocked_span=None, padded_kv_len=None,
    const_anchor=False,
):
    """One (q_block, k_block) tile of online-softmax attention.

    ``blocked_span`` = (q_start, q_end, k_start): queries in [q_start, q_end)
    cannot attend keys at positions >= k_start — the contiguous-segment mask
    the KV-extraction pass needs (reference tokens must not see output
    tokens) expressed with ZERO extra memory traffic.

    Q arrives pre-scaled by scale*log2(e) (done once per sequence outside the
    kernel), so the logits land directly in the exp2 domain with no per-tile
    multiply. Both masks are gated per tile: a tile that provably contains no
    padding columns / no blocked cells runs maskless — at long S the kernel
    is VPU-(softmax-)bound, so skipping the iota+compare+select on interior
    tiles matters (`scale` itself is unused here; kept for bwd symmetry).

    ``const_anchor=True`` (multi-k-block path for bounded_logits callers):
    softmax(x) is invariant to the subtracted constant, so when the caller
    guarantees |logits| <= ~120 in the exp2 domain (qk-RMSNorm'd attention:
    |q.k*scale*log2e| <= sqrt(d)*gamma_q*gamma_k*log2e, ~16.3*gamma^2 for
    d=128), subtracting the COMPILE-TIME constant 0 instead of the running
    row max is numerically safe AND exact: exp2 stays inside f32 range
    (overflow needs a logit > +127, all-row underflow needs a row max
    < -125). This drops the per-tile cross-lane max-reduce, the
    [block_q, 1]-over-lanes broadcast of the max, and the alpha-rescale of
    the accumulator — measured ~20% of the S=16896 kernel on v5e (an SMEM
    scalar anchor was tried and recovers only ~6%: the immediate constant
    is what makes the subtract free). Out-of-contract inputs overflow to
    inf and surface loudly as NaN rather than silently distorting;
    FLUX2_FLASH_EXACT_MAX=1 restores the running-max path everywhere.
    """
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        if not const_anchor:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, d] (pre-scaled by scale*log2e)
    k = k_ref[0]  # [block_k, d]
    v = v_ref[0]  # [block_k, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k], already in the exp2 domain

    k_start = kb * block_k
    if padded_kv_len is not None and padded_kv_len > kv_len:
        # Padding keys live only in the final k block: mask just there.
        def _mask_pad(s):
            col = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            return jnp.where(col < kv_len, s, NEG_INF)

        s = jax.lax.cond(kb == num_kb - 1, _mask_pad, lambda s: s, s)

    if blocked_span is not None:
        bq0, bq1, bk0 = blocked_span
        qb = pl.program_id(1)
        q_start = qb * block_q

        def _mask_span(s):
            row = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            blocked = (row >= bq0) & (row < bq1) & (col >= bk0)
            return jnp.where(blocked, NEG_INF, s)

        intersects = (
            (q_start < bq1) & (q_start + block_q > bq0) & (k_start + block_k > bk0)
        )
        s = jax.lax.cond(intersects, _mask_span, lambda s: s, s)

    if const_anchor:
        p = jnp.exp2(s)  # anchor 0: immediate, no reduce/broadcast/rescale
        l_ref[:] += jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] += jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        m_prev = m_ref[:]  # [block_q, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new

    @pl.when(kb == num_kb - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        if lse_ref is not None:
            # LSE per query row, broadcast over a 128-lane strip (TPU block
            # layout wants a 128-multiple last dim). m is in the exp2
            # domain: natural-log LSE = m*ln2 + ln(l) — exact for ANY
            # anchor, not just the true max (m = 0 on the const path).
            if const_anchor:
                lse = jnp.log(l_ref[:])  # [block_q, 1]
            else:
                lse = m_ref[:] * 0.6931471805599453 + jnp.log(l_ref[:])
            lse_ref[0] = jnp.broadcast_to(lse, (block_q, 128))


def _flash_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: Optional[int] = DEFAULT_BLOCK_K,
    interpret: bool = False,
    blocked_span: Optional[tuple] = None,
    return_lse: bool = False,
    bounded_logits: bool = False,
):
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if scale is None:
        scale = d**-0.5

    if block_k is None:
        block_k = _pick_block_k(s_k)
    block_q = min(block_q, _round_up(s_q, 128))
    block_k = min(block_k, _round_up(s_k, 128))

    # Pre-scale Q by scale*log2e (exp2-domain softmax): one O(S*D) multiply
    # here replaces an O(S_q*S_k) per-logit multiply inside the kernel.
    q_pad = _pad_seq(
        (q.astype(jnp.float32) * (scale * 1.4426950408889634)).astype(q.dtype),
        block_q,
    )
    k_pad = _pad_seq(k, block_k)
    v_pad = _pad_seq(v, block_k)
    s_qp, s_kp = q_pad.shape[2], k_pad.shape[2]

    bh = b * h
    q3 = q_pad.reshape(bh, s_qp, d)
    k3 = k_pad.reshape(bh, s_kp, d)
    v3 = v_pad.reshape(bh, s_kp, d)

    grid = (bh, s_qp // block_q, s_kp // block_k)
    # Constant-anchor softmax when the caller certifies bounded logits
    # (qk-normed attention) and the KV tiling is multi-block; exact per-row
    # running max otherwise (single-block pays the reduce only once anyway).
    const_anchor = bounded_logits and (s_kp // block_k) > 1 and not _EXACT_MAX
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
    ]
    scratch = [
        pltpu.VMEM((block_q, 1), jnp.float32),   # m (running max path)
        pltpu.VMEM((block_q, 1), jnp.float32),   # l
        pltpu.VMEM((block_q, d), jnp.float32),   # acc
    ]
    params = dict(scale=float(scale), kv_len=s_k, block_q=block_q, block_k=block_k,
                  blocked_span=blocked_span, padded_kv_len=s_kp,
                  const_anchor=const_anchor)
    compiler = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary"))

    if return_lse:
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_lse, **params),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda g, i, j: (g, i, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bh, s_qp, d), q.dtype),
                jax.ShapeDtypeStruct((bh, s_qp, 128), jnp.float32),
            ),
            scratch_shapes=scratch,
            compiler_params=compiler,
            interpret=interpret,
        )(q3, k3, v3)
        return (
            out.reshape(b, h, s_qp, d)[:, :, :s_q, :],
            lse[:, :, 0].reshape(b, h, s_qp)[:, :, :s_q],
        )

    out = pl.pallas_call(
        functools.partial(_flash_kernel, **params),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_qp, d), q.dtype),
        scratch_shapes=scratch,
        compiler_params=compiler,
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, h, s_qp, d)[:, :, :s_q, :]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_seq(x: jnp.ndarray, block: int) -> jnp.ndarray:
    s = x.shape[2]
    pad = _round_up(s, block) - s
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


# ---------------------------------------------------------------------------
# Pallas backward kernels (flash backward: no S x S materialization)
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
                   *, scale, kv_len, block_q, block_k, blocked_span, padded_kv_len):
    """dQ tile. Q arrives pre-scaled by scale*log2e and LSE pre-multiplied by
    log2e, so p = exp2(s - lse2) recovers the natural softmax probability
    with the VPU-native exp2 and no per-logit multiply. Masks are cond-gated
    per tile (interior tiles run maskless)."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # pre-scaled by scale*log2e
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse2 = lse_ref[0][:, :1]  # [block_q, 1], exp2-domain (lse * log2e)
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    k_start = kb * block_k
    if padded_kv_len > kv_len:
        def _mask_pad(s):
            col = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            return jnp.where(col < kv_len, s, NEG_INF)

        s = jax.lax.cond(kb == num_kb - 1, _mask_pad, lambda s: s, s)
    if blocked_span is not None:
        bq0, bq1, bk0 = blocked_span
        q_start = pl.program_id(1) * block_q

        def _mask_span(s):
            row = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            return jnp.where((row >= bq0) & (row < bq1) & (col >= bk0), NEG_INF, s)

        intersects = (q_start < bq1) & (q_start + block_q > bq0) & (k_start + block_k > bk0)
        s = jax.lax.cond(intersects, _mask_span, lambda s: s, s)

    p = jnp.exp2(s - lse2)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    acc_ref[:] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) * scale

    @pl.when(kb == num_kb - 1)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                    acc_dk_ref, acc_dv_ref, *, scale, kv_len, q_len, block_q, block_k,
                    blocked_span, padded_q_len, padded_kv_len):
    """dK/dV tile, transposed orientation [block_k, block_q]. Q pre-scaled by
    scale*log2e and LSE by log2e (see _bwd_dq_kernel); dK therefore multiplies
    by ln2 (= scale / (scale*log2e)) to undo the scaling baked into Q."""
    qb = pl.program_id(2)
    num_qb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _():
        acc_dk_ref[:] = jnp.zeros_like(acc_dk_ref)
        acc_dv_ref[:] = jnp.zeros_like(acc_dv_ref)

    q = q_ref[0].astype(jnp.float32)  # pre-scaled by scale*log2e
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse2 = lse_ref[0][:, :1].T  # [1, block_q], exp2-domain
    delta = delta_ref[0][:, :1].T

    sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    q_start = qb * block_q
    k_start = pl.program_id(1) * block_k
    if padded_q_len > q_len:
        def _mask_qpad(sT):
            qcol = q_start + jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1)
            return jnp.where(qcol < q_len, sT, NEG_INF)  # padded queries contribute 0

        sT = jax.lax.cond(qb == num_qb - 1, _mask_qpad, lambda sT: sT, sT)
    if padded_kv_len > kv_len:
        def _mask_kpad(sT):
            krow = k_start + jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0)
            return jnp.where(krow < kv_len, sT, NEG_INF)

        sT = jax.lax.cond(
            pl.program_id(1) == pl.num_programs(1) - 1, _mask_kpad, lambda sT: sT, sT
        )
    if blocked_span is not None:
        bq0, bq1, bk0 = blocked_span

        def _mask_span(sT):
            qcol = q_start + jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1)
            krow = k_start + jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0)
            return jnp.where((qcol >= bq0) & (qcol < bq1) & (krow >= bk0), NEG_INF, sT)

        intersects = (q_start < bq1) & (q_start + block_q > bq0) & (k_start + block_k > bk0)
        sT = jax.lax.cond(intersects, _mask_span, lambda sT: sT, sT)

    pT = jnp.exp2(sT - lse2)
    acc_dv_ref[:] += jax.lax.dot_general(pT, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dpT = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dsT = pT * (dpT - delta)
    acc_dk_ref[:] += jax.lax.dot_general(dsT, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) * 0.6931471805599453

    @pl.when(qb == num_qb - 1)
    def _():
        dk_ref[0] = acc_dk_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv_ref[:].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, out, lse, g, scale, block_q, block_k, interpret, blocked_span
):
    """Tiled flash backward: returns (dq, dk, dv)."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    bh = b * h

    if block_k is None:
        block_k = _pick_block_k(s_k)
    block_q = min(block_q, _round_up(s_q, 128))
    block_k = min(block_k, _round_up(s_k, 128))
    # Q pre-scaled by scale*log2e and LSE by log2e: the kernels recover the
    # natural softmax p as exp2(s - lse2) — no per-logit multiply (matches
    # the forward's exp2-domain convention).
    q_pad = _pad_seq(
        (q.astype(jnp.float32) * (scale * 1.4426950408889634)).astype(q.dtype),
        block_q,
    )
    do_pad = _pad_seq(g, block_q)
    o_pad = _pad_seq(out, block_q)
    k_pad = _pad_seq(k, block_k)
    v_pad = _pad_seq(v, block_k)
    s_qp, s_kp = q_pad.shape[2], k_pad.shape[2]

    # delta = rowsum(dO * O); lse padded with 0 (p=exp2(-inf-0)=0 on pad rows)
    delta = jnp.sum(do_pad.astype(jnp.float32) * o_pad.astype(jnp.float32), axis=-1)
    lse_pad = jnp.pad(lse * 1.4426950408889634, ((0, 0), (0, 0), (0, s_qp - s_q)))

    q3 = q_pad.reshape(bh, s_qp, d)
    k3 = k_pad.reshape(bh, s_kp, d)
    v3 = v_pad.reshape(bh, s_kp, d)
    do3 = do_pad.reshape(bh, s_qp, d)
    # per-row scalars as 128-lane strips (TPU block layout)
    lse3 = jnp.broadcast_to(lse_pad.reshape(bh, s_qp)[..., None], (bh, s_qp, 128))
    delta3 = jnp.broadcast_to(delta.reshape(bh, s_qp)[..., None], (bh, s_qp, 128))

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=float(scale), kv_len=s_k,
            block_q=block_q, block_k=block_k, blocked_span=blocked_span,
            padded_kv_len=s_kp,
        ),
        grid=(bh, s_qp // block_q, s_kp // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda g_, i, j: (g_, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda g_, i, j: (g_, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_qp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, v3, do3, lse3, delta3)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=float(scale), kv_len=s_k, q_len=s_q,
            block_q=block_q, block_k=block_k, blocked_span=blocked_span,
            padded_q_len=s_qp, padded_kv_len=s_kp,
        ),
        grid=(bh, s_kp // block_k, s_qp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda g_, i, j: (g_, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda g_, i, j: (g_, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, s_kp, d), k.dtype),
            jax.ShapeDtypeStruct((bh, s_kp, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, v3, do3, lse3, delta3)

    dq = dq.reshape(b, h, s_qp, d)[:, :, :s_q]
    dk = dk.reshape(b, h, s_kp, d)[:, :, :s_k]
    dv = dv.reshape(b, h, s_kp, d)[:, :, :s_k]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Differentiability: flash forward + XLA-recompute backward
# ---------------------------------------------------------------------------
# pallas_call is not transparently differentiable; the custom VJP pairs the
# flash forward (which also emits per-row LSE) with tiled Pallas backward
# kernels (_bwd_dq_kernel / _bwd_dkv_kernel) — no S x S materialization in
# either direction. _xla_attention_grads remains as a reference
# implementation for tests.


def _xla_attention_grads(q, k, v, g, scale, blocked_span):
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if blocked_span is not None:
        q0, q1, k0 = blocked_span
        row = jnp.arange(q.shape[2])
        col = jnp.arange(k.shape[2])
        blocked = (row[:, None] >= q0) & (row[:, None] < q1) & (col[None, :] >= k0)
        s = jnp.where(blocked[None, None], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_diff(q, k, v, scale, block_q, block_k, interpret, blocked_span, bounded_logits):
    return _flash_impl(q, k, v, scale, block_q, block_k, interpret, blocked_span,
                       bounded_logits=bounded_logits)


def _flash_diff_fwd(q, k, v, scale, block_q, block_k, interpret, blocked_span, bounded_logits):
    out, lse = _flash_impl(q, k, v, scale, block_q, block_k, interpret, blocked_span,
                           return_lse=True, bounded_logits=bounded_logits)
    return out, (q, k, v, out, lse)


def _flash_diff_bwd(scale, block_q, block_k, interpret, blocked_span, bounded_logits, res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k, interpret, blocked_span)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret", "blocked_span",
                     "bounded_logits"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: Optional[int] = DEFAULT_BLOCK_K,
    interpret: bool = False,
    blocked_span: Optional[tuple] = None,
    bounded_logits: bool = False,
) -> jnp.ndarray:
    """Non-causal flash attention. q/k/v: [B, H, S, D] -> [B, H, S_q, D].

    ``block_k=None`` (default) picks the tile adaptively: the whole padded KV
    as one block when <= MAX_SINGLE_BLOCK_K (single softmax pass, no online
    rescaling), else the largest 128-multiple divisor of the padded length
    (maskless interior tiles), else 1024.

    ``bounded_logits=True``: the caller certifies |scaled logits| stay well
    inside the f32 exp2 range (true for qk-RMSNorm'd attention — the FLUX.2
    DiT and the Qwen3 encoders). The long-S multi-k-block path then uses a
    constant softmax anchor instead of the per-row running max (~20% faster
    at S=16896; see _flash_body). Exact while the contract holds; breaks
    LOUDLY (NaN) otherwise. FLUX2_FLASH_EXACT_MAX=1 overrides.

    Differentiable (custom VJP with tiled Pallas backward).
    ``blocked_span=(q_start, q_end, k_start)``: contiguous-segment masking —
    queries in [q_start, q_end) never attend keys >= k_start (klein-9b-kv
    extraction semantics, Flux2Attention.swift:422-437) without an S x S
    bias array.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_diff(q, k, v, float(scale), block_q, block_k, interpret, blocked_span,
                       bounded_logits)
