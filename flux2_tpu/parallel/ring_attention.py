"""Ring attention: sequence-parallel exact attention over the mesh.

The reference handles long sequences (up to ~45k tokens with 6 reference
images on Dev — SURVEY.md §5) with max-pixel caps, KV caching, and tiling.
The TPU-native mechanism is sequence parallelism: shard the TOKEN axis over
mesh devices and rotate K/V blocks around the ring with
``jax.lax.ppermute``, accumulating exact softmax online — attention memory
per device drops from O(S^2) to O((S/n)^2) and K/V transfers ride the ICI
ring concurrently with compute.

FLUX.2's joint attention is non-causal, so every device needs every K/V
block exactly once — the pure ring with no load-imbalance tricks. The math
is the same online softmax as the Pallas flash kernel, lifted one level up
(blocks = device shards); inside each step the local product can itself use
the flash kernel.

Usage:
    out = ring_attention(q, k, v, mesh=mesh, axis=TP_AXIS)
with q/k/v [B, H, S, D] global arrays; S must divide by the axis size.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flux2_tpu.parallel.mesh import TP_AXIS

NEG_INF = -1e30


def _ring_attention_local(q, k, v, *, axis: str, scale: float, use_flash: bool = False, interpret: bool = False, bounded_logits: bool = False):
    """shard_map body: q/k/v are LOCAL shards [B, H, S/n, D].

    ``use_flash=True`` computes each ring step's local block with the Pallas
    flash kernel (returning the block LSE) and merges blocks with the exact
    log-sum-exp formula — the MXU path inside the ring instead of einsum.
    """
    if use_flash:
        return _ring_flash(q, k, v, axis, scale, interpret, bounded_logits)
    return _ring_einsum(q, k, v, axis=axis, scale=scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_flash(q, k, v, axis, scale, interpret, bounded_logits):
    """Flash-kernel ring forward. Differentiable via custom VJP: pallas_call
    has no transpose rule, so the backward RECOMPUTES the ring with the
    einsum formulation (remat-style) and differentiates that — the flash
    forward stays on the MXU path, gradients stay exact."""
    from flux2_tpu.ops.flash_attention import _flash_impl

    n = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    b, h, s_loc, d = q.shape

    def step(carry, _):
        k_cur, v_cur, lse, out = carry
        o_i, lse_i = _flash_impl(
            q, k_cur, v_cur, scale=scale, interpret=interpret, return_lse=True,
            bounded_logits=bounded_logits,
        )  # o_i [B,H,S,D], lse_i [B,H,S] (LSE is anchor-invariant)
        lse_new = jnp.logaddexp(lse, lse_i)
        w_old = jnp.exp(lse - lse_new)[..., None]
        w_new = jnp.exp(lse_i - lse_new)[..., None]
        out_new = out * w_old + o_i.astype(jnp.float32) * w_new
        k_next = jax.lax.ppermute(k_cur, axis, perm)
        v_next = jax.lax.ppermute(v_cur, axis, perm)
        return (k_next, v_next, lse_new, out_new), None

    init = (
        k,
        v,
        jnp.full((b, h, s_loc), NEG_INF, jnp.float32),
        jnp.zeros((b, h, s_loc, d), jnp.float32),
    )
    (k, v, lse, out), _ = jax.lax.scan(step, init, None, length=n)
    return out.astype(q.dtype)


def _ring_flash_fwd(q, k, v, axis, scale, interpret, bounded_logits):
    return _ring_flash(q, k, v, axis, scale, interpret, bounded_logits), (q, k, v)


def _ring_flash_bwd(axis, scale, interpret, bounded_logits, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _ring_einsum(q_, k_, v_, axis=axis, scale=scale), q, k, v)
    return vjp(g.astype(q.dtype))


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def _ring_einsum(q, k, v, *, axis: str, scale: float):
    """Einsum online-softmax ring (f32 accumulators); fully differentiable."""
    n = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    b, h, s_loc, d = q.shape
    qf = q.astype(jnp.float32)

    def step(carry, _):
        k_cur, v_cur, m, l, acc = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32)) * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32))
        # rotate K/V to the next device; the last rotation is wasted but keeps
        # the scan body uniform (XLA overlaps it with the final accumulate).
        k_next = jax.lax.ppermute(k_cur, axis, perm)
        v_next = jax.lax.ppermute(v_cur, axis, perm)
        return (k_next, v_next, m_new, l_new, acc_new), None

    init = (
        k,
        v,
        jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32),
        jnp.zeros((b, h, s_loc, 1), jnp.float32),
        jnp.zeros((b, h, s_loc, d), jnp.float32),
    )
    (k, v, m, l, acc), _ = jax.lax.scan(step, init, None, length=n)
    return (acc / l).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = TP_AXIS,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
    bounded_logits: bool = False,
) -> jnp.ndarray:
    """Exact non-causal attention with the sequence axis sharded over `axis`.

    q/k/v: [B, H, S, D] (global). S must be divisible by mesh.shape[axis].
    ``use_flash`` (default: auto — on for TPU backends with flash-compatible
    shapes) runs each ring step's local block through the Pallas flash
    kernel and merges blocks by log-sum-exp; otherwise the einsum online
    softmax.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu"
            and os.environ.get("FLUX2_DISABLE_FLASH", "0") != "1"
            and q.shape[-1] % 128 == 0
        )
    n = mesh.shape[axis]
    if q.shape[2] % n or k.shape[2] % n:
        raise ValueError(f"sequence {q.shape[2]}/{k.shape[2]} not divisible by {axis}={n}")

    # Keep the head axis sharded over tp inside the ring (when it already is,
    # from the tp-column-parallel QKV projections) — otherwise shard_map's
    # implicit replication all-gathers heads at the ring boundary.
    head_axis = None
    if axis != TP_AXIS and mesh.shape.get(TP_AXIS, 1) > 1 and q.shape[1] % mesh.shape[TP_AXIS] == 0:
        head_axis = TP_AXIS
    spec = P(None, head_axis, axis, None)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis=axis, scale=float(scale), use_flash=bool(use_flash), interpret=interpret, bounded_logits=bounded_logits),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
