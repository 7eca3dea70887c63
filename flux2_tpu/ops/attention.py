"""Scaled dot-product attention dispatch for the DiT and text encoders.

Layout convention is [B, H, S, D] (matching the reference's SDPA call sites,
``Flux2Attention.swift:168-174`` / ``Flux2ParallelAttention.swift:104-111``).

Two paths:
  - ``xla``: einsum attention with float32 softmax. Correct everywhere (CPU
    test meshes included); XLA fuses the scale/softmax chain but materializes
    the [B, H, S, S] logits.
  - ``flash``: a Pallas TPU flash-attention kernel (tiled online softmax, no
    S x S materialization) — see ``flux2_tpu.ops.flash_attention``. Used
    automatically on TPU for shapes that satisfy its tiling constraints.

Set ``FLUX2_DISABLE_FLASH=1`` to force the XLA path (mirrors the reference's
``FLUX2_DISABLE_FUSED_KERNELS`` kill-switch).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


def _flash_enabled() -> bool:
    return os.environ.get("FLUX2_DISABLE_FLASH", "0") != "1"


@functools.lru_cache(maxsize=64)
def _warn_ring_fallback(s_q: int, s_k: int, n: int) -> None:
    """Once per shape: context parallelism was requested but not taken."""
    import logging

    logging.getLogger("flux2_tpu").warning(
        "ring attention requested but sequence (%d q / %d kv tokens) is not "
        "divisible by the %d-way mesh axis; falling back to dense attention "
        "(no context-parallel memory savings for this shape)", s_q, s_k, n,
    )


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing must never fail
        return False


def sdpa_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference einsum attention. q/k/v: [B, H, S, D]; bias: additive [.., S_q, S_k]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(scale)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    blocked_span: Optional[tuple] = None,
    ring: Optional[tuple] = None,
    bounded_logits: bool = False,
) -> jnp.ndarray:
    """Dispatching scaled dot-product attention ([B, H, S, D]).

    ``blocked_span=(q0, q1, k0)``: contiguous-segment mask (queries in
    [q0, q1) blind to keys >= k0) — O(1) metadata instead of an O(S^2)
    additive bias; the flash kernel applies it in-tile.

    ``ring=(mesh, axis)``: sequence-parallel exact attention — the token
    axis is sharded over ``mesh.shape[axis]`` devices and K/V blocks rotate
    around the ICI ring (``flux2_tpu.parallel.ring_attention``). Only taken
    for unmasked attention (bias/blocked_span fall back to the dense paths,
    which the masked KV-extract pass uses once per generation).

    ``bounded_logits=True``: caller certifies qk-normed (range-bounded)
    logits, unlocking the flash kernel's constant-anchor softmax at long S
    (see flash_attention.bounded_logits).
    """
    if ring is not None and bias is None and blocked_span is None:
        from flux2_tpu.parallel.ring_attention import ring_attention

        mesh, axis = ring
        if q.shape[2] % mesh.shape[axis] == 0 and k.shape[2] % mesh.shape[axis] == 0:
            return ring_attention(q, k, v, mesh=mesh, axis=axis, scale=scale,
                                  bounded_logits=bounded_logits)
        _warn_ring_fallback(q.shape[2], k.shape[2], mesh.shape[axis])
    if bias is None and _flash_enabled() and _on_tpu():
        from flux2_tpu.ops import flash_attention as fa

        if fa.supported(q, k, v):
            return fa.flash_attention(q, k, v, scale=scale, blocked_span=blocked_span,
                                      bounded_logits=bounded_logits)
    if blocked_span is not None:
        q0, q1, k0 = blocked_span
        row = jnp.arange(q.shape[2])
        col = jnp.arange(k.shape[2])
        blocked = (row[:, None] >= q0) & (row[:, None] < q1) & (col[None, :] >= k0)
        span_bias = jnp.where(blocked, -1e30, 0.0).astype(jnp.float32)[None, None]
        bias = span_bias if bias is None else bias + span_bias
    return sdpa_xla(q, k, v, scale=scale, bias=bias)
