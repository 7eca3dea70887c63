"""4-axis rotary position embeddings for the FLUX.2 DiT.

FLUX.2 uses a 4D RoPE over (T, H, W, L) position axes with axes_dims
[32, 32, 32, 32] (head_dim 128) and theta 2000. Per axis, frequencies are
``theta ** -(arange(0, dim, 2) / dim)``; cos/sin are repeat-interleaved by 2
*within* each axis and the four axis embeddings concatenated — matching
diffusers and the reference (``Flux2RoPE.swift:123-169``). Rotation treats
consecutive dim pairs as (real, imag): out = x*cos + rotate_half(x)*sin with
rotate_half interleaving (-imag, real) (``Flux2RoPE.swift:232-241``).

TPU notes: cos/sin are computed once per schedule in float32 (the reference's
LRU cache becomes "hoist out of the scan"), and application is a cheap VPU
elementwise op that XLA fuses into the surrounding QKV projections; the
Pallas flash-attention kernel can also fold it into its prologue.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

DEFAULT_AXES_DIMS = (32, 32, 32, 32)
DEFAULT_THETA = 2000.0


def rope_embeddings(
    ids: jnp.ndarray,
    axes_dims: Sequence[int] = DEFAULT_AXES_DIMS,
    theta: float = DEFAULT_THETA,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin embeddings for position IDs.

    Args:
      ids: int [S, len(axes_dims)] position IDs, one column per axis.
    Returns:
      (cos, sin) float32 [S, sum(axes_dims)], interleaved per-axis then
      concatenated across axes.
    """
    s = ids.shape[0]
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dims):
        pos = ids[:, axis].astype(jnp.float32)  # [S]
        freq_seq = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim  # [dim/2]
        inv_freq = theta ** -freq_seq
        freqs = pos[:, None] * inv_freq[None, :]  # [S, dim/2]
        # repeat_interleave(2, axis=-1): [c0, c0, c1, c1, ...]
        cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1).reshape(s, dim)
        sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1).reshape(s, dim)
        cos_parts.append(cos)
        sin_parts.append(sin)
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotation: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    shape = x.shape
    x2 = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    real, imag = x2[..., 0], x2[..., 1]
    return jnp.stack([-imag, real], axis=-1).reshape(shape)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding to [..., S, D] given cos/sin [S, D].

    Math is done in float32 (the reference's fused Metal kernel also keeps
    cos/sin in f32) and cast back to x.dtype.
    """
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half_interleaved(xf) * sin
    return out.astype(x.dtype)
