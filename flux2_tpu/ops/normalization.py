"""Normalization and AdaLN-modulation primitives shared across models.

These are small, fusion-friendly jnp functions: XLA folds them into the
adjacent matmuls so no handwritten kernel is needed (parity targets:
``MLXFast.rmsNorm`` use in Flux2Attention.swift:24, affine-less LayerNorm
eps 1e-6 in the DiT blocks, applyModulation/applyGate in
Flux2Modulation.swift:96-122). Statistics are computed in float32.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm over the last axis with learned scale."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax_rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Affine-less LayerNorm over the last axis (DiT block norms)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax_rsqrt(var + eps)).astype(x.dtype)


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax as lax

    return lax.rsqrt(x)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN modulation: x * (1 + scale) + shift, broadcasting [B, D] over [B, S, D]."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def gate(residual: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Gate a residual branch: residual * g, broadcasting [B, D] over [B, S, D]."""
    return residual * g[:, None, :]


def group_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm for NHWC feature maps (VAE conv stacks); f32 statistics."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    normed = ((xf - mean) * jax_rsqrt(var + eps)).reshape(b, h, w, c)
    return (normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
