"""Latent-space geometry for FLUX.2: patchify/pack, position IDs, normalization.

Behavior-equivalent to the reference's ``LatentUtils``
(``Sources/Flux2Core/Pipeline/LatentUtils.swift``) but written as pure jnp
transforms with static shapes so every call fuses into the surrounding jit.

Conventions (parity with the reference):
  - "patchified" latents: [B, 128, H/16, W/16]   (32 VAE channels x 2x2 patch)
  - "sequence"   latents: [B, (H/16)*(W/16), 128] (transformer tokens)
  - "VAE"        latents: [B, 32, H/8, W/8]
  - position IDs: int32 [S, 4] columns (T, H, W, L)
  - reference image i gets T = scale * (i + 1)  (scale defaults to 10)

Reference anchors: generatePatchifiedLatents :23-42, pack/unpack :76-142,
packLatentsToPatchified :186-212, position IDs :256-372, validateDimensions
:382-394, Ostris scale/shift :422-446, BatchNorm normalize :451-497.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LATENT_CHANNELS = 32
PATCH_SIZE = 2
PATCHIFIED_CHANNELS = LATENT_CHANNELS * PATCH_SIZE * PATCH_SIZE  # 128

# Ostris / ai-toolkit scale-shift used by the training path.
FLUX2_SCALING_FACTOR = 0.3611
FLUX2_SHIFT_FACTOR = 0.1159

BATCHNORM_EPS = 1e-4  # FLUX.2 batch_norm_eps


def validate_dimensions(height: int, width: int, patch_size: int = PATCH_SIZE) -> Tuple[int, int]:
    """Round requested pixel dims up to a multiple of 8*patch_size (=16)."""
    factor = 8 * patch_size
    return (
        (height + factor - 1) // factor * factor,
        (width + factor - 1) // factor * factor,
    )


def latent_dims(height: int, width: int) -> Tuple[int, int, int]:
    """(latent_h, latent_w, num_patches) for a pixel-space height/width."""
    lh, lw = height // 8, width // 8
    return lh, lw, (lh // PATCH_SIZE) * (lw // PATCH_SIZE)


def generate_patchified_latents(
    key: jax.Array,
    height: int,
    width: int,
    batch_size: int = 1,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Unit-normal noise directly in patchified format [B, 128, H/16, W/16]."""
    shape = (batch_size, PATCHIFIED_CHANNELS, height // 16, width // 16)
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


def pack_patchified_to_sequence(patchified: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] -> [B, H*W, C]."""
    b, c, h, w = patchified.shape
    return jnp.transpose(patchified, (0, 2, 3, 1)).reshape(b, h * w, c)


def unpack_sequence_to_patchified(sequence: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[B, S, C] -> [B, C, H/16, W/16] given the pixel-space height/width."""
    b, _, c = sequence.shape
    ph, pw = height // 16, width // 16
    return jnp.transpose(sequence.reshape(b, ph, pw, c), (0, 3, 1, 2))


def unpatchify_latents(patchified: jnp.ndarray, latent_channels: int = LATENT_CHANNELS, patch_size: int = PATCH_SIZE) -> jnp.ndarray:
    """[B, C*p*p, H/16, W/16] -> [B, C, H/8, W/8] (pixel-shuffle)."""
    b, _, ph, pw = patchified.shape
    x = patchified.reshape(b, latent_channels, patch_size, patch_size, ph, pw)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # [B, C, H, p, W, p]
    return x.reshape(b, latent_channels, ph * patch_size, pw * patch_size)


def patchify_latents(latents: jnp.ndarray, patch_size: int = PATCH_SIZE) -> jnp.ndarray:
    """[B, 32, H/8, W/8] -> [B, 128, H/16, W/16] (inverse of unpatchify).

    Used on VAE-encoded reference images for I2I conditioning.
    """
    b, c, h, w = latents.shape
    ph, pw = h // patch_size, w // patch_size
    x = latents.reshape(b, c, ph, patch_size, pw, patch_size)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # [B, pH, pW, C, p, p]
    x = x.reshape(b, ph, pw, c * patch_size * patch_size)
    return jnp.transpose(x, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Position IDs — int32 [S, 4] with columns (T, H, W, L)
# ---------------------------------------------------------------------------


def image_position_ids(height: int, width: int, patch_size: int = PATCH_SIZE) -> np.ndarray:
    """Position IDs for output-image tokens: T=0, (H, W) grid, L=0."""
    nh, nw = height // (8 * patch_size), width // (8 * patch_size)
    hh, ww = np.meshgrid(np.arange(nh, dtype=np.int32), np.arange(nw, dtype=np.int32), indexing="ij")
    zeros = np.zeros(nh * nw, dtype=np.int32)
    return np.stack([zeros, hh.reshape(-1), ww.reshape(-1), zeros], axis=1)


def text_position_ids(length: int) -> np.ndarray:
    """Position IDs for text tokens: T=H=W=0, L = 0..length-1."""
    zeros = np.zeros(length, dtype=np.int32)
    return np.stack([zeros, zeros, zeros, np.arange(length, dtype=np.int32)], axis=1)


def reference_image_position_ids(
    latent_heights: Sequence[int],
    latent_widths: Sequence[int],
    scale: int = 10,
) -> np.ndarray:
    """Position IDs for reference-image tokens (I2I conditioning).

    Reference image i (patchified grid h_i x w_i) gets a unique time
    coordinate T = scale * (i + 1) so multiple references are separated along
    the T RoPE axis. Heights/widths here are patchified (H/16) dims.
    """
    parts = []
    for i, (h, w) in enumerate(zip(latent_heights, latent_widths)):
        t = np.full(h * w, scale * (i + 1), dtype=np.int32)
        hh, ww = np.meshgrid(np.arange(h, dtype=np.int32), np.arange(w, dtype=np.int32), indexing="ij")
        parts.append(np.stack([t, hh.reshape(-1), ww.reshape(-1), np.zeros(h * w, dtype=np.int32)], axis=1))
    return np.concatenate(parts, axis=0)


def combine_position_ids(text_length: int, height: int, width: int) -> np.ndarray:
    """[txt_ids ; img_ids] for the joint sequence (text first)."""
    return np.concatenate([text_position_ids(text_length), image_position_ids(height, width)], axis=0)


# ---------------------------------------------------------------------------
# Latent normalization
# ---------------------------------------------------------------------------


def normalize_with_batchnorm(
    latents: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    eps: float = BATCHNORM_EPS,
) -> jnp.ndarray:
    """(x - mean) / sqrt(var + eps) with [C] stats broadcast over NCHW."""
    c = running_mean.shape[0]
    mean = running_mean.reshape(1, c, 1, 1).astype(jnp.float32)
    std = jnp.sqrt(running_var.reshape(1, c, 1, 1).astype(jnp.float32) + eps)
    return ((latents.astype(jnp.float32) - mean) / std).astype(latents.dtype)


def denormalize_with_batchnorm(
    latents: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    eps: float = BATCHNORM_EPS,
) -> jnp.ndarray:
    """x * sqrt(var + eps) + mean — inverse of normalize_with_batchnorm."""
    c = running_mean.shape[0]
    mean = running_mean.reshape(1, c, 1, 1).astype(jnp.float32)
    std = jnp.sqrt(running_var.reshape(1, c, 1, 1).astype(jnp.float32) + eps)
    return (latents.astype(jnp.float32) * std + mean).astype(latents.dtype)


def normalize_flux2_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """Ostris training normalization: scale * (x - shift)."""
    return FLUX2_SCALING_FACTOR * (latents - FLUX2_SHIFT_FACTOR)


def denormalize_flux2_latents(normalized: jnp.ndarray) -> jnp.ndarray:
    """Inverse of normalize_flux2_latents."""
    return normalized / FLUX2_SCALING_FACTOR + FLUX2_SHIFT_FACTOR
