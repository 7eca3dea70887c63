"""FLUX.2 32-channel KL VAE (standard + distilled small-decoder variants).

Behavior parity with ``Sources/Flux2Core/VAE/`` re-designed for TPU:
  - NHWC activations and HWIO conv kernels throughout — the native layouts
    for XLA:TPU convolutions (the reference transposes NCHW<->NHWC around
    every MLX conv; here the interchange format at the module boundary stays
    NCHW for parity, converted once per encode/decode).
  - GroupNorm statistics in f32 (ResnetBlock.swift:35-47 does the same).
  - No scaling factor on encode/decode (AutoencoderKL.swift:119-131) —
    FLUX.2 normalizes patchified latents with the checkpoint's BatchNorm
    running stats instead (LatentUtils.swift:451-497); those stats are
    loaded under the ``bn`` key and carried in this module's params.
  - Spatially tiled decode with overlap cropping (AutoencoderKL.swift:159-252)
    for large images: on TPU the main motive is bounding peak HBM for 4K+
    decodes; tiles run as a scan over precomputed offsets.

Structure (diffusers AutoencoderKL):
  encoder: conv_in 3->128, 4 down levels x2 resnets (downsample after the
  first 3), mid (resnet-attn-resnet), groupnorm-silu-conv_out -> 64ch
  (mean||logvar). decoder mirrors with layers_per_block+1 resnets per level
  and optional distilled channel widths [96,192,384,384]
  (VAEDecoder.swift:29-57).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.ops.normalization import group_norm
from flux2_tpu.utils.rngs import key_iter

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 32
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    decoder_block_out_channels: Optional[Tuple[int, ...]] = None
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    scaling_factor: float = 0.18215  # unused by FLUX.2 encode/decode; kept for parity

    @property
    def effective_decoder_channels(self) -> Tuple[int, ...]:
        return self.decoder_block_out_channels or self.block_out_channels

    @property
    def is_small_decoder(self) -> bool:
        return self.decoder_block_out_channels is not None

    @classmethod
    def from_json_dict(cls, d: dict) -> "VAEConfig":
        dec = d.get("decoder_block_out_channels")
        return cls(
            in_channels=d.get("in_channels", 3),
            out_channels=d.get("out_channels", 3),
            latent_channels=d.get("latent_channels", 32),
            block_out_channels=tuple(d.get("block_out_channels", (128, 256, 512, 512))),
            decoder_block_out_channels=tuple(dec) if dec else None,
            layers_per_block=d.get("layers_per_block", 2),
            norm_num_groups=d.get("norm_num_groups", 32),
            norm_eps=d.get("norm_eps", 1e-6),
            scaling_factor=d.get("scaling_factor", 0.18215),
        )


FLUX2_VAE = VAEConfig()
FLUX2_VAE_SMALL_DECODER = VAEConfig(decoder_block_out_channels=(96, 192, 384, 384))

# Tiny hermetic-test config.
TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4, latent_channels=4)


@dataclasses.dataclass(frozen=True)
class TilingConfig:
    """Spatial tiling for the decoder (latent-space units)."""

    tile_size: int = 64  # 512 px output
    tile_overlap: int = 8  # 64 px
    min_tile_threshold: int = 128


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _conv(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    k1, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(k1, (kh, kw, cin, cout), jnp.float32).astype(dtype) * fan_in**-0.5,
        "bias": jnp.zeros((cout,), dtype),
    }


def _gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _dense(key, cin, cout, dtype):
    return {
        "kernel": jax.random.normal(key, (cin, cout), jnp.float32).astype(dtype) * cin**-0.5,
        "bias": jnp.zeros((cout,), dtype),
    }


def _resnet(key, cin, cout, dtype):
    k = jax.random.split(key, 3)
    p = {
        "norm1": _gn(cin, dtype),
        "conv1": _conv(k[0], 3, 3, cin, cout, dtype),
        "norm2": _gn(cout, dtype),
        "conv2": _conv(k[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv(k[2], 1, 1, cin, cout, dtype)
    return p


def _attn(key, c, dtype):
    k = jax.random.split(key, 4)
    return {
        "group_norm": _gn(c, dtype),
        "to_q": _dense(k[0], c, c, dtype),
        "to_k": _dense(k[1], c, c, dtype),
        "to_v": _dense(k[2], c, c, dtype),
        "to_out": _dense(k[3], c, c, dtype),
    }


def init_params(key: jax.Array, config: VAEConfig = FLUX2_VAE, dtype: jnp.dtype = jnp.float32) -> Params:
    keys = key_iter(key, 256)
    ch = config.block_out_channels
    lc = config.latent_channels

    # --- encoder ---
    enc: Params = {"conv_in": _conv(next(keys), 3, 3, config.in_channels, ch[0], dtype)}
    prev = ch[0]
    down: List[Params] = []
    for i, c in enumerate(ch):
        resnets = []
        for _ in range(config.layers_per_block):
            resnets.append(_resnet(next(keys), prev, c, dtype))
            prev = c
        blk: Params = {"resnets": resnets}
        if i < len(ch) - 1:
            blk["downsample"] = _conv(next(keys), 3, 3, c, c, dtype)
        down.append(blk)
    enc["down_blocks"] = down
    mid_c = ch[-1]
    enc["mid"] = {
        "resnet1": _resnet(next(keys), mid_c, mid_c, dtype),
        "attn": _attn(next(keys), mid_c, dtype),
        "resnet2": _resnet(next(keys), mid_c, mid_c, dtype),
    }
    enc["norm_out"] = _gn(mid_c, dtype)
    enc["conv_out"] = _conv(next(keys), 3, 3, mid_c, 2 * lc, dtype)

    # --- decoder ---
    dch = config.effective_decoder_channels
    dec: Params = {"conv_in": _conv(next(keys), 3, 3, lc, dch[-1], dtype)}
    dmid = dch[-1]
    dec["mid"] = {
        "resnet1": _resnet(next(keys), dmid, dmid, dtype),
        "attn": _attn(next(keys), dmid, dtype),
        "resnet2": _resnet(next(keys), dmid, dmid, dtype),
    }
    prev = dmid
    up: List[Params] = []
    rev = tuple(reversed(dch))
    for i, c in enumerate(rev):
        resnets = []
        for j in range(config.layers_per_block + 1):
            resnets.append(_resnet(next(keys), prev if j == 0 else c, c, dtype))
        prev = c
        blk = {"resnets": resnets}
        if i < len(rev) - 1:
            blk["upsample"] = _conv(next(keys), 3, 3, c, c, dtype)
        up.append(blk)
    dec["up_blocks"] = up
    dec["norm_out"] = _gn(dch[0], dtype)
    dec["conv_out"] = _conv(next(keys), 3, 3, dch[0], config.out_channels, dtype)

    params: Params = {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(next(keys), 1, 1, 2 * lc, 2 * lc, dtype),
        "post_quant_conv": _conv(next(keys), 1, 1, lc, lc, dtype),
        # Patchified-latent BatchNorm running stats (checkpoint key "bn.*").
        # 128 features = 32 latent channels x 2x2 patch.
        "bn": {
            "running_mean": jnp.zeros((lc * 4,), jnp.float32),
            "running_var": jnp.ones((lc * 4,), jnp.float32),
        },
    }
    return params


# ---------------------------------------------------------------------------
# Forward primitives (NHWC)
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding, dimension_numbers=_DN
    )
    return out + p["bias"].astype(x.dtype)


def _resnet_fwd(p: Params, x: jnp.ndarray, groups: int, eps: float) -> jnp.ndarray:
    h = jax.nn.silu(group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], groups, eps))
    h = _conv2d(p["conv1"], h)
    h = jax.nn.silu(group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"], groups, eps))
    h = _conv2d(p["conv2"], h)
    shortcut = _conv2d(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    return h + shortcut


def _attn_fwd(p: Params, x: jnp.ndarray, groups: int, eps: float) -> jnp.ndarray:
    """Single-head spatial self-attention in the mid blocks (ResnetBlock.swift:262+).

    Deliberately the dense XLA path, NOT the flash kernel: measured on v5e at
    1024px (16384 tokens, f32), full decode is 134.8 ms dense vs 144.8 ms
    through flash — the VAE is conv-dominated and f32, and XLA's fused
    einsum+softmax wins at this single-head shape.
    """
    b, h, w, c = x.shape
    hidden = group_norm(x, p["group_norm"]["scale"], p["group_norm"]["bias"], groups, eps)
    hidden = hidden.reshape(b, h * w, c)
    q = hidden @ p["to_q"]["kernel"] + p["to_q"]["bias"]
    k = hidden @ p["to_k"]["kernel"] + p["to_k"]["bias"]
    v = hidden @ p["to_v"]["kernel"] + p["to_v"]["bias"]
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * (c**-0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v)
    out = out @ p["to_out"]["kernel"] + p["to_out"]["bias"]
    return out.reshape(b, h, w, c) + x


def _downsample_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 conv with asymmetric bottom/right zero pad (diffusers
    downsample_padding=0 — ResnetBlock.swift:199-210)."""
    padded = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return _conv2d(p, padded, stride=2, padding="VALID")


def _upsample_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample + 3x3 conv."""
    b, h, w, c = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
    return _conv2d(p, up)


def _mid_fwd(p: Params, x: jnp.ndarray, groups: int, eps: float) -> jnp.ndarray:
    x = _resnet_fwd(p["resnet1"], x, groups, eps)
    x = _attn_fwd(p["attn"], x, groups, eps)
    return _resnet_fwd(p["resnet2"], x, groups, eps)


# ---------------------------------------------------------------------------
# Encode / decode
# ---------------------------------------------------------------------------


def encode_moments(params: Params, x: jnp.ndarray, config: VAEConfig = FLUX2_VAE) -> jnp.ndarray:
    """Image [B, 3, H, W] in [-1, 1] -> posterior moments [B, 2*latent, H/8, W/8] (NCHW)."""
    g, eps = config.norm_num_groups, config.norm_eps
    enc = params["encoder"]
    h = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
    h = _conv2d(enc["conv_in"], h)
    for blk in enc["down_blocks"]:
        for r in blk["resnets"]:
            h = _resnet_fwd(r, h, g, eps)
        if "downsample" in blk:
            h = _downsample_fwd(blk["downsample"], h)
    h = _mid_fwd(enc["mid"], h, g, eps)
    h = jax.nn.silu(group_norm(h, enc["norm_out"]["scale"], enc["norm_out"]["bias"], g, eps))
    h = _conv2d(enc["conv_out"], h)
    h = _conv2d(params["quant_conv"], h)
    return jnp.transpose(h, (0, 3, 1, 2))  # NHWC -> NCHW


def encode(
    params: Params,
    x: jnp.ndarray,
    config: VAEConfig = FLUX2_VAE,
    sample_posterior: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Encode to latents [B, 32, H/8, W/8]. No scaling factor (FLUX.2)."""
    moments = encode_moments(params, x, config)
    lc = config.latent_channels
    mean, logvar = moments[:, :lc], moments[:, lc:]
    if sample_posterior:
        if key is None:
            raise ValueError("sample_posterior=True requires a PRNG key")
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return mean


def decode(params: Params, z: jnp.ndarray, config: VAEConfig = FLUX2_VAE) -> jnp.ndarray:
    """Latents [B, 32, h, w] -> image [B, 3, 8h, 8w] in [-1, 1] (NCHW)."""
    g, eps = config.norm_num_groups, config.norm_eps
    dec = params["decoder"]
    h = jnp.transpose(z, (0, 2, 3, 1))
    h = _conv2d(params["post_quant_conv"], h)
    h = _conv2d(dec["conv_in"], h)
    h = _mid_fwd(dec["mid"], h, g, eps)
    for blk in dec["up_blocks"]:
        for r in blk["resnets"]:
            h = _resnet_fwd(r, h, g, eps)
        if "upsample" in blk:
            h = _upsample_fwd(blk["upsample"], h)
    h = jax.nn.silu(group_norm(h, dec["norm_out"]["scale"], dec["norm_out"]["bias"], g, eps))
    h = _conv2d(dec["conv_out"], h)
    return jnp.transpose(h, (0, 3, 1, 2))


def decode_tiled(
    params: Params,
    z: jnp.ndarray,
    config: VAEConfig = FLUX2_VAE,
    tiling: TilingConfig = TilingConfig(),
) -> jnp.ndarray:
    """Tiled decode with overlap cropping (AutoencoderKL.swift:159-252).

    Decodes overlapping latent tiles and crops the halo before stitching, so
    seams fall inside converged interior pixels. Peak HBM scales with the
    tile size instead of the full image.
    """
    _, _, H, W = z.shape
    if H <= tiling.min_tile_threshold and W <= tiling.min_tile_threshold:
        return decode(params, z, config)

    ts, ov = tiling.tile_size, tiling.tile_overlap
    stride = ts - ov
    up = 2 ** (len(config.effective_decoder_channels) - 1)  # latent -> pixel scale

    def tile_starts(total: int) -> List[int]:
        starts, pos = [], 0
        while True:
            start = min(pos, max(0, total - ts))
            starts.append(start)
            if start + ts >= total:
                return starts
            pos += stride

    ys, xs = tile_starts(H), tile_starts(W)
    canvas = jnp.zeros((z.shape[0], config.out_channels, H * up, W * up), z.dtype)
    for iy, y0 in enumerate(ys):
        for ix, x0 in enumerate(xs):
            tile = z[:, :, y0 : min(y0 + ts, H), x0 : min(x0 + ts, W)]
            out = decode(params, tile, config)
            # Crop half the overlap halo off leading edges (interior tiles
            # only); trailing edges are overwritten by the next tile's paste.
            sy = 0 if iy == 0 else (ov // 2) * up
            sx = 0 if ix == 0 else (ov // 2) * up
            canvas = jax.lax.dynamic_update_slice(
                canvas, out[:, :, sy:, sx:].astype(canvas.dtype), (0, 0, y0 * up + sy, x0 * up + sx)
            )
    return canvas


def get_batchnorm_stats(params: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(running_mean, running_var) for patchified-latent normalization."""
    return params["bn"]["running_mean"], params["bn"]["running_var"]


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
