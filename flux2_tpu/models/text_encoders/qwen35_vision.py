"""Qwen3.5 vision tower + VLM embedding merge + image preprocessing.

Capability parity with ``Sources/FluxTextEncoders/Model/Qwen35/
Qwen35VisionEncoder.swift`` / ``Qwen35VLM.swift`` / ``Vision/
Qwen35ImageProcessor.swift``:

  - 24-layer ViT: Conv3d-style patch embed (temporal 2 x 16 x 16 over a
    duplicated frame — implemented as one linear over the flattened patch,
    since stride == kernel), learned 48x48 position grid bilinearly
    interpolated to the actual patch grid, 2D rotary embeddings (theta 1e4,
    half-dims H then W), pre-LN blocks with fused-QKV attention + GELU MLP,
    and a 2x2 spatial merger (LN on 1024 -> group 4 patches -> fc1 -> GELU
    -> fc2 -> 2560). All in "spatial-merge order" (2x2 blocks contiguous).
  - smart_resize: aspect-preserving resize clamped to [min, max] side and
    rounded to multiples of patch*merge (=32); normalize mean=0.5 std=0.5.
  - VLM merge: text embeddings with image-token positions replaced by
    vision embeddings (vectorized scatter instead of the reference's
    per-token loop).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flux2_tpu.utils.rngs import key_iter

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Qwen35VisionConfig:
    depth: int = 24
    hidden_size: int = 1024
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    in_channels: int = 3
    out_hidden_size: int = 2560
    num_position_embeddings: int = 2304  # 48 x 48
    image_token_id: int = 248056

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def merge_factor(self) -> int:
        return self.patch_size * self.spatial_merge_size  # 32

    @classmethod
    def from_json_dict(cls, d: dict, image_token_id: Optional[int] = None) -> "Qwen35VisionConfig":
        """Parse an HF ``vision_config`` section (Qwen3-VL layout)."""
        return cls(
            depth=int(d.get("depth", 24)),
            hidden_size=int(d.get("hidden_size", 1024)),
            num_heads=int(d.get("num_heads", 16)),
            intermediate_size=int(d.get("intermediate_size", 4096)),
            patch_size=int(d.get("patch_size", 16)),
            spatial_merge_size=int(d.get("spatial_merge_size", 2)),
            temporal_patch_size=int(d.get("temporal_patch_size", 2)),
            in_channels=int(d.get("in_channels", d.get("in_chans", 3))),
            out_hidden_size=int(d.get("out_hidden_size", 2560)),
            num_position_embeddings=int(d.get("num_position_embeddings", 2304)),
            image_token_id=int(image_token_id if image_token_id is not None else 248056),
        )


TINY_VISION = Qwen35VisionConfig(
    depth=2, hidden_size=32, num_heads=2, intermediate_size=64,
    num_position_embeddings=16, out_hidden_size=48,
)


def _lin(key, i, o, dtype):
    k1, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(k1, (i, o), jnp.float32).astype(dtype) * i**-0.5,
        "bias": jnp.zeros((o,), dtype),
    }


def init_params(key: jax.Array, cfg: Qwen35VisionConfig = TINY_VISION, dtype=jnp.float32) -> Params:
    keys = key_iter(key, cfg.depth * 4 + 8)
    h = cfg.hidden_size
    blocks = []
    for _ in range(cfg.depth):
        blocks.append(
            {
                "norm1": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
                "qkv": _lin(next(keys), h, 3 * h, dtype),
                "proj": _lin(next(keys), h, h, dtype),
                "norm2": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
                "fc1": _lin(next(keys), h, cfg.intermediate_size, dtype),
                "fc2": _lin(next(keys), cfg.intermediate_size, h, dtype),
            }
        )
    merged = h * cfg.spatial_merge_size**2
    return {
        "patch_embed": _lin(next(keys), cfg.patch_dim, h, dtype),
        "pos_embed": jax.random.normal(next(keys), (cfg.num_position_embeddings, h), jnp.float32).astype(dtype) * 0.02,
        "blocks": blocks,
        "merger": {
            "norm": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            "fc1": _lin(next(keys), merged, merged, dtype),
            "fc2": _lin(next(keys), merged, cfg.out_hidden_size, dtype),
        },
    }


# ---------------------------------------------------------------------------
# Preprocessing
# ---------------------------------------------------------------------------


def smart_resize(h: int, w: int, factor: int = 32, min_side: int = 256, max_side: int = 1280) -> Tuple[int, int]:
    """Aspect-preserving target dims: clamp sides, round to multiples of factor."""
    th, tw = float(h), float(w)
    mx = max(th, tw)
    if mx > max_side:
        s = max_side / mx
        th, tw = th * s, tw * s
    mn = min(th, tw)
    if mn < min_side:
        s = min_side / mn
        th, tw = th * s, tw * s
    th = max(factor, round(th / factor) * factor)
    tw = max(factor, round(tw / factor) * factor)
    return int(th), int(tw)


def preprocess_image(image: np.ndarray, cfg: Qwen35VisionConfig, max_side: int = 1280) -> np.ndarray:
    """[H, W, 3] float [0,1] -> resized + normalized ([-1,1], mean=std=0.5)."""
    from flux2_tpu.utils import native

    th, tw = smart_resize(image.shape[0], image.shape[1], cfg.merge_factor, max_side=max_side)
    resized = native.resize_bilinear(np.asarray(image, np.float32), th, tw)
    return (resized - 0.5) / 0.5


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _patchify(pixels: jnp.ndarray, cfg: Qwen35VisionConfig) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, numPatches, patch_dim] in spatial-merge order.

    The Conv3d (kernel == stride) over a duplicated temporal frame reduces
    to a linear over the flattened [t=2, 16, 16, 3] patch.
    """
    b, h, w, c = pixels.shape
    p, m = cfg.patch_size, cfg.spatial_merge_size
    gh, gw = h // p, w // p
    x = pixels.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, C]
    x = x.reshape(b, gh, gw, p * p * c)
    # duplicated temporal frame: concat the patch with itself along features
    # in temporal-major order ([t, p, p, c] flattening)
    x = jnp.concatenate([x, x], axis=-1)
    # spatial-merge order: [gh/m, m, gw/m, m] -> [gh/m, gw/m, m, m]
    x = x.reshape(b, gh // m, m, gw // m, m, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, -1)


def _interp_pos_embed(pos_embed: jnp.ndarray, gh: int, gw: int, m: int) -> jnp.ndarray:
    """Bilinear interpolation of the learned grid to [gh*gw, D], merge order."""
    n = int(np.sqrt(pos_embed.shape[0]))
    d = pos_embed.shape[1]
    grid = pos_embed.reshape(n, n, d)
    hi = np.linspace(0, n - 1, gh) if gh > 1 else np.zeros(1)
    wi = np.linspace(0, n - 1, gw) if gw > 1 else np.zeros(1)
    h0 = np.floor(hi).astype(int)
    w0 = np.floor(wi).astype(int)
    h1 = np.minimum(h0 + 1, n - 1)
    w1 = np.minimum(w0 + 1, n - 1)
    dh = jnp.asarray((hi - h0)[:, None, None], jnp.float32)
    dw = jnp.asarray((wi - w0)[None, :, None], jnp.float32)
    out = (
        grid[h0][:, w0] * (1 - dh) * (1 - dw)
        + grid[h0][:, w1] * (1 - dh) * dw
        + grid[h1][:, w0] * dh * (1 - dw)
        + grid[h1][:, w1] * dh * dw
    )  # [gh, gw, D]
    out = out.reshape(gh // m, m, gw // m, m, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(gh * gw, d)


def _rotary_2d(cfg: Qwen35VisionConfig, gh: int, gw: int, m: int) -> jnp.ndarray:
    """2D rotary freqs [numPatches, head_dim/2] in merge order ([H | W] halves)."""
    dim = cfg.head_dim // 2
    inv_freq = 1.0 / 10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim)  # [dim/2]
    bh, bw = np.meshgrid(np.arange(gh // m), np.arange(gw // m), indexing="ij")
    ih, iw = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    rows = (bh[:, :, None, None] * m + ih[None, None]).reshape(-1)
    cols = (bw[:, :, None, None] * m + iw[None, None]).reshape(-1)
    h_emb = rows[:, None] * inv_freq[None, :]
    w_emb = cols[:, None] * inv_freq[None, :]
    return jnp.asarray(np.concatenate([h_emb, w_emb], axis=-1), jnp.float32)  # [S, dim]


def _apply_vision_rotary(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, D]; freqs: [S, D/2]. Half-split complex rotation."""
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1).astype(x.dtype)


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return (((xf - mean) / jnp.sqrt(var + eps)) * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_image(params: Params, cfg: Qwen35VisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] normalized pixels -> [B, numMergedPatches, out_hidden]."""
    b, h, w, _ = pixels.shape
    p, m = cfg.patch_size, cfg.spatial_merge_size
    gh, gw = h // p, w // p

    x = _dense(_patchify(pixels, cfg), params["patch_embed"])  # [B, S, D]
    x = x + _interp_pos_embed(params["pos_embed"], gh, gw, m)[None]
    freqs = _rotary_2d(cfg, gh, gw, m)

    nh, hd = cfg.num_heads, cfg.head_dim
    s = gh * gw
    for blk in params["blocks"]:
        hidden = _ln(x, blk["norm1"])
        qkv = _dense(hidden, blk["qkv"]).reshape(b, s, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _apply_vision_rotary(q, freqs).transpose(0, 2, 1, 3)
        k = _apply_vision_rotary(k, freqs).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * hd**-0.5
        probs = jax.nn.softmax(logits, -1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
        x = x + _dense(attn, blk["proj"])
        x = x + _dense(jax.nn.gelu(_dense(_ln(x, blk["norm2"]), blk["fc1"])), blk["fc2"])

    # spatial merger (patches are already in merge order). Act is EXACT-erf
    # GELU (HF Qwen3VLVisionPatchMerger uses nn.GELU(), unlike the blocks'
    # gelu_pytorch_tanh); block MLPs above keep jax.nn.gelu's tanh default.
    merged_dim = cfg.hidden_size * m * m
    x = _ln(x, params["merger"]["norm"])
    x = x.reshape(b, s // (m * m), merged_dim)
    x = _dense(jax.nn.gelu(_dense(x, params["merger"]["fc1"]), approximate=False), params["merger"]["fc2"])
    return x


def num_output_tokens(cfg: Qwen35VisionConfig, height: int, width: int) -> int:
    gh, gw = height // cfg.patch_size, width // cfg.patch_size
    return (gh // cfg.spatial_merge_size) * (gw // cfg.spatial_merge_size)


def merge_image_embeddings(
    text_embeds: jnp.ndarray,  # [B, S, H]
    input_ids: jnp.ndarray,  # [B, S]
    image_embeds: jnp.ndarray,  # [1, T_img, H] (all images concatenated)
    image_token_id: int,
) -> jnp.ndarray:
    """Replace image-token positions with vision embeddings (Qwen35VLM merge).

    Vectorized: position j with input_ids==image_token takes image_embeds at
    its rank among image tokens.
    """
    is_img = input_ids == image_token_id  # [B, S]
    rank = jnp.cumsum(is_img, axis=1) - 1  # rank among image tokens
    rank = jnp.clip(rank, 0, image_embeds.shape[1] - 1)
    gathered = image_embeds[0][rank]  # [B, S, H]
    return jnp.where(is_img[..., None], gathered.astype(text_embeds.dtype), text_embeds)
