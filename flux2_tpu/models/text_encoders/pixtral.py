"""Pixtral vision tower + multimodal projector (Mistral Small 3.2 VLM).

Capability parity with ``Sources/FluxTextEncoders/Vision/``
(``VisionEncoder.swift``, ``MultiModalProjector.swift``): the Dev-path VLM
used for image analysis / vision-aware prompt upsampling.

  - 24-layer ViT, hidden 1024, 16 heads, head_dim 64, patch 14, image cap
    1540, theta 1e4 (VisionEncoder.swift:31-40).
  - Pixtral 2D RoPE: base frequency i alternates axes — even-indexed
    frequencies take the ROW position, odd-indexed the COLUMN; a position
    id indexes the (row*max_side + col) frequency table, cos/sin in HF
    two-half layout (VisionEncoder.swift:79-140).
  - Pre-LN blocks (RMSNorm in Pixtral), SiLU-gated MLP, attention without
    bias; [IMG] token splicing happens in the LM via the same merge helper
    as Qwen3.5.
  - Multimodal projector: RMSNorm -> 2x2 patch merger -> linear -> GELU ->
    linear into the Mistral embedding space.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.ops.normalization import rms_norm
from flux2_tpu.utils.rngs import key_iter

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class PixtralVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    patch_size: int = 14
    image_size: int = 1540  # max side -> 110 patches
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    spatial_merge_size: int = 2
    text_hidden_size: int = 5120

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def max_patches_per_side(self) -> int:
        return self.image_size // self.patch_size


TINY_PIXTRAL = PixtralVisionConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=2, patch_size=14, image_size=14 * 8, text_hidden_size=48,
)


def _lin(key, i, o, dtype):
    return jax.random.normal(key, (i, o), jnp.float32).astype(dtype) * i**-0.5


def init_params(key: jax.Array, cfg: PixtralVisionConfig = TINY_PIXTRAL, dtype=jnp.float32) -> Params:
    keys = key_iter(key, cfg.num_hidden_layers * 8 + 8)
    h = cfg.hidden_size
    blocks = []
    for _ in range(cfg.num_hidden_layers):
        blocks.append(
            {
                "attention_norm": jnp.ones((h,), dtype),
                "q_proj": _lin(next(keys), h, h, dtype),
                "k_proj": _lin(next(keys), h, h, dtype),
                "v_proj": _lin(next(keys), h, h, dtype),
                "o_proj": _lin(next(keys), h, h, dtype),
                "ffn_norm": jnp.ones((h,), dtype),
                "gate_proj": _lin(next(keys), h, cfg.intermediate_size, dtype),
                "up_proj": _lin(next(keys), h, cfg.intermediate_size, dtype),
                "down_proj": _lin(next(keys), cfg.intermediate_size, h, dtype),
            }
        )
    merged = h * cfg.spatial_merge_size**2
    return {
        "patch_conv": _lin(next(keys), 3 * cfg.patch_size**2, h, dtype),  # conv k=s=patch
        "ln_pre": jnp.ones((h,), dtype),
        "blocks": blocks,
        "projector": {
            "norm": jnp.ones((h,), dtype),
            "merge": _lin(next(keys), merged, h, dtype),  # patch merger's merging layer
            "linear_1": _lin(next(keys), h, cfg.text_hidden_size, dtype),
            "linear_2": _lin(next(keys), cfg.text_hidden_size, cfg.text_hidden_size, dtype),
        },
    }


# ---------------------------------------------------------------------------
# 2D RoPE (Pixtral convention)
# ---------------------------------------------------------------------------


def pixtral_rope_table(cfg: PixtralVisionConfig) -> np.ndarray:
    """Frequency table [max_side^2, head_dim]: even base freqs x row,
    odd base freqs x col, then the half-concat duplication."""
    d = cfg.head_dim
    base = 1.0 / cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float32) / d)  # [d/2]
    freqs_h, freqs_w = base[0::2], base[1::2]  # [d/4] each
    side = cfg.max_patches_per_side
    pos = np.arange(side, dtype=np.float32)
    fh = np.tile((pos[:, None] * freqs_h[None])[:, None, :], (1, side, 1))  # [side, side, d/4]
    fw = np.tile((pos[:, None] * freqs_w[None])[None, :, :], (side, 1, 1))
    half = np.concatenate([fh, fw], axis=-1).reshape(side * side, d // 2)
    return np.concatenate([half, half], axis=-1)  # [side^2, d]


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def encode_image(params: Params, cfg: PixtralVisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] (normalized) -> vision features [B, patches, hidden]."""
    b, h, w, c = pixels.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    s = gh * gw

    x = pixels.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, s, p * p * c)
    x = x @ params["patch_conv"]
    x = rms_norm(x, params["ln_pre"], cfg.rms_norm_eps)

    # position ids into the (row * max_side + col) frequency table
    rows, cols = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    pos_ids = (rows * cfg.max_patches_per_side + cols).reshape(-1)
    table = jnp.asarray(pixtral_rope_table(cfg))
    freqs = table[pos_ids]  # [S, head_dim]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)

    nh, hd = cfg.num_attention_heads, cfg.head_dim
    for blk in params["blocks"]:
        hidden = rms_norm(x, blk["attention_norm"], cfg.rms_norm_eps)
        q = (hidden @ blk["q_proj"]).reshape(b, s, nh, hd)
        k = (hidden @ blk["k_proj"]).reshape(b, s, nh, hd)
        v = (hidden @ blk["v_proj"]).reshape(b, s, nh, hd)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos[None, :, None, :] + _rotate_half(qf) * sin[None, :, None, :]).astype(x.dtype)
        k = (kf * cos[None, :, None, :] + _rotate_half(kf) * sin[None, :, None, :]).astype(x.dtype)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * hd**-0.5
        probs = jax.nn.softmax(logits, -1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
        x = x + attn @ blk["o_proj"]
        h2 = rms_norm(x, blk["ffn_norm"], cfg.rms_norm_eps)
        x = x + (jax.nn.silu(h2 @ blk["gate_proj"]) * (h2 @ blk["up_proj"])) @ blk["down_proj"]
    return x  # [B, S, hidden]


def project_to_text_space(
    params: Params, cfg: PixtralVisionConfig, features: jnp.ndarray, grid_h: int, grid_w: int
) -> jnp.ndarray:
    """RMSNorm -> 2x2 patch merge -> linear -> GELU -> linear
    (MultiModalProjector.swift:134-180). [B, S, H] -> [B, S/4, text_hidden]."""
    proj = params["projector"]
    m = cfg.spatial_merge_size
    b, s, d = features.shape
    x = rms_norm(features, proj["norm"], cfg.rms_norm_eps)
    # group 2x2 spatial blocks (row-major grid)
    x = x.reshape(b, grid_h // m, m, grid_w // m, m, d).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, (grid_h // m) * (grid_w // m), m * m * d)
    x = x @ proj["merge"]
    # exact erf GELU: both MLX's gelu and HF's ACT2FN["gelu"] are exact
    # (jax.nn.gelu defaults to the tanh approximation)
    x = jax.nn.gelu(x @ proj["linear_1"], approximate=False)
    return x @ proj["linear_2"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_and_project(params: Params, cfg: PixtralVisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    b, h, w, _ = pixels.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    return project_to_text_space(params, cfg, encode_image(params, cfg, pixels), gh, gw)
