"""Qwen3-VL language tower — alternative Klein embedding path.

Capability parity with ``Sources/FluxTextEncoders/Model/Qwen3VL/`` (the
experimental Klein-VL encoder, FluxTextEncoders.swift:296-394): a Qwen3
decoder whose attention uses Qwen3-VL MRoPE (Qwen3VLMRoPE.swift):

  - head_dim splits into CONTIGUOUS sections of 2x the section sizes
    ([24, 20, 20] -> dims [48 | 40 | 40]) for (temporal, height, width);
  - each section has its OWN frequency ladder with dim = 2*section;
  - rotation is interleaved Llama-style (adjacent pairs), like the DiT RoPE;
  - text-only position ids: temporal = arange, height = width = 0 — so the
    spatial sections see cos 1 / sin 0 (no rotation).

The layer math (GQA, QK-RMSNorm, SwiGLU) is the generic decoder's; only the
rotary tables and rotation style differ, injected via cos/sin built here and
the interleaved apply from ``flux2_tpu.ops.rope``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.models.text_encoders import decoder
from flux2_tpu.models.text_encoders.config import DecoderConfig, QWEN3_HIDDEN_LAYERS
from flux2_tpu.ops.rope import apply_rope as apply_interleaved_rope

DEFAULT_MROPE_SECTION: Tuple[int, int, int] = (24, 20, 20)  # head_dim 128


def mrope_cos_sin(
    position_ids: jnp.ndarray,  # [3, S] (temporal, height, width)
    head_dim: int,
    theta: float,
    section: Sequence[int] = DEFAULT_MROPE_SECTION,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-section interleaved MRoPE tables -> cos/sin [S, head_dim].

    Section i covers dims [2*sum(section[:i]) : 2*sum(section[:i+1])) with
    inv_freq_j = theta^(-2j / (2*section_i)); angles repeat-interleave by 2
    (pair layout). Dims beyond the sections pass through (cos 1, sin 0).
    """
    s = position_ids.shape[1]
    cos_parts, sin_parts = [], []
    for i, sec in enumerate(section):
        inv_freq = theta ** -(2.0 * jnp.arange(sec, dtype=jnp.float32) / (2.0 * sec))  # [sec]
        angles = position_ids[i].astype(jnp.float32)[:, None] * inv_freq[None, :]  # [S, sec]
        rep = jnp.repeat(angles, 2, axis=-1)  # pair-interleaved [S, 2*sec]
        cos_parts.append(jnp.cos(rep))
        sin_parts.append(jnp.sin(rep))
    used = 2 * sum(section)
    if used < head_dim:
        pad = head_dim - used
        cos_parts.append(jnp.ones((s, pad), jnp.float32))
        sin_parts.append(jnp.zeros((s, pad), jnp.float32))
    return jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1)


def mrope_cos_sin_hf(
    position_ids: jnp.ndarray,  # [3, S]
    head_dim: int,
    theta: float,
    section: Sequence[int] = DEFAULT_MROPE_SECTION,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CANONICAL Qwen3-VL interleaved MRoPE (HF modeling_qwen3_vl.py,
    Qwen3VLTextRotaryEmbedding.apply_interleaved_mrope).

    One GLOBAL frequency ladder inv_freq_j = theta^(-2j/head_dim) over all
    head_dim/2 frequencies; the three axes interleave by STRIDE — frequency
    slot j uses the H position if j in {1, 4, ...} (< 3*section_h), the W
    position if j in {2, 5, ...} (< 3*section_w), else the T position.
    cos/sin come out in HALF-SPLIT layout (rotate_half application).

    NOTE: the reference's Qwen3VLMRoPE.swift builds per-section ladders
    (theta^(-2i/(2*sec))) over contiguous sections with pair-interleaved
    rotation instead — mathematically DIFFERENT frequencies. ``mrope_cos_sin``
    preserves that reference behavior; this function matches the HF weights'
    training-time convention (validated against transformers' torch
    implementation in tests/test_hf_parity.py).
    """
    d2 = head_dim // 2
    inv = theta ** -(2.0 * jnp.arange(d2, dtype=jnp.float32) / head_dim)  # [d2]
    freqs = position_ids.astype(jnp.float32)[:, :, None] * inv[None, None, :]  # [3, S, d2]
    ft = freqs[0]
    idx_h = np.arange(1, 3 * section[1], 3)
    idx_w = np.arange(2, 3 * section[2], 3)
    ft = ft.at[:, idx_h].set(freqs[1][:, idx_h])
    ft = ft.at[:, idx_w].set(freqs[2][:, idx_w])
    emb = jnp.concatenate([ft, ft], axis=-1)  # [S, head_dim] half-split
    return jnp.cos(emb), jnp.sin(emb)


def text_only_position_ids(seq_len: int, offset: int = 0) -> jnp.ndarray:
    """[3, S]: temporal = arange(+offset), height = width = 0
    (Qwen3VLMRoPE.textOnlyPositionIds)."""
    temporal = jnp.arange(offset, offset + seq_len)
    zeros = jnp.zeros(seq_len, temporal.dtype)
    return jnp.stack([temporal, zeros, zeros])


def forward_hidden_states(
    params: dict,
    cfg: DecoderConfig,
    input_ids: jnp.ndarray,  # [B, S]
    attention_mask: jnp.ndarray,  # [B, S]
    position_ids: Optional[jnp.ndarray] = None,  # [3, S]
    section: Sequence[int] = DEFAULT_MROPE_SECTION,
    hf_canonical: bool = False,
) -> jnp.ndarray:
    """Qwen3-VL decoder; returns all hidden states [L+1, B, S, H].

    ``hf_canonical=True`` uses the HF/training-time MRoPE convention
    (global ladder, strided interleave, half-split rotation — see
    ``mrope_cos_sin_hf``); False preserves the reference's per-section
    ladders with pair-interleaved rotation (Qwen3VLMRoPE.swift).
    """
    b, s = input_ids.shape
    x = params["embed_tokens"][input_ids]
    if position_ids is None:
        position_ids = text_only_position_ids(s)
    if hf_canonical:
        cos, sin = mrope_cos_sin_hf(position_ids, cfg.head_dim, cfg.rope_theta, section)
    else:
        cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta, section)
    mask = decoder._causal_padding_mask(attention_mask, s)

    def body(carry, lp):
        out = _vl_layer(lp, cfg, carry, cos, sin, mask, half_split=hf_canonical)
        return out, out

    _, ys = jax.lax.scan(body, x, params["layers"])
    return jnp.concatenate([x[None], ys], axis=0)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _vl_layer(lp, cfg, x, cos, sin, mask, half_split: bool = False):
    """Decoder layer; rotary style follows the cos/sin layout (pair-interleaved
    for the reference convention, half-split for HF-canonical)."""
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = decoder.rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    q = (h @ lp["q_proj"]).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    k = (h @ lp["k_proj"]).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = (h @ lp["v_proj"]).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    if cfg.qk_norm:
        q = decoder.rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = decoder.rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    if half_split:
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        c, si = cos[None, None], sin[None, None]
        q = (qf * c + _rotate_half(qf) * si).astype(x.dtype)
        k = (kf * c + _rotate_half(kf) * si).astype(x.dtype)
    else:
        q = apply_interleaved_rope(q, cos, sin)
        k = apply_interleaved_rope(k, cos, sin)
    rep = nh // nkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * hd**-0.5 + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    x = x + attn @ lp["o_proj"]
    h2 = decoder.rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
    return x + (jax.nn.silu(h2 @ lp["gate_proj"]) * (h2 @ lp["up_proj"])) @ lp["down_proj"]


@functools.partial(
    jax.jit, static_argnames=("cfg", "layer_indices", "section", "hf_canonical")
)
def extract_klein_vl_embeddings(
    params: dict,
    cfg: DecoderConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    layer_indices=QWEN3_HIDDEN_LAYERS,
    section: Sequence[int] = DEFAULT_MROPE_SECTION,
    hf_canonical: bool = False,
) -> jnp.ndarray:
    """Klein-VL conditioning: the same [9, 18, 27] concat recipe over the
    MRoPE tower (KleinVLEmbeddingExtractor.swift). ``hf_canonical`` selects
    the HF/training-time MRoPE convention (see forward_hidden_states).

    Jitted as one program (like decoder.extract_hidden_layers): the encode
    is per-generate hot, and eager tracing pays a device dispatch per op
    through the tunneled runtime."""
    hs = forward_hidden_states(
        params, cfg, input_ids, attention_mask, section=section, hf_canonical=hf_canonical
    )
    return jnp.concatenate([hs[i] for i in layer_indices], axis=-1)
