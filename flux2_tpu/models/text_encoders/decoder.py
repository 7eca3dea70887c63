"""Generic causal GQA decoder covering Mistral Small 3.2 and Qwen3.

Parity targets: ``Sources/FluxTextEncoders/Model/MistralModel.swift`` /
``MistralAttention.swift`` and ``Model/Qwen3/*.swift``. One functional model,
two config switches:
  - ``qk_norm``: Qwen3 applies per-head RMSNorm to Q/K *before* RoPE
    (Qwen3Attention.swift:110-113).
  - ``llama4_scaling_beta``: Ministral3 scales queries by
    ``1 + beta * log(1 + floor(pos / original_max_pos))``
    (MistralAttention.swift:12-30, :422-431) — identity for pos < 16384 but
    kept for bit-parity on long prompts.

TPU-first design: layers are stacked and scanned; hidden states for the
FLUX.2 conditioning recipe come out of the scan's stacked ys (one gather
instead of the reference's eval-per-layer collection,
MistralModel.swift:118-137). Decode-time generation uses a static-length KV
cache updated via dynamic_update_slice so every step reuses one compiled
program.

RoPE here is the standard HF half-split rotation (rotate-half over the
*halves* of head_dim), NOT the FLUX.2 DiT's interleaved-pair rotation.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import functools

import jax
import jax.numpy as jnp

from flux2_tpu.models.text_encoders.config import DecoderConfig
from flux2_tpu.ops.normalization import rms_norm
from flux2_tpu.ops.quant import q_matmul as mm
from flux2_tpu.utils.rngs import key_iter

Params = Dict[str, Any]

NEG_INF = -1e30  # finite "minus infinity" keeps fully-masked rows NaN-free


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, dtype):
    return jax.random.normal(key, (d_in, d_out), dtype=dtype) * jnp.asarray(d_in**-0.5, dtype)


def init_params(key: jax.Array, cfg: DecoderConfig, dtype: jnp.dtype = jnp.bfloat16) -> Params:
    keys = key_iter(key, 16)
    h, hd = cfg.hidden_size, cfg.head_dim
    q_dim = cfg.num_attention_heads * hd
    kv_dim = cfg.num_key_value_heads * hd
    n = cfg.num_hidden_layers

    def stack(f):
        return jnp.stack([f(k) for k in key_iter(next(keys), n)])

    params: Params = {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype=dtype) * jnp.asarray(0.02, dtype),
        "layers": {
            "input_norm": jnp.ones((n, h), dtype),
            "q_proj": stack(lambda k: _linear(k, h, q_dim, dtype)),
            "k_proj": stack(lambda k: _linear(k, h, kv_dim, dtype)),
            "v_proj": stack(lambda k: _linear(k, h, kv_dim, dtype)),
            "o_proj": stack(lambda k: _linear(k, q_dim, h, dtype)),
            "post_attn_norm": jnp.ones((n, h), dtype),
            "gate_proj": stack(lambda k: _linear(k, h, cfg.intermediate_size, dtype)),
            "up_proj": stack(lambda k: _linear(k, h, cfg.intermediate_size, dtype)),
            "down_proj": stack(lambda k: _linear(k, cfg.intermediate_size, h, dtype)),
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    if cfg.qk_norm:
        params["layers"]["q_norm"] = jnp.ones((n, hd), dtype)
        params["layers"]["k_norm"] = jnp.ones((n, hd), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _linear(next(keys), h, cfg.vocab_size, dtype)
    return params


# ---------------------------------------------------------------------------
# RoPE (HF half-split convention)
# ---------------------------------------------------------------------------


def llm_rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [S, head_dim] with the two halves repeated (HF layout)."""
    inv_freq = theta ** -(jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [S, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_llm_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, S, D]; cos/sin: [S, D]."""
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)


def llama4_attention_scale(positions: jnp.ndarray, beta: float, original_max: int) -> jnp.ndarray:
    """1 + beta * log(1 + floor(pos / original_max)); [S] -> [S, 1]."""
    floored = jnp.floor(positions.astype(jnp.float32) / original_max)
    return (1.0 + beta * jnp.log1p(floored))[:, None]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Static-length per-layer KV cache [L, B, kv_heads, max_len, head_dim]."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32 — tokens filled so far


def init_kv_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.int32(0))


def _layer(
    lp: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,  # [B, S, H]
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,  # additive [B, 1, S, S_kv] f32
    q_scale: Optional[jnp.ndarray],
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    cache_pos: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    q = mm(h, lp["q_proj"]).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    k = mm(h, lp["k_proj"]).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = mm(h, lp["v_proj"]).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)

    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)

    q = apply_llm_rope(q, cos, sin)
    k = apply_llm_rope(k, cos, sin)
    if q_scale is not None:
        q = q * q_scale.astype(q.dtype)

    new_kv = None
    if cache_kv is not None:
        ck, cv = cache_kv  # [B, kv, max_len, hd]
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_pos, 0))
        k, v = ck, cv
        new_kv = (ck, cv)

    # GQA: expand KV heads to query heads.
    rep = nh // nkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (hd**-0.5) + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    x = x + mm(attn, lp["o_proj"])

    h2 = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
    mlp = mm(jax.nn.silu(mm(h2, lp["gate_proj"])) * mm(h2, lp["up_proj"]), lp["down_proj"])
    return x + mlp, new_kv


def _causal_padding_mask(attention_mask: jnp.ndarray, s: int) -> jnp.ndarray:
    """Additive mask [B, 1, S, S]: causal + key-side padding."""
    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
    allowed = causal[None, None] & (attention_mask[:, None, None, :] > 0)
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


def forward_hidden_states(
    params: Params,
    cfg: DecoderConfig,
    input_ids: jnp.ndarray,  # [B, S] int32
    attention_mask: jnp.ndarray,  # [B, S] 1=token 0=pad
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, S, H] (VLM merge)
) -> jnp.ndarray:
    """Run the decoder, returning ALL hidden states [L+1, B, S, H].

    Index 0 is the embedding output; index i (>=1) is the output of layer i —
    matching HF's output_hidden_states convention used by the conditioning
    recipe (EmbeddingExtractor.swift:262-270).
    """
    b, s = input_ids.shape
    x = inputs_embeds if inputs_embeds is not None else params["embed_tokens"][input_ids]

    # Position ids: left-padded sequences still use absolute positions 0..S-1
    # (matching the reference, which passes no position offset for padding).
    positions = jnp.arange(s)
    cos, sin = llm_rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    mask = _causal_padding_mask(attention_mask, s)
    q_scale = None
    if cfg.llama4_scaling_beta is not None:
        q_scale = llama4_attention_scale(positions, cfg.llama4_scaling_beta, cfg.original_max_position_embeddings)

    def body(carry, lp):
        out, _ = _layer(lp, cfg, carry, cos, sin, mask, q_scale)
        return out, out

    final, ys = jax.lax.scan(body, x, params["layers"])
    del final
    return jnp.concatenate([x[None], ys], axis=0)  # [L+1, B, S, H]


@functools.partial(jax.jit, static_argnames=("cfg", "layer_indices"))
def extract_hidden_layers(
    params: Params,
    cfg: DecoderConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    layer_indices: Tuple[int, ...],
) -> jnp.ndarray:
    """Concatenate the given hidden-state layers along the feature axis.

    [B, S, len(layers) * H] — the FLUX.2 DiT conditioning tensor.

    Jitted as ONE program (cfg/layer_indices static): the conditioning
    encode is a per-`generate` hot path, and tracing it eagerly paid a
    host->device dispatch per op through the tunneled runtime — measured
    1.98 s for a 512-token Qwen3-4B W8A8 encode in BENCH_r03 vs ~0.07 s
    compiled (the 36-layer forward itself is roofline ~10 ms).
    """
    hs = forward_hidden_states(params, cfg, input_ids, attention_mask)
    return jnp.concatenate([hs[i] for i in layer_indices], axis=-1)


def forward_logits(
    params: Params,
    cfg: DecoderConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full forward to vocabulary logits [B, S, V] (prefill path)."""
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    hs = forward_hidden_states(params, cfg, input_ids, attention_mask)
    x = rms_norm(hs[-1], params["final_norm"], cfg.rms_norm_eps)
    return _logits(params, cfg, x)


def _logits(params: Params, cfg: DecoderConfig, h: jnp.ndarray) -> jnp.ndarray:
    """Vocabulary projection. The untied lm_head is a matmul leaf, so
    quantize_params() may have turned it into a QTensor — route through
    q_matmul instead of `@` (a quantized Mistral checkpoint would otherwise
    crash the first chat/upsample logits call)."""
    if cfg.tie_word_embeddings:
        return (h @ params["embed_tokens"].T).astype(jnp.float32)
    return mm(h, params["lm_head"]).astype(jnp.float32)


def decode_step(
    params: Params,
    cfg: DecoderConfig,
    token: jnp.ndarray,  # [B, 1]
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """Single-token decode with a static-shape KV cache. Returns logits [B, V]."""
    b = token.shape[0]
    max_len = cache.k.shape[3]
    x = params["embed_tokens"][token]  # [B, 1, H]
    pos = cache.length
    cos, sin = llm_rope_cos_sin(pos[None], cfg.head_dim, cfg.rope_theta)
    # Attend to cache slots < pos+1.
    key_idx = jnp.arange(max_len)
    mask = jnp.where(key_idx[None, None, None, :] <= pos, 0.0, NEG_INF).astype(jnp.float32)
    q_scale = None
    if cfg.llama4_scaling_beta is not None:
        q_scale = llama4_attention_scale(pos[None], cfg.llama4_scaling_beta, cfg.original_max_position_embeddings)

    def body(carry, inp):
        h, = carry
        lp, ck, cv = inp
        out, new_kv = _layer(lp, cfg, h, cos, sin, mask, q_scale, cache_kv=(ck, cv), cache_pos=pos)
        return (out,), new_kv

    (x_out,), kv = jax.lax.scan(body, (x,), (params["layers"], cache.k, cache.v))
    new_cache = KVCache(kv[0], kv[1], cache.length + 1)
    h = rms_norm(x_out[:, -1], params["final_norm"], cfg.rms_norm_eps)
    return _logits(params, cfg, h), new_cache


def prefill(
    params: Params,
    cfg: DecoderConfig,
    input_ids: jnp.ndarray,
    cache: KVCache,
    inputs_embeds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill the KV cache with a prompt; returns last-token logits [B, V].

    ``inputs_embeds`` overrides token embeddings (VLM image-token splicing).
    """
    b, s = input_ids.shape
    max_len = cache.k.shape[3]
    x = inputs_embeds if inputs_embeds is not None else params["embed_tokens"][input_ids]
    positions = jnp.arange(s)
    cos, sin = llm_rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    key_idx = jnp.arange(max_len)
    causal = positions[:, None] >= key_idx[None, :max_len]
    mask = jnp.where(causal[None, None], 0.0, NEG_INF).astype(jnp.float32)
    q_scale = None
    if cfg.llama4_scaling_beta is not None:
        q_scale = llama4_attention_scale(positions, cfg.llama4_scaling_beta, cfg.original_max_position_embeddings)

    def body(carry, inp):
        h, = carry
        lp, ck, cv = inp
        out, new_kv = _layer(lp, cfg, h, cos, sin, mask, q_scale, cache_kv=(ck, cv), cache_pos=jnp.int32(0))
        return (out,), new_kv

    (x_out,), kv = jax.lax.scan(body, (x,), (params["layers"], cache.k, cache.v))
    new_cache = KVCache(kv[0], kv[1], jnp.int32(s))
    h = rms_norm(x_out[:, -1], params["final_norm"], cfg.rms_norm_eps)
    return _logits(params, cfg, h), new_cache
