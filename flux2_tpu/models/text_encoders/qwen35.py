"""Qwen3.5 hybrid language tower: Gated DeltaNet linear attention + full GQA.

Capability parity with ``Sources/FluxTextEncoders/Model/Qwen35/`` (the VLM
used for prompt enrichment, image analysis, and LoRA validation scoring):

  - Hybrid 4-periodic stack: 3 linear-attention (Gated DeltaNet) layers per
    1 full-attention layer (``full_attention_interval=4``,
    Qwen35Model.swift:1-45).
  - Gated DeltaNet (Qwen35GatedDeltaNet.swift): fused QKV projection +
    causal depthwise conv1d (kernel 4) + SiLU; L2-normalized q/k with the
    asymmetric 1/Dk / 1/sqrt(Dk) scaling; decay
    ``g = exp(-exp(A_log) * softplus(a + dt_bias))``; write gate
    ``beta = sigmoid(b)``; delta-rule state update
        S_t = g_t S_{t-1} + beta_t (v_t - (g_t S_{t-1}) k_t) k_t^T
        y_t = S_t q_t
    and gated RMSNorm output ``rmsnorm(y) * silu(z)``.
  - Full attention (Qwen35Attention.swift): GQA with output gating
    (q_proj produces [q ; gate], out = attn * sigmoid(gate)), per-head
    QK-RMSNorm, partial rotary (64 of 256 dims) with interleaved
    3-section MRoPE (freq i takes position axis i mod 3; sections
    [11, 11, 10] — Qwen35MRoPE.swift).

TPU-first: the reference iterates the recurrence token-by-token in Swift
(SURVEY.md flags this as TPU-hostile); here the delta rule runs under ONE
``lax.scan`` whose body is batched matmuls over [B, Hv, Dv, Dk] state — a
single compiled program. (A chunked parallel formulation is a further
optimization candidate; the VLM is auxiliary to the image path.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.ops.normalization import rms_norm
from flux2_tpu.utils.rngs import key_iter

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Qwen35TextConfig:
    vocab_size: int = 248_320
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    num_key_value_heads: int = 4
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10_000_000.0
    partial_rotary_factor: float = 0.25
    mrope_sections: Tuple[int, int, int] = (11, 11, 10)
    full_attention_interval: int = 4
    linear_num_key_heads: int = 16
    linear_num_value_heads: int = 32
    linear_key_head_dim: int = 128
    linear_value_head_dim: int = 128
    linear_conv_kernel_dim: int = 4
    tie_word_embeddings: bool = True

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def key_dim(self) -> int:
        return self.linear_num_key_heads * self.linear_key_head_dim

    @property
    def value_dim(self) -> int:
        return self.linear_num_value_heads * self.linear_value_head_dim

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim

    def is_linear_layer(self, i: int) -> bool:
        return (i + 1) % self.full_attention_interval != 0

    @classmethod
    def from_json_dict(cls, d: dict) -> "Qwen35TextConfig":
        rope = d.get("rope_scaling") or {}
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d["num_key_value_heads"],
            head_dim=d.get("head_dim", 256),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 10_000_000.0),
            partial_rotary_factor=d.get("partial_rotary_factor", 0.25),
            mrope_sections=tuple(rope.get("mrope_section", (11, 11, 10))),
            full_attention_interval=d.get("full_attention_interval", 4),
            linear_num_key_heads=d.get("linear_num_key_heads", 16),
            linear_num_value_heads=d.get("linear_num_value_heads", 32),
            linear_key_head_dim=d.get("linear_key_head_dim", 128),
            linear_value_head_dim=d.get("linear_value_head_dim", 128),
            linear_conv_kernel_dim=d.get("linear_conv_kernel_dim", 4),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
        )


TINY_QWEN35 = Qwen35TextConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=4,  # layers 0,1,2 linear; layer 3 full
    num_attention_heads=2,
    num_key_value_heads=1,
    head_dim=32,
    partial_rotary_factor=0.25,  # rotary_dim 8
    mrope_sections=(2, 1, 1),  # halfdim 4
    linear_num_key_heads=2,
    linear_num_value_heads=4,
    linear_key_head_dim=16,
    linear_value_head_dim=16,
)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _lin(key, i, o, dtype):
    return jax.random.normal(key, (i, o), jnp.float32).astype(dtype) * i**-0.5


def init_params(key: jax.Array, cfg: Qwen35TextConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    h = cfg.hidden_size
    layers: List[Params] = []
    for i in range(cfg.num_hidden_layers):
        ks = key_iter(keys[i], 12)
        lp: Params = {
            "input_norm": jnp.ones((h,), dtype),
            "post_attn_norm": jnp.ones((h,), dtype),
            "gate_proj": _lin(next(ks), h, cfg.intermediate_size, dtype),
            "up_proj": _lin(next(ks), h, cfg.intermediate_size, dtype),
            "down_proj": _lin(next(ks), cfg.intermediate_size, h, dtype),
        }
        if cfg.is_linear_layer(i):
            lp["linear_attn"] = {
                "in_proj_qkv": _lin(next(ks), h, cfg.conv_dim, dtype),
                "in_proj_z": _lin(next(ks), h, cfg.value_dim, dtype),
                "in_proj_b": _lin(next(ks), h, cfg.linear_num_value_heads, dtype),
                "in_proj_a": _lin(next(ks), h, cfg.linear_num_value_heads, dtype),
                "out_proj": _lin(next(ks), cfg.value_dim, h, dtype),
                # depthwise causal conv kernel [K, conv_dim]
                "conv_kernel": jax.random.normal(next(ks), (cfg.linear_conv_kernel_dim, cfg.conv_dim), jnp.float32).astype(dtype) * 0.2,
                "norm_weight": jnp.ones((cfg.linear_value_head_dim,), dtype),
                "a_log": jnp.zeros((cfg.linear_num_value_heads,), jnp.float32),
                "dt_bias": jnp.ones((cfg.linear_num_value_heads,), jnp.float32),
            }
        else:
            qd = cfg.num_attention_heads * cfg.head_dim
            kvd = cfg.num_key_value_heads * cfg.head_dim
            lp["self_attn"] = {
                "q_proj": _lin(next(ks), h, qd * 2, dtype),  # [q ; gate]
                "k_proj": _lin(next(ks), h, kvd, dtype),
                "v_proj": _lin(next(ks), h, kvd, dtype),
                "o_proj": _lin(next(ks), qd, h, dtype),
                "q_norm": jnp.ones((cfg.head_dim,), dtype),
                "k_norm": jnp.ones((cfg.head_dim,), dtype),
            }
        layers.append(lp)
    return {
        "embed_tokens": jax.random.normal(keys[-2], (cfg.vocab_size, h), jnp.float32).astype(dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
    }


# ---------------------------------------------------------------------------
# Gated DeltaNet
# ---------------------------------------------------------------------------


def _causal_depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """[B, S, C] causal depthwise conv with kernel [K, C] (left-pad K-1)."""
    k = kernel.shape[0]
    pad = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    out = jnp.zeros_like(x)
    for i in range(k):  # K=4: unrolled adds fuse into one VPU loop
        out = out + pad[:, i : i + x.shape[1]] * kernel[i][None, None, :]
    return out


def gated_delta_update(
    q: jnp.ndarray,  # [B, T, Hv, Dk] (already head-expanded + normalized)
    k: jnp.ndarray,  # [B, T, Hv, Dk]
    v: jnp.ndarray,  # [B, T, Hv, Dv]
    g: jnp.ndarray,  # [B, T, Hv] decay in (0, 1)
    beta: jnp.ndarray,  # [B, T, Hv] write gate
    state: jnp.ndarray,  # [B, Hv, Dv, Dk]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential delta-rule recurrence as one lax.scan."""

    def step(s, inp):
        qt, kt, vt, gt, bt = inp  # [B, Hv, *]
        s = s * gt[..., None, None]
        kv_mem = jnp.einsum("bhdk,bhk->bhd", s, kt)
        delta = (vt - kv_mem) * bt[..., None]
        s = s + jnp.einsum("bhd,bhk->bhdk", delta, kt)
        y = jnp.einsum("bhdk,bhk->bhd", s, qt)
        return s, y

    xs = (
        q.transpose(1, 0, 2, 3),
        k.transpose(1, 0, 2, 3),
        v.transpose(1, 0, 2, 3),
        g.transpose(1, 0, 2),
        beta.transpose(1, 0, 2),
    )
    state, ys = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return ys.transpose(1, 0, 2, 3), state  # [B, T, Hv, Dv]


def gated_deltanet_forward(
    lp: Params,
    cfg: Qwen35TextConfig,
    x: jnp.ndarray,  # [B, S, H]
    conv_state: Optional[jnp.ndarray] = None,  # [B, K-1, conv_dim]
    rec_state: Optional[jnp.ndarray] = None,  # [B, Hv, Dv, Dk]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (out [B, S, H], new_conv_state, new_recurrent_state)."""
    b, s, _ = x.shape
    hk, hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    kd, vd = cfg.key_dim, cfg.value_dim
    kk = cfg.linear_conv_kernel_dim

    mixed = x @ lp["in_proj_qkv"]  # [B, S, conv_dim]
    z = (x @ lp["in_proj_z"]).reshape(b, s, hv, dv)
    a = x @ lp["in_proj_a"]  # [B, S, Hv]
    bb = x @ lp["in_proj_b"]

    if conv_state is None:
        conv_state = jnp.zeros((b, kk - 1, cfg.conv_dim), mixed.dtype)
    conv_in = jnp.concatenate([conv_state, mixed], axis=1)
    new_conv_state = conv_in[:, -(kk - 1) :]
    conv_out = jax.nn.silu(_causal_depthwise_conv(conv_in, lp["conv_kernel"])[:, kk - 1 :])

    q = conv_out[..., :kd].reshape(b, s, hk, dk)
    k = conv_out[..., kd : 2 * kd].reshape(b, s, hk, dk)
    v = conv_out[..., 2 * kd :].reshape(b, s, hv, dv)

    # L2-normalize q/k with asymmetric scaling (Qwen35GatedDeltaNet.swift:
    # q gets 1/Dk, k gets 1/sqrt(Dk) relative to rms). Written sum-based to
    # match HF's fla-style l2norm eps placement bit-for-bit
    # (modeling_qwen3_next.l2norm: x * rsqrt(sum(x^2) + 1e-6)).
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_n = qf * jax.lax.rsqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-6) * dk**-0.5
    k_n = kf * jax.lax.rsqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-6)

    g = jnp.exp(-jnp.exp(lp["a_log"]) * jax.nn.softplus(a.astype(jnp.float32) + lp["dt_bias"]))
    beta = jax.nn.sigmoid(bb.astype(jnp.float32))

    rep = hv // hk
    if rep > 1:
        q_n = jnp.repeat(q_n, rep, axis=2)
        k_n = jnp.repeat(k_n, rep, axis=2)

    if rec_state is None:
        rec_state = jnp.zeros((b, hv, dv, dk), jnp.float32)
    if s > 8:
        # chunk-parallel prefill (exact; see gated_delta_update_chunked)
        y, new_rec_state = gated_delta_update_chunked(q_n, k_n, v.astype(jnp.float32), g, beta, rec_state)
    else:
        y, new_rec_state = gated_delta_update(q_n, k_n, v.astype(jnp.float32), g, beta, rec_state)

    # gated RMSNorm: rmsnorm(y) * silu(z)
    normed = rms_norm(y, lp["norm_weight"], cfg.rms_norm_eps) * jax.nn.silu(z.astype(jnp.float32))
    out = normed.reshape(b, s, vd).astype(x.dtype) @ lp["out_proj"]
    return out, new_conv_state, new_rec_state


# ---------------------------------------------------------------------------
# Full attention with MRoPE + output gating
# ---------------------------------------------------------------------------


def mrope_cos_sin(cfg: Qwen35TextConfig, position_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Interleaved 3-section MRoPE. position_ids: [3, B, S] (t, h, w).

    Frequency i takes the position axis ``i mod 3`` (sections [11, 11, 10]
    over halfdim 32 are exactly the mod-3 counts). Returns cos/sin
    [B, S, rotary_dim] in the HF two-half layout.
    """
    half = cfg.rotary_dim // 2
    inv_freq = 1.0 / cfg.rope_theta ** (2.0 * jnp.arange(half, dtype=jnp.float32) / cfg.rotary_dim)
    # freqs per axis: [3, B, S, half]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, None, :]
    axis_of_freq = jnp.arange(half) % 3  # [half]
    sel = jnp.take_along_axis(
        freqs.transpose(1, 2, 3, 0),  # [B, S, half, 3]
        axis_of_freq[None, None, :, None],
        axis=-1,
    )[..., 0]  # [B, S, half]
    emb = jnp.concatenate([sel, sel], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_partial_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, rotary_dim: int) -> jnp.ndarray:
    """Rotate the first rotary_dim dims ([B, H, S, D]); pass the rest through."""
    rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    x1, x2 = jnp.split(rot.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = rot.astype(jnp.float32) * cos[:, None] + rotated * sin[:, None]
    return jnp.concatenate([out.astype(x.dtype), rest], axis=-1)


def full_attention_forward(
    lp: Params,
    cfg: Qwen35TextConfig,
    x: jnp.ndarray,  # [B, S, H]
    position_ids: jnp.ndarray,  # [3, B, S]
) -> jnp.ndarray:
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q_and_gate = (x @ lp["q_proj"]).reshape(b, s, nh, 2 * hd)
    q, gate = q_and_gate[..., :hd], q_and_gate[..., hd:]
    gate = gate.reshape(b, s, nh * hd)
    k = (x @ lp["k_proj"]).reshape(b, s, nkv, hd)
    v = (x @ lp["v_proj"]).reshape(b, s, nkv, hd)

    q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    cos, sin = mrope_cos_sin(cfg, position_ids)
    q = _apply_partial_rotary(q, cos, sin, cfg.rotary_dim)
    k = _apply_partial_rotary(k, cos, sin, cfg.rotary_dim)

    rep = nh // nkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * hd**-0.5
    logits = jnp.where(causal[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    return (attn * jax.nn.sigmoid(gate)) @ lp["o_proj"]


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def text_position_ids(batch: int, seq: int) -> jnp.ndarray:
    """Pure-text MRoPE ids: all three axes equal the token index. [3, B, S]."""
    pos = jnp.broadcast_to(jnp.arange(seq)[None], (batch, seq))
    return jnp.stack([pos, pos, pos])


def forward(
    params: Params,
    cfg: Qwen35TextConfig,
    input_ids: jnp.ndarray,  # [B, S]
    position_ids: Optional[jnp.ndarray] = None,  # [3, B, S]
    inputs_embeds: Optional[jnp.ndarray] = None,  # vision-merged embeddings
) -> jnp.ndarray:
    """Hybrid forward -> final hidden states [B, S, H] (pre-norm applied)."""
    b, s = input_ids.shape
    x = inputs_embeds if inputs_embeds is not None else params["embed_tokens"][input_ids]
    if position_ids is None:
        position_ids = text_position_ids(b, s)

    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        if cfg.is_linear_layer(i):
            attn, _, _ = gated_deltanet_forward(lp["linear_attn"], cfg, h)
        else:
            attn = full_attention_forward(lp["self_attn"], cfg, h, position_ids)
        x = x + attn
        h2 = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
        mlp = (jax.nn.silu(h2 @ lp["gate_proj"]) * (h2 @ lp["up_proj"])) @ lp["down_proj"]
        x = x + mlp

    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def forward_logits(params: Params, cfg: Qwen35TextConfig, input_ids: jnp.ndarray, **kw) -> jnp.ndarray:
    hs = forward(params, cfg, input_ids, **kw)
    return (hs @ params["embed_tokens"].T).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Hybrid streaming cache (the reference's "dual cache types",
# Qwen35Model.swift:1-45): linear-attention layers carry
# (conv_state [B, K-1, conv_dim], recurrent_state [B, Hv, Dv, Dk]);
# full-attention layers carry a static-length KV cache.
# ---------------------------------------------------------------------------


def init_hybrid_cache(cfg: Qwen35TextConfig, batch: int, max_len: int, dtype=jnp.float32):
    """Per-layer cache list: dicts keyed by layer kind."""
    cache = []
    for i in range(cfg.num_hidden_layers):
        if cfg.is_linear_layer(i):
            cache.append(
                {
                    "conv": jnp.zeros((batch, cfg.linear_conv_kernel_dim - 1, cfg.conv_dim), dtype),
                    "rec": jnp.zeros((batch, cfg.linear_num_value_heads, cfg.linear_value_head_dim, cfg.linear_key_head_dim), jnp.float32),
                }
            )
        else:
            shape = (batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
            cache.append({"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype), "len": jnp.int32(0)})
    return cache


def _full_attention_cached(lp, cfg, x, position_ids, layer_cache):
    """Full-attention layer with a static-length KV cache (prefill or step)."""
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    max_len = layer_cache["k"].shape[2]
    pos = layer_cache["len"]

    q_and_gate = (x @ lp["q_proj"]).reshape(b, s, nh, 2 * hd)
    q, gate = q_and_gate[..., :hd], q_and_gate[..., hd:].reshape(b, s, nh * hd)
    k = (x @ lp["k_proj"]).reshape(b, s, nkv, hd)
    v = (x @ lp["v_proj"]).reshape(b, s, nkv, hd)
    q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    cos, sin = mrope_cos_sin(cfg, position_ids)
    q = _apply_partial_rotary(q, cos, sin, cfg.rotary_dim)
    k = _apply_partial_rotary(k, cos, sin, cfg.rotary_dim)

    ck = jax.lax.dynamic_update_slice(layer_cache["k"], k.astype(layer_cache["k"].dtype), (0, 0, pos, 0))
    cv = jax.lax.dynamic_update_slice(layer_cache["v"], v.astype(layer_cache["v"].dtype), (0, 0, pos, 0))
    new_cache = {"k": ck, "v": cv, "len": pos + s}

    rep = nh // nkv
    kk = jnp.repeat(ck, rep, axis=1) if rep > 1 else ck
    vv = jnp.repeat(cv, rep, axis=1) if rep > 1 else cv
    # mask: query at absolute position pos+i attends keys <= pos+i
    q_pos = pos + jnp.arange(s)
    key_idx = jnp.arange(max_len)
    allowed = key_idx[None, :] <= q_pos[:, None]
    mask = jnp.where(allowed, 0.0, -1e30).astype(jnp.float32)[None, None]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, kk, preferred_element_type=jnp.float32) * hd**-0.5 + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, vv).transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    return (attn * jax.nn.sigmoid(gate)) @ lp["o_proj"], new_cache


def forward_cached(
    params: Params,
    cfg: Qwen35TextConfig,
    input_ids: jnp.ndarray,  # [B, S]
    cache,
    start_pos: jnp.ndarray,  # scalar int32 — absolute position of token 0
    inputs_embeds: Optional[jnp.ndarray] = None,
):
    """Streaming forward (prefill when S>1, decode when S=1).

    Returns (last-token logits [B, V], new_cache). Position ids are
    text-only (all three MRoPE axes = absolute index).
    """
    b, s = input_ids.shape
    x = inputs_embeds if inputs_embeds is not None else params["embed_tokens"][input_ids]
    pos = start_pos + jnp.arange(s)
    position_ids = jnp.broadcast_to(pos[None], (b, s))
    position_ids = jnp.stack([position_ids, position_ids, position_ids])

    new_cache = []
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        if cfg.is_linear_layer(i):
            attn, conv_state, rec_state = gated_deltanet_forward(
                lp["linear_attn"], cfg, h,
                conv_state=cache[i]["conv"], rec_state=cache[i]["rec"],
            )
            new_cache.append({"conv": conv_state, "rec": rec_state})
        else:
            attn, layer_cache = _full_attention_cached(lp["self_attn"], cfg, h, position_ids, cache[i])
            new_cache.append(layer_cache)
        x = x + attn
        h2 = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
        x = x + (jax.nn.silu(h2 @ lp["gate_proj"]) * (h2 @ lp["up_proj"])) @ lp["down_proj"]

    hs = rms_norm(x[:, -1:], params["final_norm"], cfg.rms_norm_eps)
    logits = (hs[:, 0] @ params["embed_tokens"].T).astype(jnp.float32)
    return logits, new_cache


def gated_delta_update_chunked(
    q: jnp.ndarray,  # [B, T, Hv, Dk]
    k: jnp.ndarray,
    v: jnp.ndarray,  # [B, T, Hv, Dv]
    g: jnp.ndarray,  # [B, T, Hv] decay in (0, 1)
    beta: jnp.ndarray,  # [B, T, Hv]
    state: jnp.ndarray,  # [B, Hv, Dv, Dk]
    chunk_size: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk-parallel gated delta rule (exact; matches gated_delta_update).

    Within a chunk, the sequential recurrence
        S_t = g_t S_{t-1} + u_t k_t^T,  u_t = beta_t (v_t - g_t S_{t-1} k_t)
    is solved in closed form: with within-chunk cumulative decay
    Gamma_t = prod_{j<=t} g_j, the delta writes satisfy the unit-lower-
    triangular system
        (I + A) U = diag(beta) (V - Gamma * K S_0^T),
        A[t, i] = beta_t (Gamma_t / Gamma_i) (k_t . k_i)   (i < t),
    solved by forward substitution (the UT/WY transform of Gated DeltaNet).
    Outputs and the carried state then follow gated-linear-attention sums:
        y_t = Gamma_t S_0 q_t + sum_{i<=t} (Gamma_t/Gamma_i)(k_i . q_t) u_i
        S_C = Gamma_C S_0 + sum_i (Gamma_C/Gamma_i) u_i k_i^T.
    Chunks chain under one lax.scan — O(T/C) sequential steps of dense
    C x C matrix work instead of T steps, which is what the MXU wants.
    """
    b, t, hv, dk = q.shape
    dv = v.shape[-1]
    c = min(chunk_size, t)
    pad = (-t) % c
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)  # no decay
        beta = jnp.pad(beta, ((0, 0), (0, pad), (0, 0)))  # no write
    n_chunks = (t + pad) // c

    def to_chunks(x):
        return x.reshape(b, n_chunks, c, *x.shape[2:]).swapaxes(0, 1)

    qc, kc, vc = to_chunks(q), to_chunks(k), to_chunks(v)
    gc, bc = to_chunks(g), to_chunks(beta)

    tril_mask = jnp.tril(jnp.ones((c, c), jnp.bool_), -1)
    incl_mask = jnp.tril(jnp.ones((c, c), jnp.bool_))
    eye = jnp.eye(c, dtype=jnp.float32)

    def chunk_step(s, inp):
        qx, kx, vx, gx, bx = inp  # [B, C, Hv, *]
        # head-major [B, Hv, C, *]
        qh = qx.transpose(0, 2, 1, 3).astype(jnp.float32)
        kh = kx.transpose(0, 2, 1, 3).astype(jnp.float32)
        vh = vx.transpose(0, 2, 1, 3).astype(jnp.float32)
        gh = gx.transpose(0, 2, 1).astype(jnp.float32)
        bh = bx.transpose(0, 2, 1).astype(jnp.float32)

        lg = jnp.cumsum(jnp.log(gh), axis=-1)  # [B, Hv, C]
        # ratio[t, i] = Gamma_t / Gamma_i, masked to i <= t (log-space: safe)
        ratio = jnp.exp(lg[..., :, None] - lg[..., None, :])
        gamma = jnp.exp(lg)  # [B, Hv, C]

        kkt = jnp.einsum("bhtd,bhid->bhti", kh, kh)
        a = bh[..., :, None] * ratio * kkt * tril_mask  # strictly lower
        z = jnp.einsum("bhtd,bhvd->bhtv", kh, s)  # K S_0^T  [B, Hv, C, Dv]
        rhs = bh[..., None] * (vh - gamma[..., None] * z)
        u = jax.scipy.linalg.solve_triangular(
            eye + a, rhs, lower=True, unit_diagonal=True
        )  # [B, Hv, C, Dv]

        qkt = jnp.einsum("bhtd,bhid->bhti", qh, kh)  # [B, Hv, C(t), C(i)]
        y = gamma[..., None] * jnp.einsum("bhtd,bhvd->bhtv", qh, s)
        y = y + jnp.einsum("bhti,bhiv->bhtv", qkt * ratio * incl_mask, u)

        w = jnp.exp(lg[..., -1:] - lg)  # Gamma_C / Gamma_i  [B, Hv, C]
        s_new = gamma[..., -1][..., None, None] * s + jnp.einsum(
            "bhiv,bhid,bhi->bhvd", u, kh, w
        )
        return s_new, y.transpose(0, 2, 1, 3)  # back to [B, C, Hv, Dv]

    state, ys = jax.lax.scan(chunk_step, state.astype(jnp.float32), (qc, kc, vc, gc, bc))
    y = ys.swapaxes(0, 1).reshape(b, t + pad, hv, dv)[:, :t]
    return y, state
