"""FLUX.2 diffusion transformer (DiT) as a functional JAX model.

Architecture parity with the reference
(``Sources/Flux2Core/Transformer/Flux2Transformer.swift:22-327`` and the
block files cited per-function below), re-designed TPU-first:

  - Parameters are a pytree of stacked per-layer arrays (leading axis =
    layer), and the double/single-stream stacks run under ``lax.scan`` — one
    compiled block body each, fast XLA compiles, and a natural per-block
    ``jax.checkpoint`` (remat) boundary replacing the reference's Cmlx
    gradient-checkpoint binding (MLXCheckpoint.swift:24).
  - All linear weights are stored [in, out] so ``x @ w`` hits the MXU
    directly; attention Q/K/V keep separate leaves so tensor parallelism
    shards heads on the output axis without resharding (the reference's
    fused single-stream projection is stored split for the same reason, and
    recombined arithmetically: concat-matmul == sum of partial matmuls).
  - RoPE cos/sin are precomputed once per schedule (f32) and passed in —
    the lax.scan hoists them out of the 56-block loop; the reference's LRU
    cache (Flux2RoPE.swift:65-120) dissolves into jit.
  - Modulation is computed once per forward (the reference hoists it out of
    the block loop the same way, Flux2Transformer.swift:160-166).

The reference's intra-forward ``eval()`` graph segmentation
(Flux2Transformer.swift:228-236) has no TPU analogue — XLA compiles the whole
forward as one program; memory pressure is handled by sharding + remat.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flux2_tpu.models.flux2.config import Flux2TransformerConfig
from flux2_tpu.ops.attention import sdpa
from flux2_tpu.ops.quant import q_matmul as mm
from flux2_tpu.ops.normalization import gate, layer_norm, modulate, rms_norm
from flux2_tpu.ops.rope import apply_rope
from flux2_tpu.utils.rngs import key_iter

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, dtype, scale=None):
    scale = scale if scale is not None else d_in**-0.5
    # generate at the target dtype: no f32 transient (random-init of a 4B
    # model in f32 would exceed a 16 GB chip before the cast)
    return jax.random.normal(key, (d_in, d_out), dtype=dtype) * jnp.asarray(scale, dtype)


def init_params(
    key: jax.Array, config: Flux2TransformerConfig, dtype: jnp.dtype = jnp.bfloat16
) -> Params:
    """Random-init parameter pytree (shape-identical to checkpoint weights)."""
    d = config.inner_dim
    hd = config.attention_head_dim
    mlp = config.mlp_hidden_dim
    nl, ns = config.num_layers, config.num_single_layers
    keys = key_iter(key, 64)

    def stack(n, f):
        return jnp.stack([f(k) for k in key_iter(next(keys), n)])

    params: Params = {
        "x_embedder": {"kernel": _linear(next(keys), config.in_channels, d, dtype)},
        "context_embedder": {"kernel": _linear(next(keys), config.joint_attention_dim, d, dtype)},
        "time_embed": {
            "linear1": _linear(next(keys), config.time_embed_channels, d, dtype),
            "linear2": _linear(next(keys), d, d, dtype),
        },
        "double_mod_img": {"kernel": _linear(next(keys), d, 6 * d, dtype)},
        "double_mod_txt": {"kernel": _linear(next(keys), d, 6 * d, dtype)},
        "single_mod": {"kernel": _linear(next(keys), d, 3 * d, dtype)},
        "double_blocks": {
            "to_q": stack(nl, lambda k: _linear(k, d, d, dtype)),
            "to_k": stack(nl, lambda k: _linear(k, d, d, dtype)),
            "to_v": stack(nl, lambda k: _linear(k, d, d, dtype)),
            "to_out": stack(nl, lambda k: _linear(k, d, d, dtype)),
            "add_q": stack(nl, lambda k: _linear(k, d, d, dtype)),
            "add_k": stack(nl, lambda k: _linear(k, d, d, dtype)),
            "add_v": stack(nl, lambda k: _linear(k, d, d, dtype)),
            "add_out": stack(nl, lambda k: _linear(k, d, d, dtype)),
            "norm_q": jnp.ones((nl, hd), dtype=dtype),
            "norm_k": jnp.ones((nl, hd), dtype=dtype),
            "norm_added_q": jnp.ones((nl, hd), dtype=dtype),
            "norm_added_k": jnp.ones((nl, hd), dtype=dtype),
            "ff_in": stack(nl, lambda k: _linear(k, d, 2 * mlp, dtype)),
            "ff_out": stack(nl, lambda k: _linear(k, mlp, d, dtype)),
            "ff_ctx_in": stack(nl, lambda k: _linear(k, d, 2 * mlp, dtype)),
            "ff_ctx_out": stack(nl, lambda k: _linear(k, mlp, d, dtype)),
        },
        "single_blocks": {
            "to_q": stack(ns, lambda k: _linear(k, d, d, dtype)),
            "to_k": stack(ns, lambda k: _linear(k, d, d, dtype)),
            "to_v": stack(ns, lambda k: _linear(k, d, d, dtype)),
            "mlp_gate": stack(ns, lambda k: _linear(k, d, mlp, dtype)),
            "mlp_up": stack(ns, lambda k: _linear(k, d, mlp, dtype)),
            "norm_q": jnp.ones((ns, hd), dtype=dtype),
            "norm_k": jnp.ones((ns, hd), dtype=dtype),
            "out_attn": stack(ns, lambda k: _linear(k, d, d, dtype)),
            "out_mlp": stack(ns, lambda k: _linear(k, mlp, d, dtype)),
        },
        "norm_out": {"kernel": _linear(next(keys), d, 2 * d, dtype)},
        "proj_out": {"kernel": _linear(next(keys), d, config.out_channels, dtype)},
    }
    if config.guidance_embeds:
        params["guidance_embed"] = {
            "linear1": _linear(next(keys), config.time_embed_channels, d, dtype),
            "linear2": _linear(next(keys), d, d, dtype),
        }
    return params


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------


def sinusoidal_embedding(t: jnp.ndarray, num_channels: int = 256) -> jnp.ndarray:
    """Diffusers-style sinusoidal timestep embedding, flip_sin_to_cos=True.

    Parity: Timesteps in Flux2Embeddings.swift:28-45 — exponent
    ``-ln(10000) * arange(half) / half``, concat [cos, sin].
    """
    half = num_channels // 2
    exponent = -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)  # [B, C]


def _mlp_embed(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    w1 = p["linear1"]
    if hasattr(w1, "dtype"):
        x = x.astype(w1.dtype)
    return mm(jax.nn.silu(mm(x, w1)), p["linear2"])


def time_guidance_embedding(
    params: Params,
    config: Flux2TransformerConfig,
    timestep: jnp.ndarray,
    guidance: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Timestep (+ optional guidance) embedding [B, D].

    The x1000 input scaling (sigma in [0,1] -> [0,1000]) matches
    Flux2Transformer.swift:141-146.
    """
    temb = _mlp_embed(params["time_embed"], sinusoidal_embedding(timestep * 1000.0, config.time_embed_channels))
    if config.guidance_embeds and guidance is not None and "guidance_embed" in params:
        gemb = _mlp_embed(params["guidance_embed"], sinusoidal_embedding(guidance * 1000.0, config.time_embed_channels))
        temb = temb + gemb
    return temb


def _modulation(kernel: jnp.ndarray, temb: jnp.ndarray, num_sets: int, dim: int) -> jnp.ndarray:
    """linear(silu(temb)) -> [B, num_sets, 3, D] of (shift, scale, gate)."""
    out = mm(jax.nn.silu(temb), kernel)
    return out.reshape(out.shape[0], num_sets, 3, dim)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, S, H*D] -> [B, H, S, D]."""
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)


def _unheads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, D] -> [B, S, H*D]."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _swiglu_ff(x: jnp.ndarray, w_in: jnp.ndarray, w_out: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU FFN: proj to 2*inner, split (gate, value), silu(gate)*value, out.

    Parity: SwiGLU/Flux2FeedForward (Flux2FeedForward.swift:42-108).
    """
    proj = mm(x, w_in)
    g, v = jnp.split(proj, 2, axis=-1)
    return mm(jax.nn.silu(g) * v, w_out)


def _swiglu_ff_l(x: jnp.ndarray, bp: Params, lp: Optional[Params], in_name: str, out_name: str, scale) -> jnp.ndarray:
    """SwiGLU FFN with optional unmerged LoRA on both projections."""
    proj = _lmm(x, bp, lp, in_name, scale)
    g, v = jnp.split(proj, 2, axis=-1)
    return _lmm(jax.nn.silu(g) * v, bp, lp, out_name, scale)


def _lmm(x: jnp.ndarray, bp: Params, lp: Optional[Params], name: str, scale) -> jnp.ndarray:
    """Projection with an optional UNMERGED LoRA adapter:
    y = x@W + scale*((x@a)@b).

    The unmerged form is the memory-correct training path: differentiating
    a MERGED W' = W + s*a@b materializes a full [in,out] f32 cotangent per
    target weight (tens of GB for a full-width DiT); here the backward only
    forms [in,r] and [r,out] gradients. It also works when W is a quantized
    QTensor (QLoRA-style training on int8/int4 bases,
    LoRATrainingConfig.swift:9-34). Adapter matmuls run in the stream dtype;
    f32 masters live in the optimizer.
    """
    y = mm(x, bp[name])
    if lp is not None and name in lp:
        a = lp[name]["a"].astype(x.dtype)
        b = lp[name]["b"].astype(x.dtype)
        y = y + ((x @ a) @ b) * jnp.asarray(scale, x.dtype)
    return y


def double_block(
    bp: Params,
    img: jnp.ndarray,
    txt: jnp.ndarray,
    img_mod: jnp.ndarray,  # [B, 2, 3, D]
    txt_mod: jnp.ndarray,
    rope_cos: jnp.ndarray,  # [S_txt+S_img, hd] f32
    rope_sin: jnp.ndarray,
    num_heads: int,
    extra_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    attn_bias: Optional[jnp.ndarray] = None,
    kv_extract_span: Optional[Tuple[int, int]] = None,
    blocked_span: Optional[Tuple[int, int, int]] = None,
    ring: Optional[tuple] = None,
    lp: Optional[Params] = None,
    lora_scale: float = 1.0,
):
    """One double-stream block (Flux2TransformerBlock.swift:80-168).

    Two streams (img, txt) each with affine-less LayerNorm + AdaLN modulation,
    a joint attention over the concatenated [txt ; img] sequence, and
    per-stream SwiGLU FFNs. ``extra_kv`` prepends post-RoPE cached reference
    K/V between the txt and img segments (klein-9b-kv path).
    """
    s_txt = txt.shape[1]

    # --- attention sub-block ---
    img_n = modulate(layer_norm(img), bp_shift(img_mod, 0), bp_scale(img_mod, 0))
    txt_n = modulate(layer_norm(txt), bp_shift(txt_mod, 0), bp_scale(txt_mod, 0))

    q_img = _heads(_lmm(img_n, bp, lp, "to_q", lora_scale), num_heads)
    k_img = _heads(_lmm(img_n, bp, lp, "to_k", lora_scale), num_heads)
    v_img = _heads(_lmm(img_n, bp, lp, "to_v", lora_scale), num_heads)
    q_txt = _heads(_lmm(txt_n, bp, lp, "add_q", lora_scale), num_heads)
    k_txt = _heads(_lmm(txt_n, bp, lp, "add_k", lora_scale), num_heads)
    v_txt = _heads(_lmm(txt_n, bp, lp, "add_v", lora_scale), num_heads)

    q_img = rms_norm(q_img, bp["norm_q"])
    k_img = rms_norm(k_img, bp["norm_k"])
    q_txt = rms_norm(q_txt, bp["norm_added_q"])
    k_txt = rms_norm(k_txt, bp["norm_added_k"])

    # Joint sequence is [txt ; img]; RoPE ids were built in the same order.
    q = jnp.concatenate([q_txt, q_img], axis=2)
    k = jnp.concatenate([k_txt, k_img], axis=2)
    v = jnp.concatenate([v_txt, v_img], axis=2)
    q = apply_rope(q, rope_cos, rope_sin)
    k = apply_rope(k, rope_cos, rope_sin)

    extracted = None
    if kv_extract_span is not None:
        start, length = kv_extract_span
        extracted = (k[:, :, start : start + length], v[:, :, start : start + length])

    if extra_kv is not None:
        ck, cv = extra_kv  # post-RoPE cached reference K/V [B, H, S_ref, hd]
        k = jnp.concatenate([k[:, :, :s_txt], ck, k[:, :, s_txt:]], axis=2)
        v = jnp.concatenate([v[:, :, :s_txt], cv, v[:, :, s_txt:]], axis=2)

    # qk are RMS-normed above: logits are range-bounded, unlocking the
    # flash kernel's constant-anchor softmax at long S (safe for
    # gamma_q*gamma_k up to ~7.8; violations surface as NaN).
    attn = sdpa(q, k, v, bias=attn_bias, blocked_span=blocked_span, ring=ring,
                bounded_logits=True)
    txt_attn, img_attn = attn[:, :, :s_txt], attn[:, :, s_txt:]

    img = img + gate(_lmm(_unheads(img_attn), bp, lp, "to_out", lora_scale), bp_gate(img_mod, 0))
    txt = txt + gate(_lmm(_unheads(txt_attn), bp, lp, "add_out", lora_scale), bp_gate(txt_mod, 0))

    # --- FFN sub-block ---
    img_n2 = modulate(layer_norm(img), bp_shift(img_mod, 1), bp_scale(img_mod, 1))
    txt_n2 = modulate(layer_norm(txt), bp_shift(txt_mod, 1), bp_scale(txt_mod, 1))
    img = img + gate(_swiglu_ff_l(img_n2, bp, lp, "ff_in", "ff_out", lora_scale), bp_gate(img_mod, 1))
    txt = txt + gate(_swiglu_ff_l(txt_n2, bp, lp, "ff_ctx_in", "ff_ctx_out", lora_scale), bp_gate(txt_mod, 1))
    if kv_extract_span is not None:
        return img, txt, extracted
    return img, txt


def single_block(
    bp: Params,
    x: jnp.ndarray,  # [B, S, D] concatenated [txt ; img]
    mod: jnp.ndarray,  # [B, 1, 3, D]
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    num_heads: int,
    extra_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    txt_len: int = 0,
    attn_bias: Optional[jnp.ndarray] = None,
    kv_extract_span: Optional[Tuple[int, int]] = None,
    blocked_span: Optional[Tuple[int, int, int]] = None,
    ring: Optional[tuple] = None,
    lp: Optional[Params] = None,
    lora_scale: float = 1.0,
):
    """One single-stream block (Flux2SingleBlock.swift:59-98).

    One norm + AdaLN set, then fused-parallel attention + SwiGLU MLP
    (Flux2ParallelAttention.swift:80-123). The reference's single fused
    D->(3i+2m) projection is stored as separate Q/K/V/gate/up leaves (clean
    tensor-parallel sharding); the fused output projection likewise splits
    into out_attn + out_mlp whose results sum (same arithmetic).
    """
    x_n = modulate(layer_norm(x), bp_shift(mod, 0), bp_scale(mod, 0))

    q = rms_norm(_heads(_lmm(x_n, bp, lp, "to_q", lora_scale), num_heads), bp["norm_q"])
    k = rms_norm(_heads(_lmm(x_n, bp, lp, "to_k", lora_scale), num_heads), bp["norm_k"])
    v = _heads(_lmm(x_n, bp, lp, "to_v", lora_scale), num_heads)

    q = apply_rope(q, rope_cos, rope_sin)
    k = apply_rope(k, rope_cos, rope_sin)

    extracted = None
    if kv_extract_span is not None:
        start, length = kv_extract_span
        extracted = (k[:, :, start : start + length], v[:, :, start : start + length])

    if extra_kv is not None:
        ck, cv = extra_kv
        k = jnp.concatenate([k[:, :, :txt_len], ck, k[:, :, txt_len:]], axis=2)
        v = jnp.concatenate([v[:, :, :txt_len], cv, v[:, :, txt_len:]], axis=2)

    attn = _unheads(sdpa(q, k, v, bias=attn_bias, blocked_span=blocked_span, ring=ring,
                         bounded_logits=True))  # qk RMS-normed above
    mlp = jax.nn.silu(_lmm(x_n, bp, lp, "mlp_gate", lora_scale)) * _lmm(x_n, bp, lp, "mlp_up", lora_scale)
    out = _lmm(attn, bp, lp, "out_attn", lora_scale) + _lmm(mlp, bp, lp, "out_mlp", lora_scale)
    res = x + gate(out, bp_gate(mod, 0))
    if kv_extract_span is not None:
        return res, extracted
    return res


def _remat_wrap(fn, remat):
    """Apply the selected rematerialization policy to a block function."""
    if not remat:
        return fn
    if remat == "dots":
        return jax.checkpoint(fn, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims)
    return jax.checkpoint(fn)


def bp_shift(mod: jnp.ndarray, s: int) -> jnp.ndarray:
    return mod[:, s, 0]


def bp_scale(mod: jnp.ndarray, s: int) -> jnp.ndarray:
    return mod[:, s, 1]


def bp_gate(mod: jnp.ndarray, s: int) -> jnp.ndarray:
    return mod[:, s, 2]


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def _seq_shard(x: jnp.ndarray, ring: Optional[tuple]) -> jnp.ndarray:
    """Constrain the token axis of [B, S, D] to the ring/sp mesh axis.

    With ring attention active, pinning activations to the sequence axis
    between attentions makes the WHOLE forward sequence-parallel (GSPMD
    splits the FFN/norm/projection token work too), instead of only the
    attention ring. No-op when context parallelism is off.
    """
    if ring is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh, axis = ring
    if x.shape[1] % mesh.shape[axis]:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(None, axis)))


def forward(
    params: Params,
    config: Flux2TransformerConfig,
    hidden_states: jnp.ndarray,  # [B, S_img, 128]
    encoder_hidden_states: jnp.ndarray,  # [B, S_txt, joint_dim]
    timestep: jnp.ndarray,  # [B] sigma in [0, 1]
    rope_cos: jnp.ndarray,  # [S_txt+S_img, head_dim] f32 (combined [txt;img] ids)
    rope_sin: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,  # [B]
    remat: "bool | str" = False,
    ring: Optional[tuple] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 1.0,
) -> jnp.ndarray:
    """DiT forward: [B, S_img, 128] velocity prediction.

    Parity: Flux2Transformer.swift:123-327. ``remat`` selects the
    rematerialization policy (replaces MLXCheckpoint.swift's Cmlx binding):
    False = none; True or "block" = full per-block recompute;
    "dots" = per-block but keep matmul outputs resident
    (checkpoint_dots_with_no_batch_dims — less recompute, more memory).

    ``ring=(mesh, axis)`` enables sequence-parallel ring attention in every
    block: the joint [txt;img] token axis is sharded over ``axis`` and K/V
    shards rotate over the ICI ring — per-device attention memory drops from
    O(S^2) to O((S/n)^2), the TPU-native answer to the reference's max-pixel
    caps on long multi-reference sequences. Total tokens must divide by the
    axis size.
    """
    d = config.inner_dim
    nh = config.num_attention_heads
    s_txt = encoder_hidden_states.shape[1]

    img = _seq_shard(mm(hidden_states, params["x_embedder"]["kernel"]), ring)
    ctx_w = params["context_embedder"]["kernel"]
    ctx_dtype = ctx_w.dtype if hasattr(ctx_w, "dtype") else hidden_states.dtype
    txt = _seq_shard(mm(encoder_hidden_states.astype(ctx_dtype), ctx_w), ring)

    temb = time_guidance_embedding(params, config, timestep, guidance)
    temb = temb.astype(img.dtype)  # keep the stream dtype even when the
    # time-embed weights are quantized (dequant runs in f32)

    img_mod = _modulation(params["double_mod_img"]["kernel"], temb, 2, d)
    txt_mod = _modulation(params["double_mod_txt"]["kernel"], temb, 2, d)
    single_mod = _modulation(params["single_mod"]["kernel"], temb, 1, d)

    rope_cos = rope_cos.astype(jnp.float32)
    rope_sin = rope_sin.astype(jnp.float32)

    lora_d = lora.get("double_blocks") if lora is not None else None
    lora_s = lora.get("single_blocks") if lora is not None else None

    def double_body(carry, xs):
        bp, lp = xs if lora_d is not None else (xs, None)
        i, t = carry
        fn = _remat_wrap(
            functools.partial(double_block, num_heads=nh, ring=ring, lora_scale=lora_scale),
            remat,
        )
        i, t = fn(bp, i, t, img_mod, txt_mod, rope_cos, rope_sin, lp=lp)
        # Sequence-sharded activations END-TO-END: pin each block's output
        # streams to the ring axis so the FFNs/norms/projections (not just
        # attention) split token work across sp — per-device activation
        # memory and non-attention FLOPs scale ~1/sp.
        return (_seq_shard(i, ring), _seq_shard(t, ring)), None

    xs_d = (params["double_blocks"], lora_d) if lora_d is not None else params["double_blocks"]
    (img, txt), _ = jax.lax.scan(double_body, (img, txt), xs_d)

    x = _seq_shard(jnp.concatenate([txt, img], axis=1), ring)

    def single_body(carry, xs):
        bp, lp = xs if lora_s is not None else (xs, None)
        fn = _remat_wrap(
            functools.partial(single_block, num_heads=nh, ring=ring, lora_scale=lora_scale),
            remat,
        )
        return _seq_shard(fn(bp, carry, single_mod, rope_cos, rope_sin, lp=lp), ring), None

    xs_s = (params["single_blocks"], lora_s) if lora_s is not None else params["single_blocks"]
    x, _ = jax.lax.scan(single_body, x, xs_s)

    img = x[:, s_txt:]

    # Final AdaLN-continuous: linear(silu(temb)) -> (scale, shift) in
    # diffusers order (Flux2Modulation.swift:142-155).
    cond = mm(jax.nn.silu(temb), params["norm_out"]["kernel"])
    scale, shift = jnp.split(cond, 2, axis=-1)
    img = modulate(layer_norm(img), shift, scale)
    return mm(img, params["proj_out"]["kernel"])


# ---------------------------------------------------------------------------
# KV-cached forwards (klein-9b-kv multi-reference I2I)
# ---------------------------------------------------------------------------


def _prelude(params, config, hidden_states, encoder_hidden_states, timestep, guidance):
    d = config.inner_dim
    img = mm(hidden_states, params["x_embedder"]["kernel"])
    ctx_w = params["context_embedder"]["kernel"]
    ctx_dtype = ctx_w.dtype if hasattr(ctx_w, "dtype") else hidden_states.dtype
    txt = mm(encoder_hidden_states.astype(ctx_dtype), ctx_w)
    temb = time_guidance_embedding(params, config, timestep, guidance).astype(img.dtype)
    img_mod = _modulation(params["double_mod_img"]["kernel"], temb, 2, d)
    txt_mod = _modulation(params["double_mod_txt"]["kernel"], temb, 2, d)
    single_mod = _modulation(params["single_mod"]["kernel"], temb, 1, d)
    return img, txt, temb, img_mod, txt_mod, single_mod


def _final(params, temb, img):
    cond = mm(jax.nn.silu(temb), params["norm_out"]["kernel"])
    scale, shift = jnp.split(cond, 2, axis=-1)
    img = modulate(layer_norm(img), shift, scale)
    return mm(img, params["proj_out"]["kernel"])


def forward_kv_extract(
    params: Params,
    config: Flux2TransformerConfig,
    hidden_states: jnp.ndarray,  # [B, S_img, 128] output tokens
    reference_hidden_states: jnp.ndarray,  # [B, S_ref, 128] clean reference tokens
    encoder_hidden_states: jnp.ndarray,  # [B, S_txt, joint]
    timestep: jnp.ndarray,
    rope_cos: jnp.ndarray,  # over combined [txt ; ref ; img] ids
    rope_sin: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Step 0 of KV-cached denoising (Flux2Transformer.swift:346-457).

    Processes [txt ; ref ; img]; reference queries are masked from attending
    output-image keys (Flux2Attention.swift:422-437) so their K/V are
    output-independent and reusable. Returns
    (velocity [B, S_img, 128],
     double cache (k, v) [L, B, H, S_ref, hd],
     single cache (k, v) [Ls, B, H, S_ref, hd]) — post-RoPE, as the
    reference caches them (TransformerKVCache.swift:13-33).
    """
    nh = config.num_attention_heads
    s_txt = encoder_hidden_states.shape[1]
    s_ref = reference_hidden_states.shape[1]
    s_img = hidden_states.shape[1]

    img, txt, temb, img_mod, txt_mod, single_mod = _prelude(
        params, config, hidden_states, encoder_hidden_states, timestep, guidance
    )
    ref = mm(reference_hidden_states, params["x_embedder"]["kernel"])
    # image stream = [ref ; img] (reference order, Flux2Transformer.swift:361)
    img_stream = jnp.concatenate([ref, img], axis=1)

    # Contiguous-segment mask: ref queries [s_txt, s_txt+s_ref) never see
    # output-image keys [s_txt+s_ref, ...) — O(1) metadata the flash kernel
    # applies in-tile (no S x S bias materialization at 45k tokens).
    span_blocked = (s_txt, s_txt + s_ref, s_txt + s_ref)

    rope_cos = rope_cos.astype(jnp.float32)
    rope_sin = rope_sin.astype(jnp.float32)
    span = (s_txt, s_ref)  # ref tokens sit right after txt in the joint seq

    def double_body(carry, bp):
        i, t = carry
        i, t, kv = double_block(
            bp, i, t, img_mod, txt_mod, rope_cos, rope_sin, nh,
            blocked_span=span_blocked, kv_extract_span=span,
        )
        return (i, t), kv

    (img_stream, txt), double_kv = jax.lax.scan(double_body, (img_stream, txt), params["double_blocks"])

    x = jnp.concatenate([txt, img_stream], axis=1)

    def single_body(carry, bp):
        out, kv = single_block(
            bp, carry, single_mod, rope_cos, rope_sin, nh,
            blocked_span=span_blocked, kv_extract_span=span,
        )
        return out, kv

    x, single_kv = jax.lax.scan(single_body, x, params["single_blocks"])

    out = x[:, s_txt + s_ref :]
    return _final(params, temb, out), double_kv, single_kv


def forward_kv_cached(
    params: Params,
    config: Flux2TransformerConfig,
    hidden_states: jnp.ndarray,  # [B, S_img, 128]
    encoder_hidden_states: jnp.ndarray,
    timestep: jnp.ndarray,
    rope_cos: jnp.ndarray,  # over [txt ; img] ids only (no ref)
    rope_sin: jnp.ndarray,
    double_kv: Tuple[jnp.ndarray, jnp.ndarray],  # [L, B, H, S_ref, hd] x2
    single_kv: Tuple[jnp.ndarray, jnp.ndarray],
    guidance: Optional[jnp.ndarray] = None,
    ring: Optional[tuple] = None,
) -> jnp.ndarray:
    """Steps 1+ of KV-cached denoising (Flux2Transformer.swift:459-546).

    Only [txt ; img] tokens run through the network; each attention inserts
    the cached post-RoPE reference K/V between the txt and img segments
    (Flux2Attention.swift:390-404) — ~2.66x faster multi-reference I2I.

    ``ring=(mesh, axis)``: sequence-parallel ring attention. Unlike the
    extract pass (whose blocked-span mask the ring cannot express), the
    cached steps are unmasked, so context parallelism composes with the KV
    cache: queries shard over the [txt;img] axis and the concatenated
    [txt ; cached-ref ; img] K/V rotate on the ICI ring. Requires both the
    query token count and query+S_ref to divide the axis size (per-shape
    dense fallback otherwise, see ops.attention.sdpa).
    """
    nh = config.num_attention_heads
    s_txt = encoder_hidden_states.shape[1]

    img, txt, temb, img_mod, txt_mod, single_mod = _prelude(
        params, config, hidden_states, encoder_hidden_states, timestep, guidance
    )
    img = _seq_shard(img, ring)
    txt = _seq_shard(txt, ring)
    rope_cos = rope_cos.astype(jnp.float32)
    rope_sin = rope_sin.astype(jnp.float32)

    def double_body(carry, inp):
        i, t = carry
        bp, ck, cv = inp
        i, t = double_block(
            bp, i, t, img_mod, txt_mod, rope_cos, rope_sin, nh, extra_kv=(ck, cv),
            ring=ring,
        )
        return (_seq_shard(i, ring), _seq_shard(t, ring)), None

    (img, txt), _ = jax.lax.scan(
        double_body, (img, txt), (params["double_blocks"], double_kv[0], double_kv[1])
    )

    x = _seq_shard(jnp.concatenate([txt, img], axis=1), ring)

    def single_body(carry, inp):
        bp, ck, cv = inp
        out = single_block(
            bp, carry, single_mod, rope_cos, rope_sin, nh,
            extra_kv=(ck, cv), txt_len=s_txt, ring=ring,
        )
        return _seq_shard(out, ring), None

    x, _ = jax.lax.scan(single_body, x, (params["single_blocks"], single_kv[0], single_kv[1]))

    return _final(params, temb, x[:, s_txt:])
