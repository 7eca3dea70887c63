"""Independent torch oracle for the FLUX.2 DiT forward.

The encoders have an elementwise HF-torch oracle (tests/test_hf_parity.py);
this gives the core transformer the same treatment. It is a from-scratch
torch implementation of the FLUX.2 forward written against the reference
semantics (Flux2Transformer.swift:123-327, Flux2TransformerBlock.swift:80-168,
Flux2SingleBlock.swift:59-98, Flux2ParallelAttention.swift:72-123,
Flux2Attention.swift:103-193, Flux2Modulation.swift, Flux2Embeddings.swift,
Flux2RoPE.swift:123-241) — mirroring diffusers' Flux2Transformer2DModel,
which both the reference and this repo cite as their source of truth.

It consumes the RAW checkpoint dict in the DIFFUSERS naming (torch [out, in]
linear layout) directly — the same dict that io/weight_mapping.py maps into
the JAX pytree — so a parity test exercises both the forward math and the
weight mapping (QKV handling, fused single-block split, adaLN ordering).

Deliberately naive torch: explicit per-layer loops, f64-capable, no fusion,
no flash attention — an oracle, not a fast implementation.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import torch


def _linear(x: torch.Tensor, w: torch.Tensor) -> torch.Tensor:
    """torch checkpoint layout: w is [out, in]; y = x @ w.T (bias-free)."""
    return x @ w.transpose(0, 1)


def _layer_norm(x: torch.Tensor, eps: float = 1e-6) -> torch.Tensor:
    """Affine-free LayerNorm (LayerNorm(dimensions:eps:1e-6, affine:false))."""
    mu = x.mean(dim=-1, keepdim=True)
    var = x.var(dim=-1, keepdim=True, unbiased=False)
    return (x - mu) / torch.sqrt(var + eps)


def _rms_norm(x: torch.Tensor, weight: torch.Tensor, eps: float = 1e-6) -> torch.Tensor:
    """RMSNorm over the head dim (Flux2Attention.swift:11-26)."""
    ms = (x * x).mean(dim=-1, keepdim=True)
    return x * torch.rsqrt(ms + eps) * weight


def sinusoidal_embedding(t: torch.Tensor, num_channels: int = 256) -> torch.Tensor:
    """Diffusers Timesteps, flip_sin_to_cos=True, downscale_freq_shift=0
    (Flux2Embeddings.swift:28-45): concat [cos, sin]."""
    half = num_channels // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    freqs = torch.exp(exponent).to(t.dtype)
    args = t[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def rope_embeddings(ids: torch.Tensor, axes_dims=(32, 32, 32, 32), theta: float = 2000.0):
    """4-axis RoPE cos/sin [S, sum(axes_dims)] — per-axis
    repeat_interleave(2) then concat across axes (Flux2RoPE.swift:123-169)."""
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dims):
        pos = ids[:, axis].to(torch.float64 if ids.dtype == torch.float64 else torch.float32)
        freq_seq = torch.arange(0, dim, 2, dtype=pos.dtype) / dim
        inv_freq = theta**-freq_seq
        freqs = pos[:, None] * inv_freq[None, :]  # [S, dim/2]
        cos_parts.append(torch.repeat_interleave(torch.cos(freqs), 2, dim=-1))
        sin_parts.append(torch.repeat_interleave(torch.sin(freqs), 2, dim=-1))
    return torch.cat(cos_parts, dim=-1), torch.cat(sin_parts, dim=-1)


def _rotate_half_interleaved(x: torch.Tensor) -> torch.Tensor:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...): consecutive pairs
    as (real, imag) (Flux2RoPE.swift:208-241)."""
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    real, imag = x2[..., 0], x2[..., 1]
    return torch.stack([-imag, real], dim=-1).reshape(x.shape)


def _apply_rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor) -> torch.Tensor:
    return x * cos + _rotate_half_interleaved(x) * sin


def _heads(x: torch.Tensor, num_heads: int) -> torch.Tensor:
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, -1).permute(0, 2, 1, 3)


def _unheads(x: torch.Tensor) -> torch.Tensor:
    b, h, s, d = x.shape
    return x.permute(0, 2, 1, 3).reshape(b, s, h * d)


def _sdpa(q: torch.Tensor, k: torch.Tensor, v: torch.Tensor) -> torch.Tensor:
    """Plain softmax attention, scale 1/sqrt(head_dim), no mask."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    attn = torch.softmax((q @ k.transpose(-2, -1)) * scale, dim=-1)
    return attn @ v


def _modulation(w: Dict[str, torch.Tensor], key: str, temb: torch.Tensor, num_sets: int):
    """linear(silu(temb)) split into num_sets x (shift, scale, gate)
    (Flux2Modulation.swift:50-77)."""
    all_params = _linear(torch.nn.functional.silu(temb), w[key])
    dim = all_params.shape[-1] // (3 * num_sets)
    sets = []
    for i in range(num_sets):
        s0 = i * dim * 3
        sets.append(
            (
                all_params[:, s0 : s0 + dim],  # shift
                all_params[:, s0 + dim : s0 + 2 * dim],  # scale
                all_params[:, s0 + 2 * dim : s0 + 3 * dim],  # gate
            )
        )
    return sets


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _swiglu(x: torch.Tensor, w_in: torch.Tensor, w_out: torch.Tensor) -> torch.Tensor:
    """linear_in -> split (gate, value) halves -> silu(gate)*value -> linear_out
    (Flux2FeedForward.swift SwiGLU)."""
    proj = _linear(x, w_in)
    gate, value = proj.chunk(2, dim=-1)
    return _linear(torch.nn.functional.silu(gate) * value, w_out)


def image_position_ids(h: int, w: int) -> torch.Tensor:
    """[H*W, 4] (T=0, H, W, L=0) — Flux2RoPE.swift:249-270."""
    hh, ww = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    zeros = torch.zeros(h * w, dtype=torch.long)
    return torch.stack([zeros, hh.reshape(-1), ww.reshape(-1), zeros], dim=1)


def text_position_ids(length: int) -> torch.Tensor:
    """[S, 4] (0, 0, 0, L) — Flux2RoPE.swift:275-285."""
    zeros = torch.zeros(length, dtype=torch.long)
    return torch.stack([zeros, zeros, zeros, torch.arange(length)], dim=1)


class TorchFlux2Oracle:
    """Forward-only FLUX.2 DiT over a raw diffusers-named checkpoint dict."""

    def __init__(
        self,
        weights: Dict[str, torch.Tensor],
        num_layers: int,
        num_single_layers: int,
        num_heads: int,
        head_dim: int = 128,
        axes_dims=(32, 32, 32, 32),
        theta: float = 2000.0,
        guidance_embeds: bool = True,
        dtype: torch.dtype = torch.float32,
    ):
        self.w = {k: v.to(dtype) for k, v in weights.items()}
        self.num_layers = num_layers
        self.num_single_layers = num_single_layers
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.inner_dim = num_heads * head_dim
        self.axes_dims = axes_dims
        self.theta = theta
        self.guidance_embeds = guidance_embeds

    # -- embeddings ---------------------------------------------------------
    def _temb(self, timestep: torch.Tensor, guidance: Optional[torch.Tensor]):
        """x1000 input scaling per Flux2Transformer.swift:141-149."""
        w = self.w
        t_emb = sinusoidal_embedding(timestep * 1000.0)
        temb = _linear(
            torch.nn.functional.silu(
                _linear(t_emb, w["time_guidance_embed.timestep_embedder.linear_1.weight"])
            ),
            w["time_guidance_embed.timestep_embedder.linear_2.weight"],
        )
        if self.guidance_embeds and guidance is not None:
            g_emb = sinusoidal_embedding(guidance * 1000.0)
            temb = temb + _linear(
                torch.nn.functional.silu(
                    _linear(g_emb, w["time_guidance_embed.guidance_embedder.linear_1.weight"])
                ),
                w["time_guidance_embed.guidance_embedder.linear_2.weight"],
            )
        return temb

    # -- blocks -------------------------------------------------------------
    def _double_block(self, i, img, txt, img_mod, txt_mod, cos, sin, s_txt):
        w, nh = self.w, self.num_heads
        p = f"transformer_blocks.{i}."

        # attention halves of the modulation (set 0)
        img_n = _modulate(_layer_norm(img), img_mod[0][0], img_mod[0][1])
        txt_n = _modulate(_layer_norm(txt), txt_mod[0][0], txt_mod[0][1])

        q = _heads(_linear(img_n, w[p + "attn.to_q.weight"]), nh)
        k = _heads(_linear(img_n, w[p + "attn.to_k.weight"]), nh)
        v = _heads(_linear(img_n, w[p + "attn.to_v.weight"]), nh)
        aq = _heads(_linear(txt_n, w[p + "attn.add_q_proj.weight"]), nh)
        ak = _heads(_linear(txt_n, w[p + "attn.add_k_proj.weight"]), nh)
        av = _heads(_linear(txt_n, w[p + "attn.add_v_proj.weight"]), nh)

        q = _rms_norm(q, w[p + "attn.norm_q.weight"])
        k = _rms_norm(k, w[p + "attn.norm_k.weight"])
        aq = _rms_norm(aq, w[p + "attn.norm_added_q.weight"])
        ak = _rms_norm(ak, w[p + "attn.norm_added_k.weight"])

        # combined ids are [txt; img] (Flux2Attention.swift:144-157)
        q = _apply_rope(q, cos[s_txt:], sin[s_txt:])
        k = _apply_rope(k, cos[s_txt:], sin[s_txt:])
        aq = _apply_rope(aq, cos[:s_txt], sin[:s_txt])
        ak = _apply_rope(ak, cos[:s_txt], sin[:s_txt])

        out = _sdpa(
            torch.cat([aq, q], dim=2), torch.cat([ak, k], dim=2), torch.cat([av, v], dim=2)
        )
        txt_attn = _unheads(out[:, :, :s_txt])
        img_attn = _unheads(out[:, :, s_txt:])

        img = img + img_mod[0][2][:, None, :] * _linear(img_attn, w[p + "attn.to_out.0.weight"])
        txt = txt + txt_mod[0][2][:, None, :] * _linear(txt_attn, w[p + "attn.to_add_out.weight"])

        # FFN halves (set 1)
        img_n2 = _modulate(_layer_norm(img), img_mod[1][0], img_mod[1][1])
        txt_n2 = _modulate(_layer_norm(txt), txt_mod[1][0], txt_mod[1][1])
        img = img + img_mod[1][2][:, None, :] * _swiglu(
            img_n2, w[p + "ff.linear_in.weight"], w[p + "ff.linear_out.weight"]
        )
        txt = txt + txt_mod[1][2][:, None, :] * _swiglu(
            txt_n2, w[p + "ff_context.linear_in.weight"], w[p + "ff_context.linear_out.weight"]
        )
        return img, txt

    def _single_block(self, i, x, mod, cos, sin):
        w, nh, inner = self.w, self.num_heads, self.inner_dim
        p = f"single_transformer_blocks.{i}."

        x_n = _modulate(_layer_norm(x), mod[0][0], mod[0][1])
        proj = _linear(x_n, w[p + "attn.to_qkv_mlp_proj.weight"])
        mlp_hidden = (proj.shape[-1] - 3 * inner) // 2
        q = _heads(proj[..., :inner], nh)
        k = _heads(proj[..., inner : 2 * inner], nh)
        v = _heads(proj[..., 2 * inner : 3 * inner], nh)
        mlp_gate = proj[..., 3 * inner : 3 * inner + mlp_hidden]
        mlp_up = proj[..., 3 * inner + mlp_hidden :]

        q = _rms_norm(q, w[p + "attn.norm_q.weight"])
        k = _rms_norm(k, w[p + "attn.norm_k.weight"])
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        attn_out = _unheads(_sdpa(q, k, v))
        mlp_out = torch.nn.functional.silu(mlp_gate) * mlp_up
        combined = torch.cat([attn_out, mlp_out], dim=-1)
        out = _linear(combined, w[p + "attn.to_out.weight"])
        return x + mod[0][2][:, None, :] * out

    # -- forward ------------------------------------------------------------
    @torch.no_grad()
    def forward(
        self,
        hidden_states: torch.Tensor,  # [B, S_img, 128]
        encoder_hidden_states: torch.Tensor,  # [B, S_txt, joint_dim]
        timestep: torch.Tensor,  # [B] sigma in [0, 1]
        img_ids: torch.Tensor,  # [S_img, 4]
        txt_ids: torch.Tensor,  # [S_txt, 4]
        guidance: Optional[torch.Tensor] = None,
    ) -> torch.Tensor:
        w = self.w
        s_txt = encoder_hidden_states.shape[1]

        img = _linear(hidden_states, w["x_embedder.weight"])
        txt = _linear(encoder_hidden_states, w["context_embedder.weight"])
        temb = self._temb(timestep, guidance)

        ids = torch.cat([txt_ids, img_ids], dim=0)
        cos, sin = rope_embeddings(ids, self.axes_dims, self.theta)
        cos, sin = cos.to(img.dtype), sin.to(img.dtype)

        img_mod = _modulation(w, "double_stream_modulation_img.linear.weight", temb, 2)
        txt_mod = _modulation(w, "double_stream_modulation_txt.linear.weight", temb, 2)
        single_mod = _modulation(w, "single_stream_modulation.linear.weight", temb, 1)

        for i in range(self.num_layers):
            img, txt = self._double_block(i, img, txt, img_mod, txt_mod, cos, sin, s_txt)

        x = torch.cat([txt, img], dim=1)
        for i in range(self.num_single_layers):
            x = self._single_block(i, x, single_mod, cos, sin)

        img = x[:, s_txt:]

        # AdaLN-continuous output: linear(silu(temb)) -> (scale, shift) in
        # diffusers order (Flux2Modulation.swift:142-155)
        cond = _linear(torch.nn.functional.silu(temb), w["norm_out.linear.weight"])
        scale, shift = cond.chunk(2, dim=-1)
        img = _modulate(_layer_norm(img), shift, scale)
        return _linear(img, w["proj_out.weight"])


def random_diffusers_checkpoint(
    seed: int,
    num_layers: int,
    num_single_layers: int,
    num_heads: int,
    head_dim: int,
    joint_dim: int,
    mlp_ratio: float = 3.0,
    in_channels: int = 128,
    guidance_embeds: bool = True,
) -> Dict[str, torch.Tensor]:
    """Random FLUX.2 checkpoint in diffusers naming (torch [out, in] layout)."""
    g = torch.Generator().manual_seed(seed)
    d = num_heads * head_dim
    mlp = int(d * mlp_ratio)

    def lin(out_dim, in_dim):
        return torch.randn(out_dim, in_dim, generator=g) * (in_dim**-0.5)

    w: Dict[str, torch.Tensor] = {
        "x_embedder.weight": lin(d, in_channels),
        "context_embedder.weight": lin(d, joint_dim),
        "time_guidance_embed.timestep_embedder.linear_1.weight": lin(d, 256),
        "time_guidance_embed.timestep_embedder.linear_2.weight": lin(d, d),
        "double_stream_modulation_img.linear.weight": lin(6 * d, d),
        "double_stream_modulation_txt.linear.weight": lin(6 * d, d),
        "single_stream_modulation.linear.weight": lin(3 * d, d),
        "norm_out.linear.weight": lin(2 * d, d),
        "proj_out.weight": lin(in_channels, d),
    }
    if guidance_embeds:
        w["time_guidance_embed.guidance_embedder.linear_1.weight"] = lin(d, 256)
        w["time_guidance_embed.guidance_embedder.linear_2.weight"] = lin(d, d)
    for i in range(num_layers):
        p = f"transformer_blocks.{i}."
        w[p + "attn.to_q.weight"] = lin(d, d)
        w[p + "attn.to_k.weight"] = lin(d, d)
        w[p + "attn.to_v.weight"] = lin(d, d)
        w[p + "attn.to_out.0.weight"] = lin(d, d)
        w[p + "attn.add_q_proj.weight"] = lin(d, d)
        w[p + "attn.add_k_proj.weight"] = lin(d, d)
        w[p + "attn.add_v_proj.weight"] = lin(d, d)
        w[p + "attn.to_add_out.weight"] = lin(d, d)
        # non-trivial RMSNorm scales so the oracle catches norm bugs
        w[p + "attn.norm_q.weight"] = 1.0 + 0.1 * torch.randn(head_dim, generator=g)
        w[p + "attn.norm_k.weight"] = 1.0 + 0.1 * torch.randn(head_dim, generator=g)
        w[p + "attn.norm_added_q.weight"] = 1.0 + 0.1 * torch.randn(head_dim, generator=g)
        w[p + "attn.norm_added_k.weight"] = 1.0 + 0.1 * torch.randn(head_dim, generator=g)
        w[p + "ff.linear_in.weight"] = lin(2 * mlp, d)
        w[p + "ff.linear_out.weight"] = lin(d, mlp)
        w[p + "ff_context.linear_in.weight"] = lin(2 * mlp, d)
        w[p + "ff_context.linear_out.weight"] = lin(d, mlp)
    for i in range(num_single_layers):
        p = f"single_transformer_blocks.{i}."
        w[p + "attn.to_qkv_mlp_proj.weight"] = lin(3 * d + 2 * mlp, d)
        w[p + "attn.to_out.weight"] = lin(d, d + mlp)
        w[p + "attn.norm_q.weight"] = 1.0 + 0.1 * torch.randn(head_dim, generator=g)
        w[p + "attn.norm_k.weight"] = 1.0 + 0.1 * torch.randn(head_dim, generator=g)
    return w


def to_bfl_format(w: Dict[str, torch.Tensor], num_layers: int, num_single_layers: int):
    """Re-key a diffusers checkpoint into the BFL-native dialect
    (WeightLoader.swift:80-205): fused double QKV, fused single
    linear1/linear2, and the final-layer adaLN stored [shift|scale]
    (the mapper must swap it back to diffusers [scale|shift])."""
    out: Dict[str, torch.Tensor] = {
        "img_in.weight": w["x_embedder.weight"],
        "txt_in.weight": w["context_embedder.weight"],
        "time_in.in_layer.weight": w["time_guidance_embed.timestep_embedder.linear_1.weight"],
        "time_in.out_layer.weight": w["time_guidance_embed.timestep_embedder.linear_2.weight"],
        "double_stream_modulation_img.lin.weight": w["double_stream_modulation_img.linear.weight"],
        "double_stream_modulation_txt.lin.weight": w["double_stream_modulation_txt.linear.weight"],
        "single_stream_modulation.lin.weight": w["single_stream_modulation.linear.weight"],
        "final_layer.linear.weight": w["proj_out.weight"],
    }
    if "time_guidance_embed.guidance_embedder.linear_1.weight" in w:
        out["guidance_in.in_layer.weight"] = w["time_guidance_embed.guidance_embedder.linear_1.weight"]
        out["guidance_in.out_layer.weight"] = w["time_guidance_embed.guidance_embedder.linear_2.weight"]
    # BFL stores the final adaLN as [shift | scale] rows
    scale, shift = w["norm_out.linear.weight"].chunk(2, dim=0)
    out["final_layer.adaLN_modulation.1.weight"] = torch.cat([shift, scale], dim=0)
    for i in range(num_layers):
        src, dst = f"transformer_blocks.{i}.", f"double_blocks.{i}."
        out[dst + "img_attn.qkv.weight"] = torch.cat(
            [w[src + "attn.to_q.weight"], w[src + "attn.to_k.weight"], w[src + "attn.to_v.weight"]], dim=0
        )
        out[dst + "txt_attn.qkv.weight"] = torch.cat(
            [w[src + "attn.add_q_proj.weight"], w[src + "attn.add_k_proj.weight"], w[src + "attn.add_v_proj.weight"]],
            dim=0,
        )
        out[dst + "img_attn.proj.weight"] = w[src + "attn.to_out.0.weight"]
        out[dst + "txt_attn.proj.weight"] = w[src + "attn.to_add_out.weight"]
        out[dst + "img_attn.norm.query_norm.scale"] = w[src + "attn.norm_q.weight"]
        out[dst + "img_attn.norm.key_norm.scale"] = w[src + "attn.norm_k.weight"]
        out[dst + "txt_attn.norm.query_norm.scale"] = w[src + "attn.norm_added_q.weight"]
        out[dst + "txt_attn.norm.key_norm.scale"] = w[src + "attn.norm_added_k.weight"]
        out[dst + "img_mlp.0.weight"] = w[src + "ff.linear_in.weight"]
        out[dst + "img_mlp.2.weight"] = w[src + "ff.linear_out.weight"]
        out[dst + "txt_mlp.0.weight"] = w[src + "ff_context.linear_in.weight"]
        out[dst + "txt_mlp.2.weight"] = w[src + "ff_context.linear_out.weight"]
    for i in range(num_single_layers):
        src, dst = f"single_transformer_blocks.{i}.", f"single_blocks.{i}."
        out[dst + "linear1.weight"] = w[src + "attn.to_qkv_mlp_proj.weight"]
        out[dst + "linear2.weight"] = w[src + "attn.to_out.weight"]
        out[dst + "norm.query_norm.scale"] = w[src + "attn.norm_q.weight"]
        out[dst + "norm.key_norm.scale"] = w[src + "attn.norm_k.weight"]
    return out
