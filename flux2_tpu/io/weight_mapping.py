"""Checkpoint-dialect mapping: BFL-native / Diffusers / HF -> flux2-tpu pytrees.

Capability parity with ``Sources/Flux2Core/Loading/WeightLoader.swift``:
  - BFL native dialect (WeightLoader.swift:80-205): fused double-block QKV
    split 3-way, fused single-block linear1 split into Q/K/V/gate/up and
    linear2 into out_attn/out_mlp, and the final-layer adaLN half-swap
    (BFL stores [shift|scale]; diffusers order is [scale|shift] — loading
    without the swap produces posterized output, :182-202).
  - Diffusers dialect (:397-480): name translation, with quanto
    ``._data``/``._scale`` dequantization (:309-370).
  - VAE key mapping with torch OIHW -> JAX HWIO conv transposes (:486-560).
  - HF llama-style text-encoder mapping.

Design difference vs the reference: targets are STACKED per-layer arrays
(leading axis = layer) for the lax.scan'd blocks, so per-layer checkpoint
keys assemble into one [L, ...] leaf per kind. All linear weights transpose
torch [out, in] -> JAX [in, out].
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import numpy as np

from flux2_tpu.models.flux2.config import Flux2TransformerConfig
from flux2_tpu.models.text_encoders.config import DecoderConfig

Weights = Dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# quanto dequantization (diffusers checkpoints quantized with optimum-quanto)
# ---------------------------------------------------------------------------


def dequantize_quanto(weights: Weights) -> Weights:
    """Fold ``<k>._data`` (int8) and ``<k>._scale`` pairs into float ``<k>``."""
    out: Weights = {}
    for key in list(weights.keys()):
        if key.endswith("._data"):
            base = key[: -len("._data")]
            scale = weights.get(base + "._scale")
            data = weights[key]
            if scale is None:
                out[base] = data
            else:
                out[base] = data.astype(np.float32) * scale.astype(np.float32)
        elif key.endswith("._scale"):
            continue
        else:
            out[key] = weights[key]
    return out


def is_bfl_format(weights: Weights) -> bool:
    return any(".img_attn.qkv." in k or k == "img_in.weight" for k in weights)


# ---------------------------------------------------------------------------
# FLUX.2 transformer
# ---------------------------------------------------------------------------


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> JAX [in, out]."""
    return np.ascontiguousarray(w.T)


def map_transformer_weights(
    weights: Weights, config: Flux2TransformerConfig, dtype=np.float32
) -> Dict[str, Any]:
    weights = dequantize_quanto(weights)
    if is_bfl_format(weights):
        per_layer = _map_bfl(weights, config)
    else:
        per_layer = _map_diffusers(weights, config)
    return _assemble(per_layer, config, dtype)


def _map_bfl(w: Weights, config: Flux2TransformerConfig) -> Dict[str, np.ndarray]:
    """BFL-native keys -> canonical per-layer keys (still torch layout)."""
    inner = config.inner_dim
    mlp = config.mlp_hidden_dim
    out: Dict[str, np.ndarray] = {}
    for key, v in w.items():
        m = re.match(r"double_blocks\.(\d+)\.(.+)", key)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            p = f"double.{i}."
            if rest == "img_attn.qkv.weight":
                out[p + "to_q"], out[p + "to_k"], out[p + "to_v"] = np.split(v, 3, axis=0)
            elif rest == "txt_attn.qkv.weight":
                out[p + "add_q"], out[p + "add_k"], out[p + "add_v"] = np.split(v, 3, axis=0)
            elif rest == "img_attn.proj.weight":
                out[p + "to_out"] = v
            elif rest == "txt_attn.proj.weight":
                out[p + "add_out"] = v
            elif rest == "img_attn.norm.query_norm.scale":
                out[p + "norm_q"] = v
            elif rest == "img_attn.norm.key_norm.scale":
                out[p + "norm_k"] = v
            elif rest == "txt_attn.norm.query_norm.scale":
                out[p + "norm_added_q"] = v
            elif rest == "txt_attn.norm.key_norm.scale":
                out[p + "norm_added_k"] = v
            elif rest == "img_mlp.0.weight":
                out[p + "ff_in"] = v
            elif rest == "img_mlp.2.weight":
                out[p + "ff_out"] = v
            elif rest == "txt_mlp.0.weight":
                out[p + "ff_ctx_in"] = v
            elif rest == "txt_mlp.2.weight":
                out[p + "ff_ctx_out"] = v
            continue
        m = re.match(r"single_blocks\.(\d+)\.(.+)", key)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            p = f"single.{i}."
            if rest == "linear1.weight":
                # fused rows: [Q | K | V | gate | up]
                q, k, vv, g, u = np.split(v, [inner, 2 * inner, 3 * inner, 3 * inner + mlp], axis=0)
                out[p + "to_q"], out[p + "to_k"], out[p + "to_v"] = q, k, vv
                out[p + "mlp_gate"], out[p + "mlp_up"] = g, u
            elif rest == "linear2.weight":
                # fused columns (torch in-axis): [attn | mlp]
                out[p + "out_attn"] = v[:, :inner]
                out[p + "out_mlp"] = v[:, inner:]
            elif rest == "norm.query_norm.scale":
                out[p + "norm_q"] = v
            elif rest == "norm.key_norm.scale":
                out[p + "norm_k"] = v
            continue
        if key == "img_in.weight":
            out["x_embedder"] = v
        elif key == "txt_in.weight":
            out["context_embedder"] = v
        elif key == "time_in.in_layer.weight":
            out["time_linear1"] = v
        elif key == "time_in.out_layer.weight":
            out["time_linear2"] = v
        elif key == "guidance_in.in_layer.weight":
            out["guidance_linear1"] = v
        elif key == "guidance_in.out_layer.weight":
            out["guidance_linear2"] = v
        elif key == "double_stream_modulation_img.lin.weight":
            out["double_mod_img"] = v
        elif key == "double_stream_modulation_txt.lin.weight":
            out["double_mod_txt"] = v
        elif key == "single_stream_modulation.lin.weight":
            out["single_mod"] = v
        elif key == "final_layer.adaLN_modulation.1.weight":
            # BFL stores [shift|scale] rows; swap to diffusers [scale|shift].
            d = v.shape[0] // 2
            out["norm_out"] = np.concatenate([v[d:], v[:d]], axis=0)
        elif key == "final_layer.linear.weight":
            out["proj_out"] = v
    return out


_DIFFUSERS_DOUBLE = {
    "attn.to_q.weight": "to_q",
    "attn.to_k.weight": "to_k",
    "attn.to_v.weight": "to_v",
    "attn.to_out.0.weight": "to_out",
    "attn.add_q_proj.weight": "add_q",
    "attn.add_k_proj.weight": "add_k",
    "attn.add_v_proj.weight": "add_v",
    "attn.to_add_out.weight": "add_out",
    "attn.norm_q.weight": "norm_q",
    "attn.norm_k.weight": "norm_k",
    "attn.norm_added_q.weight": "norm_added_q",
    "attn.norm_added_k.weight": "norm_added_k",
    "ff.linear_in.weight": "ff_in",
    "ff.linear_out.weight": "ff_out",
    "ff_context.linear_in.weight": "ff_ctx_in",
    "ff_context.linear_out.weight": "ff_ctx_out",
}


def _map_diffusers(w: Weights, config: Flux2TransformerConfig) -> Dict[str, np.ndarray]:
    inner = config.inner_dim
    mlp = config.mlp_hidden_dim
    out: Dict[str, np.ndarray] = {}
    for key, v in w.items():
        m = re.match(r"transformer_blocks\.(\d+)\.(.+)", key)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            leaf = _DIFFUSERS_DOUBLE.get(rest)
            if leaf:
                out[f"double.{i}.{leaf}"] = v
            continue
        m = re.match(r"single_transformer_blocks\.(\d+)\.(.+)", key)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            p = f"single.{i}."
            if rest == "attn.to_qkv_mlp_proj.weight":
                q, k, vv, g, u = np.split(v, [inner, 2 * inner, 3 * inner, 3 * inner + mlp], axis=0)
                out[p + "to_q"], out[p + "to_k"], out[p + "to_v"] = q, k, vv
                out[p + "mlp_gate"], out[p + "mlp_up"] = g, u
            elif rest in ("attn.to_out.weight", "attn.to_out.0.weight"):
                out[p + "out_attn"] = v[:, :inner]
                out[p + "out_mlp"] = v[:, inner:]
            elif rest == "attn.norm_q.weight":
                out[p + "norm_q"] = v
            elif rest == "attn.norm_k.weight":
                out[p + "norm_k"] = v
            continue
        if key == "x_embedder.weight":
            out["x_embedder"] = v
        elif key == "context_embedder.weight":
            out["context_embedder"] = v
        elif key in ("time_text_embed.timestep_embedder.linear_1.weight", "time_guidance_embed.timestep_embedder.linear_1.weight"):
            out["time_linear1"] = v
        elif key in ("time_text_embed.timestep_embedder.linear_2.weight", "time_guidance_embed.timestep_embedder.linear_2.weight"):
            out["time_linear2"] = v
        elif key in ("time_text_embed.guidance_embedder.linear_1.weight", "time_guidance_embed.guidance_embedder.linear_1.weight"):
            out["guidance_linear1"] = v
        elif key in ("time_text_embed.guidance_embedder.linear_2.weight", "time_guidance_embed.guidance_embedder.linear_2.weight"):
            out["guidance_linear2"] = v
        elif key == "double_stream_modulation_img.linear.weight":
            out["double_mod_img"] = v
        elif key == "double_stream_modulation_txt.linear.weight":
            out["double_mod_txt"] = v
        elif key == "single_stream_modulation.linear.weight":
            out["single_mod"] = v
        elif key == "norm_out.linear.weight":
            out["norm_out"] = v  # diffusers order: no swap
        elif key == "proj_out.weight":
            out["proj_out"] = v
    return out


def _assemble(per: Dict[str, np.ndarray], config: Flux2TransformerConfig, dtype) -> Dict[str, Any]:
    """Canonical per-layer keys -> stacked pytree matching tfm.init_params."""

    def stack(prefix: str, leaf: str, n: int, transpose: bool) -> np.ndarray:
        arrs = []
        for i in range(n):
            key = f"{prefix}.{i}.{leaf}"
            if key not in per:
                raise KeyError(f"missing checkpoint weight: {key}")
            a = per[key]
            arrs.append(_t(a) if transpose else a)
        return np.stack(arrs).astype(dtype)

    nl, ns = config.num_layers, config.num_single_layers
    double_lin = ["to_q", "to_k", "to_v", "to_out", "add_q", "add_k", "add_v", "add_out", "ff_in", "ff_out", "ff_ctx_in", "ff_ctx_out"]
    double_norm = ["norm_q", "norm_k", "norm_added_q", "norm_added_k"]
    single_lin = ["to_q", "to_k", "to_v", "mlp_gate", "mlp_up", "out_attn", "out_mlp"]
    single_norm = ["norm_q", "norm_k"]

    params: Dict[str, Any] = {
        "x_embedder": {"kernel": _t(per["x_embedder"]).astype(dtype)},
        "context_embedder": {"kernel": _t(per["context_embedder"]).astype(dtype)},
        "time_embed": {
            "linear1": _t(per["time_linear1"]).astype(dtype),
            "linear2": _t(per["time_linear2"]).astype(dtype),
        },
        "double_mod_img": {"kernel": _t(per["double_mod_img"]).astype(dtype)},
        "double_mod_txt": {"kernel": _t(per["double_mod_txt"]).astype(dtype)},
        "single_mod": {"kernel": _t(per["single_mod"]).astype(dtype)},
        "double_blocks": {
            **{k: stack("double", k, nl, True) for k in double_lin},
            **{k: stack("double", k, nl, False) for k in double_norm},
        },
        "single_blocks": {
            **{k: stack("single", k, ns, True) for k in single_lin},
            **{k: stack("single", k, ns, False) for k in single_norm},
        },
        "norm_out": {"kernel": _t(per["norm_out"]).astype(dtype)},
        "proj_out": {"kernel": _t(per["proj_out"]).astype(dtype)},
    }
    if config.guidance_embeds:
        if "guidance_linear1" not in per:
            raise KeyError("config.guidance_embeds=True but checkpoint has no guidance embedder")
        params["guidance_embed"] = {
            "linear1": _t(per["guidance_linear1"]).astype(dtype),
            "linear2": _t(per["guidance_linear2"]).astype(dtype),
        }
    return params


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _conv(w: Weights, key: str, dtype) -> Dict[str, np.ndarray]:
    """torch conv [O, I, kh, kw] -> {kernel [kh, kw, I, O], bias [O]}."""
    kernel = np.ascontiguousarray(np.transpose(w[key + ".weight"], (2, 3, 1, 0))).astype(dtype)
    return {"kernel": kernel, "bias": w[key + ".bias"].astype(dtype)}


def _gn(w: Weights, key: str, dtype) -> Dict[str, np.ndarray]:
    return {"scale": w[key + ".weight"].astype(dtype), "bias": w[key + ".bias"].astype(dtype)}


def _dense(w: Weights, key: str, dtype) -> Dict[str, np.ndarray]:
    return {"kernel": _t(w[key + ".weight"]).astype(dtype), "bias": w[key + ".bias"].astype(dtype)}


def _resnet(w: Weights, p: str, dtype) -> Dict[str, Any]:
    out = {
        "norm1": _gn(w, p + ".norm1", dtype),
        "conv1": _conv(w, p + ".conv1", dtype),
        "norm2": _gn(w, p + ".norm2", dtype),
        "conv2": _conv(w, p + ".conv2", dtype),
    }
    if p + ".conv_shortcut.weight" in w:
        out["conv_shortcut"] = _conv(w, p + ".conv_shortcut", dtype)
    return out


def _attnblock(w: Weights, p: str, dtype) -> Dict[str, Any]:
    out_key = p + ".to_out.0" if p + ".to_out.0.weight" in w else p + ".to_out"
    return {
        "group_norm": _gn(w, p + ".group_norm", dtype),
        "to_q": _dense(w, p + ".to_q", dtype),
        "to_k": _dense(w, p + ".to_k", dtype),
        "to_v": _dense(w, p + ".to_v", dtype),
        "to_out": _dense(w, out_key, dtype),
    }


def map_vae_weights(w: Weights, config, dtype=np.float32) -> Dict[str, Any]:
    """Diffusers AutoencoderKL keys -> flux2-tpu VAE pytree (incl. bn stats)."""
    n_levels = len(config.block_out_channels)
    enc: Dict[str, Any] = {
        "conv_in": _conv(w, "encoder.conv_in", dtype),
        "down_blocks": [],
        "mid": {
            "resnet1": _resnet(w, "encoder.mid_block.resnets.0", dtype),
            "attn": _attnblock(w, "encoder.mid_block.attentions.0", dtype),
            "resnet2": _resnet(w, "encoder.mid_block.resnets.1", dtype),
        },
        "norm_out": _gn(w, "encoder.conv_norm_out", dtype),
        "conv_out": _conv(w, "encoder.conv_out", dtype),
    }
    for i in range(n_levels):
        blk: Dict[str, Any] = {
            "resnets": [
                _resnet(w, f"encoder.down_blocks.{i}.resnets.{j}", dtype)
                for j in range(config.layers_per_block)
            ]
        }
        ds = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if ds + ".weight" in w:
            blk["downsample"] = _conv(w, ds, dtype)
        enc["down_blocks"].append(blk)

    dec: Dict[str, Any] = {
        "conv_in": _conv(w, "decoder.conv_in", dtype),
        "mid": {
            "resnet1": _resnet(w, "decoder.mid_block.resnets.0", dtype),
            "attn": _attnblock(w, "decoder.mid_block.attentions.0", dtype),
            "resnet2": _resnet(w, "decoder.mid_block.resnets.1", dtype),
        },
        "up_blocks": [],
        "norm_out": _gn(w, "decoder.conv_norm_out", dtype),
        "conv_out": _conv(w, "decoder.conv_out", dtype),
    }
    for i in range(n_levels):
        blk = {
            "resnets": [
                _resnet(w, f"decoder.up_blocks.{i}.resnets.{j}", dtype)
                for j in range(config.layers_per_block + 1)
            ]
        }
        us = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if us + ".weight" in w:
            blk["upsample"] = _conv(w, us, dtype)
        dec["up_blocks"].append(blk)

    params: Dict[str, Any] = {"encoder": enc, "decoder": dec}
    if "quant_conv.weight" in w:
        params["quant_conv"] = _conv(w, "quant_conv", dtype)
    if "post_quant_conv.weight" in w:
        params["post_quant_conv"] = _conv(w, "post_quant_conv", dtype)
    params["bn"] = {
        "running_mean": w["bn.running_mean"].astype(np.float32)
        if "bn.running_mean" in w
        else np.zeros(config.latent_channels * 4, np.float32),
        "running_var": w["bn.running_var"].astype(np.float32)
        if "bn.running_var" in w
        else np.ones(config.latent_channels * 4, np.float32),
    }
    return params


# ---------------------------------------------------------------------------
# Text encoders (HF llama-style)
# ---------------------------------------------------------------------------


def map_decoder_weights(w: Weights, cfg: DecoderConfig, dtype=np.float32) -> Dict[str, Any]:
    """HF ``model.layers.{i}.*`` keys -> stacked decoder pytree."""
    w = dequantize_quanto(w)
    pre = "model." if any(k.startswith("model.") for k in w) else ""

    def stack(fmt: str, transpose: bool = True) -> np.ndarray:
        arrs = []
        for i in range(cfg.num_hidden_layers):
            a = w[fmt.format(i=i)]
            arrs.append(_t(a) if transpose else a)
        return np.stack(arrs).astype(dtype)

    layers: Dict[str, Any] = {
        "input_norm": stack(pre + "layers.{i}.input_layernorm.weight", False),
        "q_proj": stack(pre + "layers.{i}.self_attn.q_proj.weight"),
        "k_proj": stack(pre + "layers.{i}.self_attn.k_proj.weight"),
        "v_proj": stack(pre + "layers.{i}.self_attn.v_proj.weight"),
        "o_proj": stack(pre + "layers.{i}.self_attn.o_proj.weight"),
        "post_attn_norm": stack(pre + "layers.{i}.post_attention_layernorm.weight", False),
        "gate_proj": stack(pre + "layers.{i}.mlp.gate_proj.weight"),
        "up_proj": stack(pre + "layers.{i}.mlp.up_proj.weight"),
        "down_proj": stack(pre + "layers.{i}.mlp.down_proj.weight"),
    }
    if cfg.qk_norm:
        layers["q_norm"] = stack(pre + "layers.{i}.self_attn.q_norm.weight", False)
        layers["k_norm"] = stack(pre + "layers.{i}.self_attn.k_norm.weight", False)
    params: Dict[str, Any] = {
        "embed_tokens": w[pre + "embed_tokens.weight"].astype(dtype),
        "layers": layers,
        "final_norm": w[pre + "norm.weight"].astype(dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _t(w["lm_head.weight"]).astype(dtype)
    return params


def strip_language_model_prefix(w: Weights) -> Weights:
    """``language_model.*`` keys (Mistral3ForConditionalGeneration layout)
    -> the plain decoder layout map_decoder_weights expects."""
    pre = "language_model."
    if not any(k.startswith(pre) for k in w):
        return w
    return {k[len(pre):] if k.startswith(pre) else k: v for k, v in w.items()}


def map_pixtral_weights(w: Weights, cfg, dtype=np.float32) -> Dict[str, Any]:
    """Mistral3 VLM checkpoint (``vision_tower.*`` + ``multi_modal_projector.*``
    keys) -> the pixtral vision+projector pytree.

    Conversion rules validated elementwise vs HF PixtralVisionModel /
    Mistral3MultiModalProjector in tests/test_hf_parity.py:

      - patch conv [h, 3, p, p] OIHW -> linear [(p*p*3), h] over our
        (ph, pw, c)-flattened patches;
      - the patch merger's unfold flattens 2x2 blocks channel-major
        (c*m*m + kh*m + kw); ours is spatial-major ((kh*m + kw)*d + c) —
        input columns permute at mapping time.
    """
    vt = "vision_tower."
    mp = "multi_modal_projector."
    p = cfg.patch_size
    blocks = []
    for i in range(cfg.num_hidden_layers):
        pre = f"{vt}transformer.layers.{i}."
        blocks.append({
            "attention_norm": w[pre + "attention_norm.weight"].astype(dtype),
            "q_proj": _t(w[pre + "attention.q_proj.weight"]).astype(dtype),
            "k_proj": _t(w[pre + "attention.k_proj.weight"]).astype(dtype),
            "v_proj": _t(w[pre + "attention.v_proj.weight"]).astype(dtype),
            "o_proj": _t(w[pre + "attention.o_proj.weight"]).astype(dtype),
            "ffn_norm": w[pre + "ffn_norm.weight"].astype(dtype),
            "gate_proj": _t(w[pre + "feed_forward.gate_proj.weight"]).astype(dtype),
            "up_proj": _t(w[pre + "feed_forward.up_proj.weight"]).astype(dtype),
            "down_proj": _t(w[pre + "feed_forward.down_proj.weight"]).astype(dtype),
        })
    conv = np.transpose(w[vt + "patch_conv.weight"], (2, 3, 1, 0)).reshape(p * p * 3, -1)

    d, m = cfg.hidden_size, cfg.spatial_merge_size
    merge_hf = w[mp + "patch_merger.merging_layer.weight"]  # [d, d*m*m]
    perm = np.empty(d * m * m, np.int64)
    for c in range(d):
        for kh in range(m):
            for kw in range(m):
                perm[(kh * m + kw) * d + c] = c * m * m + kh * m + kw
    merge = np.ascontiguousarray(merge_hf[:, perm].T)  # [m*m*d, d-out]

    return {
        "patch_conv": np.ascontiguousarray(conv).astype(dtype),
        "ln_pre": w[vt + "ln_pre.weight"].astype(dtype),
        "blocks": blocks,
        "projector": {
            "norm": w[mp + "norm.weight"].astype(dtype),
            "merge": merge.astype(dtype),
            "linear_1": _t(w[mp + "linear_1.weight"]).astype(dtype),
            "linear_2": _t(w[mp + "linear_2.weight"]).astype(dtype),
        },
    }


# ---------------------------------------------------------------------------
# Qwen3.5 / Qwen3-Next hybrid (Gated DeltaNet + gated full attention)
# ---------------------------------------------------------------------------


def map_qwen35_vision_weights(w: Weights, cfg, dtype=np.float32) -> Dict[str, Any]:
    """HF Qwen3-VL vision-tower keys (``visual.*`` / ``model.visual.*``) ->
    the qwen35_vision pytree (KleinVLEmbeddingExtractor / Qwen35VLM vision
    side). Conv3d patch embed [D, C, T, P, P] flattens to our
    (t, ph, pw, c)-ordered linear kernel; the layout is validated
    elementwise vs HF Qwen3VLVisionModel in tests/test_hf_parity.py."""
    w = dequantize_quanto(w)
    pre = ""
    for cand in ("model.visual.", "visual.", ""):
        if any(k.startswith(cand + "patch_embed.") for k in w):
            pre = cand
            break

    def g(k):
        return np.asarray(w[pre + k], np.float32)

    p, t = cfg.patch_size, cfg.temporal_patch_size
    conv = np.transpose(g("patch_embed.proj.weight"), (2, 3, 4, 1, 0)).reshape(
        t * p * p * cfg.in_channels, -1
    )

    def lin(k):
        return {"kernel": g(k + ".weight").T.astype(dtype), "bias": g(k + ".bias").astype(dtype)}

    def norm(k):
        return {"scale": g(k + ".weight").astype(dtype), "bias": g(k + ".bias").astype(dtype)}

    blocks = []
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        blocks.append({
            "norm1": norm(b + "norm1"),
            "norm2": norm(b + "norm2"),
            "qkv": lin(b + "attn.qkv"),
            "proj": lin(b + "attn.proj"),
            "fc1": lin(b + "mlp.linear_fc1"),
            "fc2": lin(b + "mlp.linear_fc2"),
        })
    return {
        "patch_embed": {"kernel": conv.astype(dtype), "bias": g("patch_embed.proj.bias").astype(dtype)},
        "pos_embed": g("pos_embed.weight").astype(dtype),
        "blocks": blocks,
        "merger": {
            "norm": norm("merger.norm"),
            "fc1": lin("merger.linear_fc1"),
            "fc2": lin("merger.linear_fc2"),
        },
    }


def map_qwen35_weights(w: Weights, cfg, dtype=np.float32) -> Dict[str, Any]:
    """HF qwen3_next-layout keys -> the qwen35 hybrid pytree.

    Three checkpoint conventions are normalized here (validated elementwise
    against transformers' torch implementation in tests/test_hf_parity.py):

      - ``in_proj_qkvz`` / ``in_proj_ba`` pack per KEY-HEAD groups
        [q | k | v*rep | z*rep] / [b*rep | a*rep]; we split into separate
        q/k/v (conv path), z, b, a projections.
      - ``conv1d.weight`` [conv_dim, 1, K] -> our [K, conv_dim] kernel.
      - Qwen3NextRMSNorm weights are ZERO-CENTERED (runtime applies
        ``x * (1 + w)``, init zeros); we fold the +1 at load so runtime
        stays the standard ``x * w`` (the DeltaNet's gated ``norm.weight``
        is ones-init standard and passes through unchanged).
    """
    w = dequantize_quanto(w)
    pre = ""
    # text-only: model.* ; VL checkpoints nest: model.language_model.*
    for cand in ("model.language_model.", "language_model.", "model."):
        if any(k.startswith(cand + "layers.") for k in w):
            pre = cand
            break

    hk, hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    rep = hv // hk
    blk = 2 * dk + 2 * rep * dv

    def t(a):
        return _t(a).astype(dtype)

    def centered(a):
        return (1.0 + a).astype(dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        lpre = f"{pre}layers.{i}."
        lp: Dict[str, Any] = {
            "input_norm": centered(w[lpre + "input_layernorm.weight"]),
            "post_attn_norm": centered(w[lpre + "post_attention_layernorm.weight"]),
            "gate_proj": t(w[lpre + "mlp.gate_proj.weight"]),
            "up_proj": t(w[lpre + "mlp.up_proj.weight"]),
            "down_proj": t(w[lpre + "mlp.down_proj.weight"]),
        }
        if cfg.is_linear_layer(i):
            apre = lpre + "linear_attn."
            qkvz = w[apre + "in_proj_qkvz.weight"]
            q_rows, k_rows, v_rows, z_rows = [], [], [], []
            for g in range(hk):
                base = g * blk
                q_rows.append(qkvz[base : base + dk])
                k_rows.append(qkvz[base + dk : base + 2 * dk])
                v_rows.append(qkvz[base + 2 * dk : base + 2 * dk + rep * dv])
                z_rows.append(qkvz[base + 2 * dk + rep * dv : base + blk])
            ba = w[apre + "in_proj_ba.weight"]
            b_rows, a_rows = [], []
            for g in range(hk):
                base = g * 2 * rep
                b_rows.append(ba[base : base + rep])
                a_rows.append(ba[base + rep : base + 2 * rep])
            lp["linear_attn"] = {
                "in_proj_qkv": np.concatenate(q_rows + k_rows + v_rows).T.astype(dtype),
                "in_proj_z": np.concatenate(z_rows).T.astype(dtype),
                "in_proj_b": np.concatenate(b_rows).T.astype(dtype),
                "in_proj_a": np.concatenate(a_rows).T.astype(dtype),
                "out_proj": t(w[apre + "out_proj.weight"]),
                "conv_kernel": np.transpose(w[apre + "conv1d.weight"][:, 0, :]).astype(dtype),
                "norm_weight": w[apre + "norm.weight"].astype(dtype),  # gated norm: standard
                "a_log": w[apre + "A_log"].astype(np.float32),
                "dt_bias": w[apre + "dt_bias"].astype(np.float32),
            }
        else:
            apre = lpre + "self_attn."
            lp["self_attn"] = {
                "q_proj": t(w[apre + "q_proj.weight"]),
                "k_proj": t(w[apre + "k_proj.weight"]),
                "v_proj": t(w[apre + "v_proj.weight"]),
                "o_proj": t(w[apre + "o_proj.weight"]),
                "q_norm": centered(w[apre + "q_norm.weight"]),
                "k_norm": centered(w[apre + "k_norm.weight"]),
            }
        layers.append(lp)

    return {
        "embed_tokens": w[pre + "embed_tokens.weight"].astype(dtype),
        "layers": layers,
        "final_norm": centered(w[pre + "norm.weight"]),
    }
