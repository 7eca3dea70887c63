"""Inference-side LoRA loading: safetensors dialects -> stacked LoRA pytrees.

Capability parity with ``Sources/Flux2Core/LoRA/LoRALoader.swift`` /
``LoRAAdapter.swift`` / ``LoRAConfig.swift``:
  - Both key dialects: Diffusers (``transformer.transformer_blocks.N...
    .lora_A.weight`` / ``base_model.model...``) and BFL native
    (``double_blocks.N.img_attn.qkv`` with fused-QKV LoRA B splitting,
    LoRALoader.swift:218-251).
  - alpha/rank -> scale resolution (scale = alpha/rank * user_scale,
    :75-94) from file metadata or a sidecar config.
  - Target-model detection by block counts (:422-460).
  - Multi-LoRA registry with per-layer pair lookup and additive merge.
  - Optional JSON config with scheduler overrides (custom sigmas / steps /
    guidance for Turbo-style LoRAs) and activation keyword prompt prefixing.

Output representation matches ``flux2_tpu.training.lora``: one stacked pair
per (group, leaf): a [L, in, r], b [L, r, out]; layers the file does not
cover hold zeros in ``b`` (identity).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from flux2_tpu.models.flux2.config import Flux2TransformerConfig

Weights = Dict[str, np.ndarray]


@dataclasses.dataclass
class LoRASchedulerOverrides:
    """Turbo-LoRA style overrides (LoRAConfig.swift:7-32)."""

    custom_sigmas: Optional[List[float]] = None
    num_steps: Optional[int] = None
    guidance: Optional[float] = None


@dataclasses.dataclass
class LoadedLoRA:
    pairs: Dict[Tuple[str, str], Dict[int, Tuple[np.ndarray, np.ndarray]]]
    rank: int
    alpha: float
    scale: float  # alpha / rank * user_scale
    target_layers: int
    overrides: LoRASchedulerOverrides = dataclasses.field(default_factory=LoRASchedulerOverrides)
    activation_keyword: Optional[str] = None

    def apply_prompt_prefix(self, prompt: str) -> str:
        """Prefix the activation keyword when absent (LoRAAdapter.swift:189-199)."""
        kw = self.activation_keyword
        if kw and kw.lower() not in prompt.lower():
            return f"{kw}, {prompt}"
        return prompt


# canonical (group, leaf) targets by normalized layer suffix
_DIFFUSERS_LEAF = {
    "attn.to_q": ("double_blocks", "to_q"),
    "attn.to_k": ("double_blocks", "to_k"),
    "attn.to_v": ("double_blocks", "to_v"),
    "attn.to_out.0": ("double_blocks", "to_out"),
    "attn.to_out": ("double_blocks", "to_out"),
    "attn.add_q_proj": ("double_blocks", "add_q"),
    "attn.add_k_proj": ("double_blocks", "add_k"),
    "attn.add_v_proj": ("double_blocks", "add_v"),
    "attn.to_add_out": ("double_blocks", "add_out"),
    "ff.linear_in": ("double_blocks", "ff_in"),
    "ff.linear_out": ("double_blocks", "ff_out"),
    "ff_context.linear_in": ("double_blocks", "ff_ctx_in"),
    "ff_context.linear_out": ("double_blocks", "ff_ctx_out"),
}


def load_lora_file(
    path: str,
    config: Flux2TransformerConfig,
    user_scale: float = 1.0,
    config_path: Optional[str] = None,
) -> LoadedLoRA:
    from flux2_tpu.io import safetensors_io

    weights = safetensors_io.load_file(path)
    metadata = safetensors_io.load_metadata(path)
    lora = parse_lora_weights(weights, config)

    rank = lora["rank"]
    alpha = float(metadata.get("alpha", metadata.get("lora_alpha", rank)))
    overrides = LoRASchedulerOverrides()
    keyword = metadata.get("activation_keyword") or metadata.get("trigger")

    # Sidecar JSON config (LoRAConfig.swift:76-93)
    cfg_file = config_path or os.path.splitext(path)[0] + ".json"
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            cfg = json.load(f)
        alpha = float(cfg.get("alpha", alpha))
        keyword = cfg.get("activation_keyword", keyword)
        sched = cfg.get("scheduler", cfg)
        overrides = LoRASchedulerOverrides(
            custom_sigmas=sched.get("custom_sigmas"),
            num_steps=sched.get("num_steps"),
            guidance=sched.get("guidance"),
        )

    return LoadedLoRA(
        pairs=lora["pairs"],
        rank=rank,
        alpha=alpha,
        scale=alpha / rank * user_scale,
        target_layers=lora["target_layers"],
        overrides=overrides,
        activation_keyword=keyword,
    )


def parse_lora_weights(weights: Weights, config: Flux2TransformerConfig) -> dict:
    """Group lora_A/lora_B keys into canonical (group, leaf, layer) pairs."""
    inner = config.inner_dim
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in weights.items():
        if key.endswith(".lora_A.weight") or key.endswith(".lora_down.weight"):
            base, part = re.sub(r"\.(lora_A|lora_down)\.weight$", "", key), "a"
        elif key.endswith(".lora_B.weight") or key.endswith(".lora_up.weight"):
            base, part = re.sub(r"\.(lora_B|lora_up)\.weight$", "", key), "b"
        else:
            continue
        base = re.sub(r"^(base_model\.model\.|transformer\.|diffusion_model\.)", "", base)
        groups.setdefault(base, {})[part] = v

    pairs: Dict[Tuple[str, str], Dict[int, Tuple[np.ndarray, np.ndarray]]] = {}
    rank = 0
    max_layer = -1

    def put(group: str, leaf: str, idx: int, a: np.ndarray, b: np.ndarray):
        # torch convention: lora_A [r, in], lora_B [out, r]
        # ours: a [in, r], b [r, out]
        pairs.setdefault((group, leaf), {})[idx] = (
            np.ascontiguousarray(a.T),
            np.ascontiguousarray(b.T),
        )

    for base, ab in groups.items():
        if "a" not in ab or "b" not in ab:
            continue
        a, b = ab["a"], ab["b"]
        rank = max(rank, a.shape[0])

        m = re.match(r"transformer_blocks\.(\d+)\.(.+)", base)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            max_layer = max(max_layer, idx)
            tgt = _DIFFUSERS_LEAF.get(rest)
            if tgt:
                put(tgt[0], tgt[1], idx, a, b)
            continue
        m = re.match(r"single_transformer_blocks\.(\d+)\.(.+)", base)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            max_layer = max(max_layer, idx)
            if rest in ("attn.to_qkv_mlp_proj",):
                # fused projection LoRA: split B's out axis into q/k/v/gate/up
                mlp = config.mlp_hidden_dim
                b_out = b  # [out_total, r]
                sections = np.split(b_out, [inner, 2 * inner, 3 * inner, 3 * inner + mlp], axis=0)
                for leaf, bseg in zip(("to_q", "to_k", "to_v", "mlp_gate", "mlp_up"), sections):
                    put("single_blocks", leaf, idx, a, bseg)
            elif rest in ("attn.to_out", "attn.to_out.0"):
                # fused output: split A's in axis into attn/mlp halves
                a_in = a  # [r, in_total]
                a_attn, a_mlp = a_in[:, :inner], a_in[:, inner:]
                put("single_blocks", "out_attn", idx, a_attn, b)
                put("single_blocks", "out_mlp", idx, a_mlp, b)
            continue
        m = re.match(r"double_blocks\.(\d+)\.(.+)", base)
        if m:
            # BFL native LoRA
            idx, rest = int(m.group(1)), m.group(2)
            max_layer = max(max_layer, idx)
            if rest in ("img_attn.qkv", "txt_attn.qkv"):
                # fused QKV: B [3*inner, r] splits; A shared (LoRALoader:218-251)
                bq, bk, bv = np.split(b, 3, axis=0)
                leaves = ("to_q", "to_k", "to_v") if "img" in rest else ("add_q", "add_k", "add_v")
                for leaf, bseg in zip(leaves, (bq, bk, bv)):
                    put("double_blocks", leaf, idx, a, bseg)
            elif rest == "img_attn.proj":
                put("double_blocks", "to_out", idx, a, b)
            elif rest == "txt_attn.proj":
                put("double_blocks", "add_out", idx, a, b)
            elif rest == "img_mlp.0":
                put("double_blocks", "ff_in", idx, a, b)
            elif rest == "img_mlp.2":
                put("double_blocks", "ff_out", idx, a, b)
            elif rest == "txt_mlp.0":
                put("double_blocks", "ff_ctx_in", idx, a, b)
            elif rest == "txt_mlp.2":
                put("double_blocks", "ff_ctx_out", idx, a, b)
            continue
        m = re.match(r"single_blocks\.(\d+)\.(.+)", base)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            max_layer = max(max_layer, idx)
            mlp = config.mlp_hidden_dim
            if rest == "linear1":
                sections = np.split(b, [inner, 2 * inner, 3 * inner, 3 * inner + mlp], axis=0)
                for leaf, bseg in zip(("to_q", "to_k", "to_v", "mlp_gate", "mlp_up"), sections):
                    put("single_blocks", leaf, idx, a, bseg)
            elif rest == "linear2":
                a_attn, a_mlp = a[:, :inner], a[:, inner:]
                put("single_blocks", "out_attn", idx, a_attn, b)
                put("single_blocks", "out_mlp", idx, a_mlp, b)
            continue

    return {"pairs": pairs, "rank": rank, "target_layers": max_layer + 1}


def detect_target_model(pairs: dict, config_candidates: Sequence[Tuple[str, Flux2TransformerConfig]]) -> Optional[str]:
    """Match the LoRA's layer counts against known model configs
    (LoRALoader.swift:422-460)."""
    max_double = -1
    max_single = -1
    for (group, _leaf), layers in pairs.items():
        hi = max(layers) if layers else -1
        if group == "double_blocks":
            max_double = max(max_double, hi)
        else:
            max_single = max(max_single, hi)
    for name, cfg in config_candidates:
        if max_double < cfg.num_layers and max_single < cfg.num_single_layers:
            return name
    return None


def to_stacked_lora(
    loaded: LoadedLoRA, config: Flux2TransformerConfig, dtype=np.float32
) -> Dict[str, Any]:
    """Per-layer pairs -> stacked lora pytree {group: {leaf: {a, b}}}.

    Layers not present in the file get zero ``b`` (identity contribution).
    """
    import jax.numpy as jnp

    out: Dict[str, Any] = {}
    for (group, leaf), layers in loaded.pairs.items():
        n = config.num_layers if group == "double_blocks" else config.num_single_layers
        sample_a, sample_b = next(iter(layers.values()))
        r = sample_a.shape[1]
        a = np.zeros((n, sample_a.shape[0], r), dtype)
        b = np.zeros((n, r, sample_b.shape[1]), dtype)
        for idx, (la, lb) in layers.items():
            if idx < n:
                a[idx], b[idx] = la, lb
        out.setdefault(group, {})[leaf] = {"a": jnp.asarray(a), "b": jnp.asarray(b)}
    return out


def merge_loras_into_params(
    params: Any,
    loaded_loras: Sequence[LoadedLoRA],
    config: Flux2TransformerConfig,
) -> Any:
    """Merge multiple LoRAs additively: W += Σ scale_i * (a_i @ b_i)."""
    from flux2_tpu.training.lora import merge_into_params

    merged = params
    for lora in loaded_loras:
        stacked = to_stacked_lora(lora, config)
        merged = merge_into_params(merged, stacked, lora.scale)
    return merged


def merge_runtime_semantics(
    loaded_loras: Sequence[LoadedLoRA],
) -> Tuple[LoRASchedulerOverrides, List[str], List[str]]:
    """Combine scheduler overrides + activation keywords across LoRAs.

    Per override field, last LoRA wins; a conflict (two LoRAs setting the
    same field to different values) produces a warning string, matching the
    reference's multi-LoRA override behavior
    (Flux2Pipeline.swift:1879-1908). Returns (overrides, keywords, warnings).
    """
    merged = LoRASchedulerOverrides()
    keywords: List[str] = []
    warnings: List[str] = []
    for lora in loaded_loras:
        ov = lora.overrides
        for field in ("custom_sigmas", "num_steps", "guidance"):
            new = getattr(ov, field)
            if new is None:
                continue
            old = getattr(merged, field)
            if old is not None and old != new:
                warnings.append(
                    f"multiple LoRAs override {field} ({old!r} -> {new!r}); using the last"
                )
            setattr(merged, field, new)
        kw = lora.activation_keyword
        if kw and kw not in keywords:
            keywords.append(kw)
    return merged, keywords, warnings
