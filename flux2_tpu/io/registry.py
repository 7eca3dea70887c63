"""Model registry + downloader: HF repos, local path resolution, gating.

Capability parity with ``Sources/Flux2Core/Configuration/ModelRegistry.swift``
and ``Loading/ModelDownloader.swift``: per-variant HF repos/subfolders,
gating flags, models-dir override (env ``FLUX2_MODELS_DIR``), multi-location
path resolution (explicit dir -> configured dir -> HF cache), download via
``huggingface_hub`` gated on availability (this build also runs in
zero-egress environments), and completeness verification before load.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Tuple

from flux2_tpu.models.flux2.config import Flux2Model

DEFAULT_MODELS_DIR = os.path.expanduser("~/.cache/flux2_tpu/models")


@dataclasses.dataclass(frozen=True)
class RepoSpec:
    repo_id: str
    subfolder: Optional[str] = None
    gated: bool = False
    approx_size_gb: float = 0.0


TRANSFORMER_REPOS: Dict[Flux2Model, RepoSpec] = {
    Flux2Model.DEV: RepoSpec("black-forest-labs/FLUX.2-dev", "transformer", gated=True, approx_size_gb=64),
    Flux2Model.KLEIN_4B: RepoSpec("black-forest-labs/FLUX.2-klein-4B", "transformer", approx_size_gb=8),
    Flux2Model.KLEIN_4B_BASE: RepoSpec("black-forest-labs/FLUX.2-klein-base-4B", "transformer", approx_size_gb=8),
    Flux2Model.KLEIN_9B: RepoSpec("black-forest-labs/FLUX.2-klein-9B", "transformer", approx_size_gb=18),
    Flux2Model.KLEIN_9B_BASE: RepoSpec("black-forest-labs/FLUX.2-klein-base-9B", "transformer", approx_size_gb=18),
    Flux2Model.KLEIN_9B_KV: RepoSpec("black-forest-labs/FLUX.2-klein-9b-kv", "transformer", approx_size_gb=18),
}

# Pre-quantized transformer checkpoints published as separate repos
# (ModelRegistry.swift:34-120). Formats without an entry fall back to the
# bf16 repo + on-the-fly quantization — see variant_for_quantization().
PREQUANTIZED_TRANSFORMER_REPOS: Dict[Tuple[Flux2Model, str], RepoSpec] = {
    (Flux2Model.DEV, "qint8"): RepoSpec(
        "VincentGOURBIN/flux_qint_8bit", "flux-2-dev/transformer/qint8", approx_size_gb=32
    ),
    (Flux2Model.KLEIN_4B, "qint8"): RepoSpec("aydin99/FLUX.2-klein-4B-int8", None, approx_size_gb=4),
}


def variant_for_quantization(model: Flux2Model, fmt: str) -> Tuple[RepoSpec, bool]:
    """Resolve the repo to load for a (model, quantization) pair.

    Returns ``(spec, quantize_on_the_fly)``: when a pre-quantized repo
    exists for the format it is used directly; otherwise the bf16 repo is
    loaded and quantized after mapping — the reference's
    ``ModelRegistry.variant(for:quantization:)`` fallback semantics
    (ModelRegistry.swift:212-233). Base models only ship bf16.
    """
    if fmt == "bf16":
        return TRANSFORMER_REPOS[model], False
    spec = PREQUANTIZED_TRANSFORMER_REPOS.get((model, fmt))
    if spec is not None:
        return spec, False
    return TRANSFORMER_REPOS[model], True


def training_variant(model: Flux2Model) -> Flux2Model:
    """LoRA training MUST use the base (non-distilled) sibling
    (ModelRegistry.swift:238-250). Dev is already non-distilled."""
    return {
        Flux2Model.KLEIN_4B: Flux2Model.KLEIN_4B_BASE,
        Flux2Model.KLEIN_4B_BASE: Flux2Model.KLEIN_4B_BASE,
        Flux2Model.KLEIN_9B: Flux2Model.KLEIN_9B_BASE,
        Flux2Model.KLEIN_9B_BASE: Flux2Model.KLEIN_9B_BASE,
        Flux2Model.KLEIN_9B_KV: Flux2Model.KLEIN_9B_BASE,
        Flux2Model.DEV: Flux2Model.DEV,
    }[model]


def distilled_sibling(model: Flux2Model) -> Flux2Model:
    """Validation images during training use the distilled sibling
    (SimpleLoRATrainer.swift:1746-2006); inverse of training_variant."""
    return {
        Flux2Model.KLEIN_4B_BASE: Flux2Model.KLEIN_4B,
        Flux2Model.KLEIN_9B_BASE: Flux2Model.KLEIN_9B,
    }.get(model, model)


VAE_REPO = RepoSpec("black-forest-labs/FLUX.2-klein-4B", "vae", approx_size_gb=0.4)
VAE_SMALL_DECODER_REPO = RepoSpec("black-forest-labs/FLUX.2-small-decoder", None, approx_size_gb=0.3)

TEXT_ENCODER_REPOS: Dict[str, RepoSpec] = {
    # Dev conditioning + Pixtral vision tower + VLM chat (one checkpoint).
    "mistral-small-3.2": RepoSpec("mistralai/Mistral-Small-3.2-24B-Instruct-2506", gated=True, approx_size_gb=48),
    # Klein conditioning.
    "qwen3-4b": RepoSpec("Qwen/Qwen3-4B", approx_size_gb=8),
    "qwen3-8b": RepoSpec("Qwen/Qwen3-8B", approx_size_gb=16),
    # Experimental Klein-VL conditioning (TextEncoderModelRegistry.swift:245-248).
    "qwen3-vl-4b": RepoSpec("Qwen/Qwen3-VL-4B-Instruct", approx_size_gb=9),
    "qwen3-vl-8b": RepoSpec("Qwen/Qwen3-VL-8B-Instruct", approx_size_gb=17),
    # Qwen3.5 hybrid VLM (prompt building / LoRA scoring;
    # TextEncoderModelRegistry.swift:301-302).
    "qwen35-vlm": RepoSpec("Qwen/Qwen3.5-4B", approx_size_gb=9),
}

# Quantized encoder-variant repos the reference registry can name
# (TextEncoderModelRegistry.swift:76-82,161-164,245-248,301-302). On TPU the
# runtime path quantizes on the fly (ops/quant), but quanto-quantized
# checkpoints from these repos load through dequantize_quanto too.
ENCODER_VARIANT_REPOS: Dict[str, Dict[str, str]] = {
    "mistral-small-3.2": {
        "bf16": "mistralai/Mistral-Small-3.2-24B-Instruct-2506",
        "8bit": "lmstudio-community/Mistral-Small-3.2-24B-Instruct-2506-MLX-8bit",
        "6bit": "lmstudio-community/Mistral-Small-3.2-24B-Instruct-2506-MLX-6bit",
        "4bit": "lmstudio-community/Mistral-Small-3.2-24B-Instruct-2506-MLX-4bit",
    },
    "qwen3-4b": {"bf16": "Qwen/Qwen3-4B", "8bit": "lmstudio-community/Qwen3-4B-MLX-8bit", "4bit": "lmstudio-community/Qwen3-4B-MLX-4bit"},
    "qwen3-8b": {"bf16": "Qwen/Qwen3-8B", "8bit": "lmstudio-community/Qwen3-8B-MLX-8bit", "4bit": "lmstudio-community/Qwen3-8B-MLX-4bit"},
    "qwen3-vl-4b": {"bf16": "Qwen/Qwen3-VL-4B-Instruct", "8bit": "lmstudio-community/Qwen3-VL-4B-Instruct-MLX-8bit", "4bit": "lmstudio-community/Qwen3-VL-4B-Instruct-MLX-4bit"},
    "qwen3-vl-8b": {"bf16": "Qwen/Qwen3-VL-8B-Instruct", "8bit": "lmstudio-community/Qwen3-VL-8B-Instruct-MLX-8bit", "4bit": "lmstudio-community/Qwen3-VL-8B-Instruct-MLX-4bit"},
    "qwen35-vlm": {"bf16": "Qwen/Qwen3.5-4B", "8bit": "mlx-community/Qwen3.5-4B-MLX-8bit", "4bit": "mlx-community/Qwen3.5-4B-MLX-4bit"},
}

# Encoder selection per model family (Flux2Config jointAttentionDim mapping).
ENCODER_FOR_MODEL: Dict[Flux2Model, str] = {
    Flux2Model.DEV: "mistral-small-3.2",
    Flux2Model.KLEIN_4B: "qwen3-4b",
    Flux2Model.KLEIN_4B_BASE: "qwen3-4b",
    Flux2Model.KLEIN_9B: "qwen3-8b",
    Flux2Model.KLEIN_9B_BASE: "qwen3-8b",
    Flux2Model.KLEIN_9B_KV: "qwen3-8b",
}


def models_dir() -> str:
    return os.environ.get("FLUX2_MODELS_DIR", DEFAULT_MODELS_DIR)


def local_model_path(spec: RepoSpec, base_dir: Optional[str] = None) -> str:
    base = base_dir or models_dir()
    path = os.path.join(base, *spec.repo_id.split("/"))
    return os.path.join(path, spec.subfolder) if spec.subfolder else path


def find_model_path(spec: RepoSpec, explicit_dir: Optional[str] = None) -> Optional[str]:
    """Resolve a model directory: explicit dir -> configured dir -> HF cache."""
    candidates = []
    if explicit_dir:
        candidates.append(explicit_dir)
    candidates.append(local_model_path(spec))
    # legacy/HF cache layout
    hf_home = os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    snap_base = os.path.join(hf_home, "hub", "models--" + spec.repo_id.replace("/", "--"), "snapshots")
    if os.path.isdir(snap_base):
        for snap in sorted(os.listdir(snap_base)):
            p = os.path.join(snap_base, snap)
            candidates.append(os.path.join(p, spec.subfolder) if spec.subfolder else p)
    for c in candidates:
        if c and os.path.isdir(c) and _has_weights(c):
            return c
    return None


def _has_weights(path: str) -> bool:
    try:
        return any(f.endswith(".safetensors") for f in os.listdir(path))
    except OSError:
        return False


def verify_completeness(path: str) -> Tuple[bool, List[str]]:
    """Check every safetensors file's payload covers its header offsets."""
    from flux2_tpu.io import safetensors_io

    bad = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".safetensors"):
            if not safetensors_io.payload_is_complete(os.path.join(path, f)):
                bad.append(f)
    return (not bad, bad)


def download(spec: RepoSpec, token: Optional[str] = None, base_dir: Optional[str] = None) -> str:
    """Download a model snapshot via huggingface_hub (network required)."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub not available") from e
    target = local_model_path(spec, base_dir)
    os.makedirs(target, exist_ok=True)
    patterns = [f"{spec.subfolder}/*"] if spec.subfolder else None
    snapshot_download(
        spec.repo_id,
        local_dir=os.path.dirname(target) if spec.subfolder else target,
        allow_patterns=patterns,
        token=token or os.environ.get("HF_TOKEN"),
    )
    return target


# Quantization presets: (text-encoder quant, transformer quant) pairs with
# estimated total working memory — QuantizationConfig.swift:110-142.
QUANT_PRESETS: Dict[str, Dict[str, Any]] = {
    "high-quality": {"text_encoder": "bf16", "transformer": "bf16", "approx_gb": 90},
    "balanced": {"text_encoder": "8bit", "transformer": "qint8", "approx_gb": 57},
    "memory-efficient": {"text_encoder": "4bit", "transformer": "qint8", "approx_gb": 47},
    "minimal": {"text_encoder": "4bit", "transformer": "qint8", "approx_gb": 47},
    "ultra-minimal": {"text_encoder": "4bit", "transformer": "int4", "approx_gb": 30},
}


def recommended_preset(ram_gb: float) -> str:
    """Memory budget (HBM-per-chip x chips on TPU) -> preset name, matching
    the reference's RAM thresholds (ModelRegistry.swift:525-549)."""
    if ram_gb >= 96:
        return "high-quality"
    if ram_gb >= 64:
        return "balanced"
    if ram_gb >= 48:
        return "memory-efficient"
    if ram_gb >= 32:
        return "minimal"
    return "ultra-minimal"


# Per-model minimum memory by transformer format, GB (the reference's
# quantization-benchmark peak-memory table — BASELINE.md "Peak memory").
MODEL_MIN_MEMORY_GB: Dict[Flux2Model, Dict[str, float]] = {
    Flux2Model.DEV: {"bf16": 72, "qint8": 69, "int4": 28},
    Flux2Model.KLEIN_4B: {"bf16": 18, "qint8": 15, "int4": 13},
    Flux2Model.KLEIN_4B_BASE: {"bf16": 18, "qint8": 15, "int4": 13},
    Flux2Model.KLEIN_9B: {"bf16": 28, "qint8": 20, "int4": 16},
    Flux2Model.KLEIN_9B_BASE: {"bf16": 28, "qint8": 20, "int4": 16},
    Flux2Model.KLEIN_9B_KV: {"bf16": 29, "qint8": 21, "int4": 17},
}


def recommended_format_for_model(model: Flux2Model, ram_gb: float) -> str:
    """Pick the highest-fidelity transformer format that fits the budget."""
    table = MODEL_MIN_MEMORY_GB[model]
    for fmt in ("bf16", "qint8", "int4"):
        if ram_gb >= table[fmt]:
            return fmt
    return "int4"
