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
from typing import Dict, List, Optional, Tuple

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

VAE_REPO = RepoSpec("black-forest-labs/FLUX.2-klein-4B", "vae", approx_size_gb=0.4)
VAE_SMALL_DECODER_REPO = RepoSpec("black-forest-labs/FLUX.2-small-decoder", None, approx_size_gb=0.3)

TEXT_ENCODER_REPOS: Dict[str, RepoSpec] = {
    "mistral-small-3.2": RepoSpec("mistralai/Mistral-Small-3.2-24B-Instruct-2506", gated=True, approx_size_gb=48),
    "qwen3-4b": RepoSpec("Qwen/Qwen3-4B", approx_size_gb=8),
    "qwen3-8b": RepoSpec("Qwen/Qwen3-8B", approx_size_gb=16),
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


def recommended_preset(ram_gb: float) -> str:
    """Hardware -> quantization preset recommendation
    (ModelRegistry.swift:525-549 analogue, keyed on HBM instead of RAM)."""
    if ram_gb >= 64:
        return "bf16"
    if ram_gb >= 32:
        return "qint8"
    return "int4"
