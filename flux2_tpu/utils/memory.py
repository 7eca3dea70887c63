"""Device-memory telemetry and feasibility checks.

Capability parity with ``Utils/MemoryManager.swift`` +
``Configuration/MemoryConfig.swift``: memory stats (here: per-device HBM via
``jax.Device.memory_stats``), phase feasibility pre-checks with actionable
suggestions, and a profile recommendation. The reference's GPU cache-limit
policies (RAM-percentage heuristics, per-phase cache limits) have no XLA
analogue — HBM is managed by the runtime — so this module keeps the
*decision* surface (can this model/quantization/resolution fit?) and drops
the knob-twiddling.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax

from flux2_tpu.models.flux2.config import Flux2Model

BYTES_PER_PARAM = {"bf16": 2.0, "qint8": 1.06, "int4": 0.56, "mxfp8": 1.12, "mxfp4": 0.62, "nvfp4": 0.56, "nf4": 0.56}

APPROX_PARAMS = {
    Flux2Model.DEV: 32e9,
    Flux2Model.KLEIN_9B: 9e9,
    Flux2Model.KLEIN_9B_BASE: 9e9,
    Flux2Model.KLEIN_9B_KV: 9e9,
    Flux2Model.KLEIN_4B: 4e9,
    Flux2Model.KLEIN_4B_BASE: 4e9,
}


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def total_hbm_bytes() -> int:
    total = 0
    for dev in jax.devices():
        limit = device_memory_stats(dev)["bytes_limit"]
        total += limit if limit else 16 * 1024**3  # v5e default
    return total


@dataclasses.dataclass
class FeasibilityReport:
    feasible: bool
    required_gb: float
    available_gb: float
    suggestions: List[str]


def estimate_generation_bytes(
    model: Flux2Model,
    quantization: str = "bf16",
    height: int = 1024,
    width: int = 1024,
    num_reference_images: int = 0,
) -> float:
    """Rough transformer + activations + VAE estimate for one generation."""
    params = APPROX_PARAMS[model] * BYTES_PER_PARAM.get(quantization, 2.0)
    cfg = model.transformer_config
    seq = 512 + (height // 16) * (width // 16) * (1 + num_reference_images)
    # live activations: a few sequence-sized buffers at inner_dim + attention workspace
    acts = 12 * seq * cfg.inner_dim * 2
    vae = 2e9  # decode workspace at 1MP
    return params + acts + vae


def check_feasibility(
    model: Flux2Model,
    quantization: str = "bf16",
    height: int = 1024,
    width: int = 1024,
    num_reference_images: int = 0,
    hbm_bytes: Optional[int] = None,
) -> FeasibilityReport:
    """Pre-check with actionable suggestions (MemoryManager.swift:48-77)."""
    required = estimate_generation_bytes(model, quantization, height, width, num_reference_images)
    available = hbm_bytes if hbm_bytes is not None else total_hbm_bytes()
    suggestions: List[str] = []
    if required > available:
        if quantization == "bf16":
            suggestions.append("use --quantization qint8 (-47%) or int4 (-72%)")
        if height * width > 1024 * 1024:
            suggestions.append("reduce resolution (activation memory scales with tokens)")
        if num_reference_images > 1:
            suggestions.append("fewer reference images, or klein-9b-kv (caches reference K/V)")
        suggestions.append("shard over more chips: pipeline.shard(make_mesh(tp=N))")
    return FeasibilityReport(
        feasible=required <= available,
        required_gb=required / 1024**3,
        available_gb=available / 1024**3,
        suggestions=suggestions,
    )


def recommended_quantization(model: Flux2Model, hbm_bytes: Optional[int] = None) -> str:
    """Largest format that fits (ModelRegistry.swift:525-549 analogue)."""
    for fmt in ("bf16", "qint8", "int4"):
        if check_feasibility(model, fmt, hbm_bytes=hbm_bytes).feasible:
            return fmt
    return "int4"


# ---------------------------------------------------------------------------
# Memory profiles (MemoryConfig.swift:16-272 / MemoryOptimizationConfig
# analogue). The reference's knobs are Metal cache limits and intra-forward
# eval() segmentation; the TPU-native levers with real effect are remat
# policy, VAE decode tiling, and checkpoint-latent retention — profiles map
# onto those.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MemoryProfile:
    """Named bundle of the TPU memory/speed trade-off knobs."""

    name: str
    remat: "bool | str"  # transformer remat policy (False / 'dots' / 'block')
    vae_tile_threshold_px: int  # tile the VAE decode above this edge length
    max_checkpoint_latents: int  # cap on retained every-Nth checkpoint latents

    @staticmethod
    def named(name: str) -> "MemoryProfile":
        return MEMORY_PROFILES[name]


MEMORY_PROFILES: Dict[str, MemoryProfile] = {
    # speed-first: no recompute, decode in one shot up to 2K
    "performance": MemoryProfile("performance", False, 2048, 32),
    # default: keep matmul outputs, recompute the rest
    "balanced": MemoryProfile("balanced", "dots", 2048, 16),
    # memory-first: full per-block recompute + tiled decode at 1K+
    "conservative": MemoryProfile("conservative", "block", 1024, 4),
}


def auto_profile(
    model: Flux2Model, quantization: str = "bf16", hbm_bytes: Optional[int] = None
) -> MemoryProfile:
    """RAM-based recommendation (MemoryConfig.swift:143-156 analogue):
    pick by headroom of the estimated working set vs device HBM."""
    required = estimate_generation_bytes(model, quantization)
    available = hbm_bytes if hbm_bytes is not None else total_hbm_bytes()
    ratio = required / max(available, 1)
    if ratio < 0.5:
        return MEMORY_PROFILES["performance"]
    if ratio < 0.8:
        return MEMORY_PROFILES["balanced"]
    return MEMORY_PROFILES["conservative"]


# ---------------------------------------------------------------------------
# Telemetry (MemoryManager.swift:106-140 analogue): per-phase HBM snapshots
# with peak tracking, reportable after a generation/training run.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MemorySnapshot:
    tag: str
    bytes_in_use: int
    peak_bytes_in_use: int
    bytes_limit: int


class MemoryTelemetry:
    """Collects HBM snapshots at phase boundaries; zero-cost when disabled."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.snapshots: List[MemorySnapshot] = []

    def snapshot(self, tag: str) -> Optional[MemorySnapshot]:
        if not self.enabled:
            return None
        s = device_memory_stats()
        snap = MemorySnapshot(tag, s["bytes_in_use"], s["peak_bytes_in_use"], s["bytes_limit"])
        self.snapshots.append(snap)
        return snap

    @property
    def peak_bytes(self) -> int:
        return max((s.peak_bytes_in_use for s in self.snapshots), default=0)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        gb = 1024**3
        return {
            s.tag: {
                "in_use_gb": round(s.bytes_in_use / gb, 3),
                "peak_gb": round(s.peak_bytes_in_use / gb, 3),
            }
            for s in self.snapshots
        }

    def report(self) -> str:
        lines = [f"{'phase':<20} {'in use':>10} {'peak':>10}"]
        gb = 1024**3
        for s in self.snapshots:
            lines.append(
                f"{s.tag:<20} {s.bytes_in_use / gb:>9.2f}G {s.peak_bytes_in_use / gb:>9.2f}G"
            )
        if self.snapshots and self.snapshots[-1].bytes_limit:
            lines.append(f"{'HBM limit':<20} {'':>10} {self.snapshots[-1].bytes_limit / gb:>9.2f}G")
        return "\n".join(lines)


_shared_telemetry: Optional[MemoryTelemetry] = None


def telemetry() -> MemoryTelemetry:
    global _shared_telemetry
    if _shared_telemetry is None:
        import os

        _shared_telemetry = MemoryTelemetry(
            enabled=os.environ.get("FLUX2_MEM_TELEMETRY", "1") != "0"
        )
    return _shared_telemetry
