"""Profiler / beacon / logging / registry tests (sandboxed global state,
mirroring RuntimeBeaconTests.swift's withSandbox pattern)."""

import json
import os

import pytest

from flux2_tpu.io import registry
from flux2_tpu.utils import beacon as beacon_mod
from flux2_tpu.utils import logging as flog
from flux2_tpu.utils.profiler import PhaseProfiler


def test_profiler_phases_and_report():
    p = PhaseProfiler(enabled=True)
    with p.phase("1. encode"):
        pass
    with p.phase("2. denoise"):
        p.record_step(0.1)
        p.record_step(0.2)
    assert set(p.phases) == {"1. encode", "2. denoise"}
    rep = p.report()
    assert "bottleneck" in rep and "steps: 2" in rep
    assert p.eta(10) == pytest.approx(10 * 0.15)


def test_profiler_chrome_trace(tmp_path):
    p = PhaseProfiler(enabled=True)
    with p.phase("work"):
        pass
    path = str(tmp_path / "trace.json")
    p.export_chrome_trace(path)
    with open(path) as f:
        trace = json.load(f)
    assert trace["traceEvents"][0]["name"] == "work"
    assert trace["traceEvents"][0]["ph"] == "X"


def test_profiler_disabled_is_noop():
    p = PhaseProfiler(enabled=False)
    with p.phase("x"):
        pass
    assert p.phases == {}


def test_beacon_lifecycle(tmp_path, monkeypatch):
    monkeypatch.setenv("FLUX2_BEACON_DIR", str(tmp_path))
    b = beacon_mod.RuntimeBeacon("generate", model="klein-4b", force=True)
    b.update(phase="denoising", step=2, total_steps=4)
    manifests = beacon_mod.list_active()
    assert len(manifests) == 1
    m = manifests[0]
    assert m["task"] == "generate" and m["step"] == 2 and m["pid"] == os.getpid()
    b.end()
    assert beacon_mod.list_active() == []


def test_beacon_disabled_by_default(tmp_path, monkeypatch):
    monkeypatch.setenv("FLUX2_BEACON_DIR", str(tmp_path))
    monkeypatch.delenv("FLUX2_RUNTIME_BEACON", raising=False)
    b = beacon_mod.RuntimeBeacon("generate")
    assert not b.active
    assert not os.listdir(tmp_path)


def test_beacon_gc_stale(tmp_path, monkeypatch):
    monkeypatch.setenv("FLUX2_BEACON_DIR", str(tmp_path))
    # fabricate a manifest from a dead pid
    dead = str(tmp_path / "999999999-deadbeef.json")
    with open(dead, "w") as f:
        json.dump({"pid": 999999999}, f)
    removed = beacon_mod.gc_stale_manifests()
    assert removed == 1
    assert not os.path.exists(dead)


def test_logging_gate(capsys):
    flog.set_level("warning")
    assert not flog.is_loggable("info")
    assert flog.is_loggable("error")
    flog.info("hidden")
    flog.error("shown")
    err = capsys.readouterr().err
    assert "hidden" not in err and "shown" in err
    flog.set_level("info")


def test_registry_paths(tmp_path, monkeypatch):
    monkeypatch.setenv("FLUX2_MODELS_DIR", str(tmp_path))
    from flux2_tpu.models.flux2.config import Flux2Model

    spec = registry.TRANSFORMER_REPOS[Flux2Model.KLEIN_4B]
    assert spec.repo_id == "black-forest-labs/FLUX.2-klein-4B"
    assert not spec.gated
    assert registry.TRANSFORMER_REPOS[Flux2Model.DEV].gated
    p = registry.local_model_path(spec)
    assert p.startswith(str(tmp_path)) and p.endswith("transformer")
    assert registry.find_model_path(spec) is None  # nothing downloaded

    # drop a weights file and re-resolve
    os.makedirs(p, exist_ok=True)
    # minimal valid safetensors file
    from flux2_tpu.io import safetensors_io
    import numpy as np

    safetensors_io.save_file({"w": np.zeros((2, 2), np.float32)}, os.path.join(p, "model.safetensors"))
    assert registry.find_model_path(spec) == p
    ok, bad = registry.verify_completeness(p)
    assert ok and bad == []


def test_registry_completeness_detects_truncation(tmp_path):
    from flux2_tpu.io import safetensors_io
    import numpy as np

    path = str(tmp_path / "model.safetensors")
    safetensors_io.save_file({"w": np.ones((64, 64), np.float32)}, path)
    # truncate payload
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size - 100)
    assert not safetensors_io.payload_is_complete(path)
    ok, bad = registry.verify_completeness(str(tmp_path))
    assert not ok and bad == ["model.safetensors"]
    with pytest.raises(ValueError):
        safetensors_io.load_file(path)


def test_recommended_preset():
    # preset names per ModelRegistry.swift:525-549 thresholds
    assert registry.recommended_preset(96) == "high-quality"
    assert registry.recommended_preset(64) == "balanced"
    assert registry.recommended_preset(48) == "memory-efficient"
    assert registry.recommended_preset(32) == "minimal"
    assert registry.recommended_preset(16) == "ultra-minimal"


def test_encoder_for_model_covers_all_models():
    from flux2_tpu.models.flux2.config import Flux2Model

    for m in Flux2Model:
        assert m in registry.ENCODER_FOR_MODEL
        assert registry.ENCODER_FOR_MODEL[m] in registry.TEXT_ENCODER_REPOS
    # Dev uses Mistral; Klein uses Qwen3 sized to the joint dim
    assert registry.ENCODER_FOR_MODEL[Flux2Model.DEV] == "mistral-small-3.2"
    assert registry.ENCODER_FOR_MODEL[Flux2Model.KLEIN_4B] == "qwen3-4b"
    assert registry.ENCODER_FOR_MODEL[Flux2Model.KLEIN_9B_KV] == "qwen3-8b"


def test_memory_profiles_and_auto():
    from flux2_tpu.models.flux2.config import Flux2Model
    from flux2_tpu.utils import memory as mem

    perf = mem.MemoryProfile.named("performance")
    assert perf.remat is False and perf.vae_tile_threshold_px == 2048
    # plenty of headroom -> performance; tight fit -> conservative
    assert mem.auto_profile(Flux2Model.KLEIN_4B, "bf16", hbm_bytes=64 * 1024**3).name == "performance"
    assert mem.auto_profile(Flux2Model.DEV, "bf16", hbm_bytes=68 * 1024**3).name == "conservative"


def test_memory_telemetry_snapshots():
    from flux2_tpu.utils import memory as mem

    t = mem.MemoryTelemetry(enabled=True)
    t.snapshot("phase_a")
    t.snapshot("phase_b")
    d = t.as_dict()
    assert set(d) == {"phase_a", "phase_b"}
    assert "peak_gb" in d["phase_a"]
    report = t.report()
    assert "phase_a" in report and "peak" in report
    # disabled: zero-cost no-op
    off = mem.MemoryTelemetry(enabled=False)
    assert off.snapshot("x") is None and off.as_dict() == {}


@pytest.mark.slow
def test_generation_result_reports_memory():
    from test_pipeline import tiny_pipeline, _emb

    from flux2_tpu.utils import memory as mem

    pipe = tiny_pipeline()
    pipe.memory_profile = mem.MemoryProfile.named("performance")
    res = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=1, seed=3)
    assert res.memory_stats is not None
    assert set(res.memory_stats) >= {"denoising", "vae_decoding"}
