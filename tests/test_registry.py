"""Registry depth: quant-variant fallback, training-variant resolution,
encoder/VLM repo coverage, RAM->preset tables
(ModelRegistry.swift:212-250,525-549; TextEncoderModelRegistry.swift)."""

from flux2_tpu.io import registry
from flux2_tpu.models.flux2.config import Flux2Model


def test_variant_for_quantization_prequantized_repos():
    spec, otf = registry.variant_for_quantization(Flux2Model.DEV, "qint8")
    assert spec.repo_id == "VincentGOURBIN/flux_qint_8bit" and not otf
    spec, otf = registry.variant_for_quantization(Flux2Model.KLEIN_4B, "qint8")
    assert spec.repo_id == "aydin99/FLUX.2-klein-4B-int8" and not otf


def test_variant_for_quantization_fallback_to_bf16():
    # no pre-quantized repo -> bf16 repo + on-the-fly quantization
    for model, fmt in [
        (Flux2Model.DEV, "int4"),
        (Flux2Model.DEV, "mxfp8"),
        (Flux2Model.KLEIN_4B, "int4"),
        (Flux2Model.KLEIN_9B, "qint8"),
        (Flux2Model.KLEIN_9B_KV, "qint8"),
        (Flux2Model.KLEIN_4B_BASE, "qint8"),
    ]:
        spec, otf = registry.variant_for_quantization(model, fmt)
        assert spec == registry.TRANSFORMER_REPOS[model] and otf, (model, fmt)


def test_variant_bf16_never_on_the_fly():
    for model in Flux2Model:
        spec, otf = registry.variant_for_quantization(model, "bf16")
        assert spec == registry.TRANSFORMER_REPOS[model] and not otf


def test_training_variant_resolves_to_base():
    assert registry.training_variant(Flux2Model.KLEIN_4B) is Flux2Model.KLEIN_4B_BASE
    assert registry.training_variant(Flux2Model.KLEIN_9B) is Flux2Model.KLEIN_9B_BASE
    assert registry.training_variant(Flux2Model.KLEIN_9B_KV) is Flux2Model.KLEIN_9B_BASE
    assert registry.training_variant(Flux2Model.DEV) is Flux2Model.DEV  # already base
    # and the distilled sibling (validation images) inverts it
    assert registry.distilled_sibling(Flux2Model.KLEIN_4B_BASE) is Flux2Model.KLEIN_4B
    assert registry.distilled_sibling(Flux2Model.KLEIN_9B_BASE) is Flux2Model.KLEIN_9B
    assert registry.distilled_sibling(Flux2Model.DEV) is Flux2Model.DEV


def test_every_model_has_encoder_and_repo():
    for model in Flux2Model:
        assert model in registry.TRANSFORMER_REPOS
        enc = registry.ENCODER_FOR_MODEL[model]
        assert enc in registry.TEXT_ENCODER_REPOS


def test_vlm_and_vision_encoder_repos_registered():
    for name in ("qwen3-vl-4b", "qwen3-vl-8b", "qwen35-vlm", "mistral-small-3.2"):
        assert name in registry.TEXT_ENCODER_REPOS
        assert name in registry.ENCODER_VARIANT_REPOS
        assert "bf16" in registry.ENCODER_VARIANT_REPOS[name]


def test_quant_presets_table():
    assert registry.QUANT_PRESETS["high-quality"]["transformer"] == "bf16"
    assert registry.QUANT_PRESETS["ultra-minimal"]["transformer"] == "int4"
    assert registry.recommended_preset(128) == "high-quality"
    assert registry.recommended_preset(64) == "balanced"
    assert registry.recommended_preset(48) == "memory-efficient"
    assert registry.recommended_preset(32) == "minimal"
    assert registry.recommended_preset(16) == "ultra-minimal"


def test_per_model_memory_recommendation():
    assert registry.recommended_format_for_model(Flux2Model.DEV, 80) == "bf16"
    assert registry.recommended_format_for_model(Flux2Model.DEV, 70) == "qint8"
    assert registry.recommended_format_for_model(Flux2Model.DEV, 30) == "int4"
    assert registry.recommended_format_for_model(Flux2Model.KLEIN_4B, 16) == "qint8"
    assert registry.recommended_format_for_model(Flux2Model.KLEIN_9B, 24) == "qint8"
    for model in Flux2Model:
        assert model in registry.MODEL_MIN_MEMORY_GB
