"""Prequantized checkpoint + LoRA loader tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.io import checkpoints as ckpt
from flux2_tpu.io import safetensors_io
from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.ops import quant
from flux2_tpu.training import lora_loader

CONFIG = cfg.Flux2TransformerConfig(
    num_layers=2, num_single_layers=2, num_attention_heads=2,
    attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
)


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)


def test_flatten_unflatten_roundtrip(params):
    flat, meta = ckpt.flatten_pytree(params)
    rebuilt = ckpt.unflatten_to_like(flat, meta, params)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(rebuilt),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_prequantized_export_load(params, tmp_path):
    qparams = quant.quantize_params(params, "qint8", min_size=1024)
    path = ckpt.export_prequantized(qparams, str(tmp_path), "qint8")
    assert os.path.exists(path)
    loaded, meta = ckpt.load_prequantized(path)
    assert meta["format"] == "qint8"
    assert meta["lora_baked"] == "0"
    qt = loaded["double_blocks"]["to_q"]
    assert quant.is_quantized(qt)
    np.testing.assert_array_equal(
        np.asarray(qt.q), np.asarray(qparams["double_blocks"]["to_q"].q)
    )
    # unquantized leaves survive too
    np.testing.assert_allclose(
        np.asarray(loaded["double_blocks"]["norm_q"]),
        np.asarray(qparams["double_blocks"]["norm_q"]),
    )


def test_prequantized_truncation_rejected(params, tmp_path):
    qparams = quant.quantize_params(params, "qint8", min_size=1024)
    path = ckpt.export_prequantized(qparams, str(tmp_path), "qint8")
    with open(path, "r+b") as f:
        f.truncate(os.path.getsize(path) - 64)
    with pytest.raises(ValueError, match="incomplete"):
        ckpt.load_prequantized(path)


def test_prequantized_stale_fingerprint(params, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    safetensors_io.save_file({"w": np.zeros((2, 2), np.float32)}, str(src / "model.safetensors"))
    path = ckpt.export_prequantized(params, str(tmp_path), "bf16x", source_dir=str(src))
    # unchanged source loads fine
    ckpt.load_prequantized(path, expected_source_dir=str(src))
    # mutate the source -> stale
    safetensors_io.save_file({"w": np.ones((4, 4), np.float32)}, str(src / "model.safetensors"))
    with pytest.raises(ValueError, match="stale"):
        ckpt.load_prequantized(path, expected_source_dir=str(src))


def _fake_diffusers_lora(rank=4):
    d = CONFIG.inner_dim
    mlp = CONFIG.mlp_hidden_dim
    w = {}
    rng = np.random.RandomState(0)
    # double block 0: to_q
    w["transformer.transformer_blocks.0.attn.to_q.lora_A.weight"] = rng.randn(rank, d).astype(np.float32)
    w["transformer.transformer_blocks.0.attn.to_q.lora_B.weight"] = rng.randn(d, rank).astype(np.float32)
    # single block 1: fused qkv+mlp
    w["transformer.single_transformer_blocks.1.attn.to_qkv_mlp_proj.lora_A.weight"] = rng.randn(rank, d).astype(np.float32)
    w["transformer.single_transformer_blocks.1.attn.to_qkv_mlp_proj.lora_B.weight"] = rng.randn(3 * d + 2 * mlp, rank).astype(np.float32)
    return w


def test_lora_diffusers_parsing():
    w = _fake_diffusers_lora()
    parsed = lora_loader.parse_lora_weights(w, CONFIG)
    assert parsed["rank"] == 4
    pairs = parsed["pairs"]
    assert ("double_blocks", "to_q") in pairs
    # fused projection split into 5 leaves
    for leaf in ("to_q", "to_k", "to_v", "mlp_gate", "mlp_up"):
        assert ("single_blocks", leaf) in pairs
        a, b = pairs[("single_blocks", leaf)][1]
        assert a.shape == (CONFIG.inner_dim, 4)
    assert pairs[("single_blocks", "mlp_gate")][1][1].shape == (4, CONFIG.mlp_hidden_dim)


def test_lora_bfl_qkv_split():
    d = CONFIG.inner_dim
    rng = np.random.RandomState(1)
    w = {
        "double_blocks.0.img_attn.qkv.lora_A.weight": rng.randn(4, d).astype(np.float32),
        "double_blocks.0.img_attn.qkv.lora_B.weight": rng.randn(3 * d, 4).astype(np.float32),
    }
    parsed = lora_loader.parse_lora_weights(w, CONFIG)
    pairs = parsed["pairs"]
    for leaf in ("to_q", "to_k", "to_v"):
        assert ("double_blocks", leaf) in pairs
    a_q, b_q = pairs[("double_blocks", "to_q")][0]
    np.testing.assert_array_equal(a_q, w["double_blocks.0.img_attn.qkv.lora_A.weight"].T)
    np.testing.assert_array_equal(b_q, w["double_blocks.0.img_attn.qkv.lora_B.weight"][:d].T)


def test_lora_merge_changes_only_targeted_layers(params, tmp_path):
    w = _fake_diffusers_lora()
    path = str(tmp_path / "lora.safetensors")
    safetensors_io.save_file(w, path, metadata={"alpha": "8"})
    loaded = lora_loader.load_lora_file(path, CONFIG)
    assert loaded.alpha == 8.0
    assert loaded.scale == pytest.approx(8.0 / 4.0)

    merged = lora_loader.merge_loras_into_params(params, [loaded], CONFIG)
    # layer 0 to_q changed, layer 1 to_q unchanged
    d0 = np.abs(np.asarray(merged["double_blocks"]["to_q"][0]) - np.asarray(params["double_blocks"]["to_q"][0]))
    d1 = np.abs(np.asarray(merged["double_blocks"]["to_q"][1]) - np.asarray(params["double_blocks"]["to_q"][1]))
    assert d0.max() > 1e-3
    assert d1.max() == 0.0
    # untargeted kinds untouched
    np.testing.assert_array_equal(
        np.asarray(merged["double_blocks"]["to_k"]), np.asarray(params["double_blocks"]["to_k"])
    )


def test_lora_sidecar_config_and_keyword(tmp_path):
    w = _fake_diffusers_lora()
    path = str(tmp_path / "turbo.safetensors")
    safetensors_io.save_file(w, path)
    with open(str(tmp_path / "turbo.json"), "w") as f:
        json.dump(
            {
                "alpha": 16,
                "activation_keyword": "TURBOSTYLE",
                "scheduler": {"custom_sigmas": [1.0, 0.5], "num_steps": 2, "guidance": 1.0},
            },
            f,
        )
    loaded = lora_loader.load_lora_file(path, CONFIG)
    assert loaded.overrides.custom_sigmas == [1.0, 0.5]
    assert loaded.overrides.num_steps == 2
    assert loaded.apply_prompt_prefix("a cat") == "TURBOSTYLE, a cat"
    assert loaded.apply_prompt_prefix("TURBOSTYLE cat") == "TURBOSTYLE cat"


def test_detect_target_model():
    w = _fake_diffusers_lora()
    parsed = lora_loader.parse_lora_weights(w, CONFIG)
    name = lora_loader.detect_target_model(
        parsed["pairs"],
        [("tiny", CONFIG), ("klein-4b", cfg.KLEIN_4B)],
    )
    assert name == "tiny"
