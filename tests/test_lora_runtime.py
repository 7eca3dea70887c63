"""LoRA runtime semantics at the user surface: Turbo scheduler overrides,
activation-keyword prompt prefixing, multi-LoRA conflict warnings, and
checkpoint-image CLI flags (LoRAConfig.swift:7-32 applied at
Flux2Pipeline.swift:1879-1908; LoRAAdapter.swift:189-199;
Flux2CLI.swift:50-373 checkpoint flags)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.cli.main import main
from flux2_tpu.io import safetensors_io
from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.training import lora_loader

TINY = cfg.Flux2TransformerConfig(
    num_layers=1, num_single_layers=1, num_attention_heads=2,
    attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
)


@pytest.fixture()
def _tiny_model_config():
    orig = cfg.Flux2Model.transformer_config
    cfg.Flux2Model.transformer_config = property(lambda self: TINY)
    try:
        yield
    finally:
        cfg.Flux2Model.transformer_config = orig


def _write_turbo_lora(tmp_path, rank=4, sched=None, keyword="TURBOSTYLE"):
    d = TINY.inner_dim
    rng = np.random.RandomState(0)
    w = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": rng.randn(rank, d).astype(np.float32) * 0.01,
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": rng.randn(d, rank).astype(np.float32) * 0.01,
    }
    path = str(tmp_path / "turbo.safetensors")
    safetensors_io.save_file(w, path)
    conf = {"alpha": rank}
    if keyword:
        conf["activation_keyword"] = keyword
    if sched:
        conf["scheduler"] = sched
    with open(str(tmp_path / "turbo.json"), "w") as f:
        json.dump(conf, f)
    return path


def test_turbo_lora_changes_schedule_cli(tmp_path, _tiny_model_config, capsys):
    """A Turbo-LoRA sidecar JSON changes the steps/sigmas of a t2i run when
    the user passes no --steps (VERDICT r2 Missing #4)."""
    lora = _write_turbo_lora(tmp_path, sched={"custom_sigmas": [1.0, 0.5], "num_steps": 2, "guidance": 1.0})
    out = str(tmp_path / "o.png")
    main([
        "t2i", "--random-init", "--model", "klein-4b", "--lora", lora,
        "--width", "64", "--height", "64", "-o", out,
    ])
    printed = capsys.readouterr().out
    rec = json.loads(printed.strip().splitlines()[-1])
    # klein-4b defaults to 4 steps; the LoRA's 2-sigma custom schedule wins
    assert rec["steps"] == 2
    assert os.path.exists(out)


def test_explicit_steps_beat_lora_override(tmp_path, _tiny_model_config, capsys):
    lora = _write_turbo_lora(tmp_path, sched={"num_steps": 2})
    out = str(tmp_path / "o2.png")
    main([
        "t2i", "--random-init", "--model", "klein-4b", "--lora", lora,
        "--steps", "3", "--width", "64", "--height", "64", "-o", out,
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["steps"] == 3


def test_lora_keyword_prefixes_prompt():
    """The activation keyword prefixes the encoded prompt; final_prompt
    reports it (LoRAAdapter.swift:189-199)."""
    from flux2_tpu.pipeline.pipeline import Flux2Pipeline

    pipe = Flux2Pipeline.from_random(model=cfg.Flux2Model.KLEIN_4B, transformer_config=TINY)
    seen = {}

    def fake_encoder(prompt):
        seen["prompt"] = prompt
        return jnp.zeros((1, 8, TINY.joint_attention_dim), jnp.bfloat16)

    pipe.text_encoder = fake_encoder
    pipe.lora_keywords = ["TURBOSTYLE"]
    res = pipe.generate(prompt="a cat", height=64, width=64, num_steps=1, seed=0)
    assert seen["prompt"] == "TURBOSTYLE, a cat"
    assert res.final_prompt == "TURBOSTYLE, a cat"
    # already present -> not duplicated
    res2 = pipe.generate(prompt="turbostyle cat", height=64, width=64, num_steps=1, seed=0)
    assert seen["prompt"] == "turbostyle cat"
    assert res2.final_prompt == "turbostyle cat"


def test_merge_runtime_semantics_conflicts():
    ov1 = lora_loader.LoRASchedulerOverrides(num_steps=2, guidance=1.0)
    ov2 = lora_loader.LoRASchedulerOverrides(num_steps=8)
    l1 = lora_loader.LoadedLoRA(pairs={}, rank=4, alpha=4, scale=1.0, target_layers=1,
                                overrides=ov1, activation_keyword="STYLE_A")
    l2 = lora_loader.LoadedLoRA(pairs={}, rank=4, alpha=4, scale=1.0, target_layers=1,
                                overrides=ov2, activation_keyword="STYLE_A")
    merged, keywords, warnings = lora_loader.merge_runtime_semantics([l1, l2])
    assert merged.num_steps == 8  # last wins
    assert merged.guidance == 1.0  # non-conflicting field survives
    assert keywords == ["STYLE_A"]  # deduped
    assert any("num_steps" in w for w in warnings)


def test_checkpoint_every_cli_writes_intermediates(tmp_path, _tiny_model_config):
    """--checkpoint-every N saves <stem>_step_NNN.png intermediates."""
    out = str(tmp_path / "gen.png")
    main([
        "t2i", "--random-init", "--model", "klein-4b", "--steps", "4",
        "--checkpoint-every", "2", "--width", "64", "--height", "64", "-o", out,
    ])
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "gen_step_002.png"))
    assert not os.path.exists(str(tmp_path / "gen_step_004.png"))  # final is gen.png
