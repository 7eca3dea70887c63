"""CLI smoke tests (random-init, tiny shapes, no network)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from flux2_tpu.cli.main import main
from flux2_tpu.cli.train import YAMLTrainingConfig, write_learning_curve_svg


def test_info_runs(capsys):
    main(["info"])
    out = capsys.readouterr().out
    assert "klein-4b" in out and "dev" in out
    assert "not downloaded" in out


def test_beacons_runs(capsys, monkeypatch, tmp_path):
    monkeypatch.setenv("FLUX2_BEACON_DIR", str(tmp_path))
    main(["beacons"])
    assert "0 active" in capsys.readouterr().out


def test_models_dir_flag(capsys, monkeypatch, tmp_path):
    """--models-dir is the CLI counterpart of FLUX2_MODELS_DIR
    (Flux2CLI.swift --models-dir on t2i/i2i/download/info)."""
    monkeypatch.delenv("FLUX2_MODELS_DIR", raising=False)
    main(["info", "--models-dir", str(tmp_path / "custom")])
    out = capsys.readouterr().out
    assert str(tmp_path / "custom") in out
    monkeypatch.delenv("FLUX2_MODELS_DIR", raising=False)


def test_beacon_flag_enables_manifest(monkeypatch, tmp_path):
    """--beacon opts into runtime beacon manifests like
    FLUX2_RUNTIME_BEACON=1 (reference BeaconOptions)."""
    import os as _os

    monkeypatch.setenv("FLUX2_BEACON_DIR", str(tmp_path))
    monkeypatch.delenv("FLUX2_RUNTIME_BEACON", raising=False)
    main(["info", "--beacon"])
    assert _os.environ.get("FLUX2_RUNTIME_BEACON") == "1"
    monkeypatch.delenv("FLUX2_RUNTIME_BEACON", raising=False)


def test_training_control_writes_sentinels(tmp_path, capsys):
    main(["training-control", "pause", "--output-dir", str(tmp_path)])
    assert os.path.exists(tmp_path / ".pause")
    main(["training-control", "resume", "--output-dir", str(tmp_path)])
    assert not os.path.exists(tmp_path / ".pause")
    main(["training-control", "checkpoint", "--output-dir", str(tmp_path)])
    assert os.path.exists(tmp_path / ".checkpoint")


def test_yaml_config_sections(tmp_path):
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(
        """
model: klein-4b
lora:
  rank: 8
  alpha: 8.0
dataset:
  dataset_dir: /data/mydataset
  trigger_word: sks
training:
  max_steps: 100
  learning_rate: 0.0002
loss:
  timestep_sampling: content
"""
    )
    cfg = YAMLTrainingConfig.from_yaml(str(cfg_path))
    assert cfg.rank == 8
    assert cfg.trigger_word == "sks"
    assert cfg.max_steps == 100
    assert cfg.learning_rate == 2e-4
    assert cfg.timestep_sampling == "content"
    # CLI override precedence
    assert cfg.override(max_steps=5).max_steps == 5
    assert cfg.override(max_steps=None).max_steps == 100


def test_learning_curve_svg(tmp_path):
    path = str(tmp_path / "curve.svg")
    write_learning_curve_svg([1.0, 0.5, 0.25], path)
    content = open(path).read()
    assert content.startswith("<svg") and "polyline" in content
    # smoothing: long histories draw raw (faint) + moving-average polylines
    write_learning_curve_svg([1.0 / (i + 1) for i in range(100)], path, smoothing_window=20)
    assert open(path).read().count("<polyline") == 2


_REF_EXAMPLES = "/root/reference/examples"


@pytest.mark.skipif(not os.path.isdir(_REF_EXAMPLES), reason="reference examples not present")
def test_reference_yaml_cat_toy_klein4b_parses_verbatim():
    """The reference's OWN example config must reproduce every value it sets
    (TrainingConfigYAML.swift schema; VERDICT r3 weak #2: the old parser
    silently dropped model.name, dataset.path, checkpoints.output,
    loss.weighting, DOP keys, memory.bucketing, ema.enabled)."""
    cfg = YAMLTrainingConfig.from_yaml(f"{_REF_EXAMPLES}/cat-toy/cat_toy_klein4b.yaml")
    assert cfg.model == "klein-4b"
    assert cfg.encoder_quantization == "bf16"
    assert cfg.rank == 32 and cfg.alpha == 32.0 and cfg.target_layers == "all"
    assert cfg.dataset_dir == "examples/cat-toy/train"
    assert cfg.trigger_word == "statue_cat_toy"
    assert cfg.batch_size == 1 and cfg.max_steps == 250 and cfg.warmup_steps == 25
    assert cfg.learning_rate == 1e-4 and cfg.weight_decay == 1e-4
    assert cfg.loss_weighting == "bell_shaped" and cfg.timestep_sampling == "balanced"
    # diff_output_preservation: true + multiplier 1.0 + class "cat"
    assert cfg.dop_weight == 1.0 and cfg.dop_preservation_class == "cat"
    assert cfg.remat is False  # gradient_checkpointing: false
    assert cfg.cache_latents is True
    assert list(cfg.bucket_resolutions) == [512, 768]
    assert cfg.output_dir == "output/cat-toy-klein4b"
    assert cfg.save_every == 125 and cfg.keep_last_checkpoints == 3
    assert cfg.validation_every == 125 and cfg.validation_seed == 42
    assert cfg.validation_steps == 4
    assert cfg.use_ema is False  # ema.enabled: false
    # per-prompt validation configs survive verbatim, is_512 spelling included
    from flux2_tpu.training.validation import ValidationPrompt

    assert len(cfg.validation_prompts) == 4
    vp0 = ValidationPrompt.normalize(cfg.validation_prompts[0])
    assert vp0.prompt == "a colorful wooden cat figurine sitting on a beach"
    assert vp0.apply_trigger is True and vp0.width == 512 and vp0.height == 512
    vp2 = ValidationPrompt.normalize(cfg.validation_prompts[2])
    assert vp2.apply_trigger is False


@pytest.mark.skipif(not os.path.isdir(_REF_EXAMPLES), reason="reference examples not present")
def test_reference_yaml_dev_and_vlm_test_parse():
    """Dev example: DOP-every-N + int8 encoder quantization; VLM-test
    example: the vlm_scoring block."""
    dev = YAMLTrainingConfig.from_yaml(f"{_REF_EXAMPLES}/cat-toy/cat_toy_dev.yaml")
    assert dev.model == "dev" and dev.encoder_quantization == "int8"
    assert dev.dop_every_n_steps == 8 and dev.dop_weight == 1.0
    assert dev.remat is True  # gradient_checkpointing: true
    assert dev.target_layers == "attention"
    assert dev.validation_steps == 28

    vlm = YAMLTrainingConfig.from_yaml(f"{_REF_EXAMPLES}/cat-toy/cat_toy_klein4b_vlm_test.yaml")
    assert vlm.vlm_scoring is True and vlm.vlm_scene_weight == 0.5
    assert vlm.vlm_compare_to_baseline is True and vlm.vlm_save_best_checkpoint is True
    assert vlm.vlm_early_stopping is False and vlm.vlm_max_reference_images == 3

    tarot = YAMLTrainingConfig.from_yaml(f"{_REF_EXAMPLES}/tarot-style/tarot_training.yaml")
    assert tarot.caption_format == "txt" and tarot.grad_accumulation == 1
    assert tarot.learning_curve is True and tarot.learning_curve_smoothing == 20
    assert tarot.log_every == 10 and tarot.eval_every == 10
    assert tarot.dop_weight == 0.0  # diff_output_preservation: false


def test_yaml_unknown_keys_warn(tmp_path, capsys):
    """Typo'd / unknown keys must WARN, never silently default."""
    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(
        """
model:
  name: klein-4b
  typo_key: 7
mystery_section:
  a: 1
training:
  max_stepz: 9
"""
    )
    cfg = YAMLTrainingConfig.from_yaml(str(cfg_path))
    err = capsys.readouterr().err
    assert cfg.model == "klein-4b"
    assert "model.typo_key" in err
    assert "mystery_section" in err
    assert "training.max_stepz" in err


@pytest.mark.slow
def test_train_lora_smoke(tmp_path):
    """2-step training run end-to-end through the CLI (random init)."""
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(
        f"""
model: klein-4b
lora:
  rank: 2
training:
  max_steps: 2
  save_every: 2
  resolution: 64
"""
    )
    out_dir = tmp_path / "out"
    # Patch the model config to a tiny one through env? Instead run with the
    # real klein-4b config but resolution 64 (s_img=16) and rank 2 — the
    # transformer itself is still 4B-sized random init, too slow for a unit
    # test. Use a monkeypatched tiny config instead.
    from flux2_tpu.models.flux2 import config as cfg_mod

    tiny = cfg_mod.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    orig = cfg_mod.Flux2Model.transformer_config
    try:
        cfg_mod.Flux2Model.transformer_config = property(lambda self: tiny)
        main([
            "train-lora", "--config", str(cfg_path), "--output-dir", str(out_dir),
            "--random-init",
        ])
    finally:
        cfg_mod.Flux2Model.transformer_config = orig
    ckpt = out_dir / "checkpoint_000002"
    assert (ckpt / "lora.safetensors").exists()
    assert (ckpt / "optimizer.safetensors").exists()
    assert (ckpt / "training_state.json").exists()
    assert (out_dir / "learning_curve.svg").exists()
    state = json.loads((ckpt / "training_state.json").read_text())
    assert state["step"] == 2
    assert len(state["loss_history"]) == 2


@pytest.mark.slow
def test_train_lora_resume_deterministic(tmp_path):
    """A run interrupted at step 2 and resumed reproduces the loss history of
    an uninterrupted run exactly: per-step RNG derivation (fold_in + step-
    seeded data sampling) means resume continues the draw sequence instead of
    replaying step 1's noise (TrainingState.swift rngSeed persistence)."""
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(
        """
model: klein-4b
lora:
  rank: 2
training:
  max_steps: 4
  save_every: 2
  resolution: 64
  seed: 11
"""
    )
    from flux2_tpu.models.flux2 import config as cfg_mod

    tiny = cfg_mod.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    orig = cfg_mod.Flux2Model.transformer_config
    try:
        cfg_mod.Flux2Model.transformer_config = property(lambda self: tiny)
        straight, resumed = tmp_path / "straight", tmp_path / "resumed"
        main(["train-lora", "--config", str(cfg_path), "--output-dir", str(straight),
              "--random-init"])
        main(["train-lora", "--config", str(cfg_path), "--output-dir", str(resumed),
              "--random-init", "--max-steps", "2"])
        main(["train-lora", "--config", str(cfg_path), "--output-dir", str(resumed),
              "--random-init", "--resume", str(resumed / "checkpoint_000002"),
              "--max-steps", "4"])
    finally:
        cfg_mod.Flux2Model.transformer_config = orig
    a = json.loads((straight / "checkpoint_000004" / "training_state.json").read_text())
    b = json.loads((resumed / "checkpoint_000004" / "training_state.json").read_text())
    assert len(a["loss_history"]) == len(b["loss_history"]) == 4
    np.testing.assert_allclose(a["loss_history"], b["loss_history"], rtol=1e-6)


def _tiny_transformer_config():
    from flux2_tpu.models.flux2 import config as cfg_mod

    return cfg_mod.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )


def test_train_lora_resume_rejects_changed_rank(tmp_path):
    """Resuming with a different LoRA rank must fail actionably: restoring
    the optimizer state across a rank change silently corrupts it."""
    from flux2_tpu.models.flux2 import config as cfg_mod

    (tmp_path / "a.yaml").write_text(
        "model: klein-4b\nlora:\n  rank: 2\ntraining:\n  max_steps: 2\n  save_every: 2\n  resolution: 64\n"
    )
    (tmp_path / "b.yaml").write_text(
        "model: klein-4b\nlora:\n  rank: 4\ntraining:\n  max_steps: 4\n  save_every: 2\n  resolution: 64\n"
    )
    orig = cfg_mod.Flux2Model.transformer_config
    try:
        cfg_mod.Flux2Model.transformer_config = property(lambda self: _tiny_transformer_config())
        out = tmp_path / "run"
        main(["train-lora", "--config", str(tmp_path / "a.yaml"), "--output-dir", str(out), "--random-init"])
        with pytest.raises(SystemExit, match="rank"):
            main(["train-lora", "--config", str(tmp_path / "b.yaml"), "--output-dir", str(out),
                  "--random-init", "--resume", str(out / "checkpoint_000002")])
    finally:
        cfg_mod.Flux2Model.transformer_config = orig


def test_train_lora_save_every_zero(tmp_path):
    """save_every: 0 disables periodic checkpoints (no ZeroDivisionError);
    the final checkpoint still lands."""
    from flux2_tpu.models.flux2 import config as cfg_mod

    (tmp_path / "t.yaml").write_text(
        "model: klein-4b\nlora:\n  rank: 2\ntraining:\n  max_steps: 2\n  save_every: 0\n  resolution: 64\n"
    )
    orig = cfg_mod.Flux2Model.transformer_config
    try:
        cfg_mod.Flux2Model.transformer_config = property(lambda self: _tiny_transformer_config())
        out = tmp_path / "run"
        main(["train-lora", "--config", str(tmp_path / "t.yaml"), "--output-dir", str(out), "--random-init"])
    finally:
        cfg_mod.Flux2Model.transformer_config = orig
    ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint_"))
    assert ckpts == ["checkpoint_000002"]  # only the final save


def _run_shard_cli_subprocess(extra_args, out):
    """Run a sharded t2i CLI invocation in a FRESH process.

    Isolation matters: XLA:CPU collective rendezvous with 8 virtual device
    threads on few host cores can stall; inside the long-lived pytest
    process an unlucky stall crosses the rendezvous hard timeout and
    SIGABRTs the whole suite (observed on a 1-core host). A fresh process
    per mesh topology keeps the rendezvous windows short and contains any
    failure to the one test.
    """
    import subprocess
    import sys

    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = ("
        "'--xla_force_host_platform_device_count=8 '"
        "'--xla_cpu_collective_timeout_seconds=600 '"
        "'--xla_cpu_collective_call_terminate_timeout_seconds=600')\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from flux2_tpu.models.flux2 import config as cfg_mod\n"
        "tiny = cfg_mod.Flux2TransformerConfig(\n"
        "    num_layers=1, num_single_layers=2, num_attention_heads=2,\n"
        "    attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False)\n"
        "cfg_mod.Flux2Model.transformer_config = property(lambda self: tiny)\n"
        "from flux2_tpu.cli.main import main\n"
        "import sys\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    args = ["t2i", "--random-init", "--width", "64", "--height", "64",
            "--steps", "1", *extra_args, "-o", out]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code, *args], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert os.path.exists(out)


@pytest.mark.slow
def test_cli_shard_flag(tmp_path):
    """--shard data,fsdp,tp[,sp] shards the pipeline on the virtual mesh."""
    _run_shard_cli_subprocess(["--shard", "1,2,4"], str(tmp_path / "sharded.png"))


@pytest.mark.slow
def test_cli_shard_context_parallel(tmp_path):
    _run_shard_cli_subprocess(
        ["--shard", "1,1,2,4", "--context-parallel"], str(tmp_path / "cp.png")
    )


@pytest.mark.slow
def test_cli_shard_dcn_multislice(tmp_path):
    """--shard data,fsdp,tp --dcn builds the multi-slice mesh (data over DCN)."""
    _run_shard_cli_subprocess(["--shard", "2,2,2", "--dcn"], str(tmp_path / "dcn.png"))


def test_encoders_vision_subcommand(tmp_path, capsys):
    """flux-encoders vision: image + prompt -> VLM description
    (FluxEncodersCLI.swift:12-15), smoke-tested with a stub VLM."""
    from PIL import Image

    import numpy as np

    from flux2_tpu.cli.encoders import main as enc_main
    from flux2_tpu.models.text_encoders.facade import shared

    img_path = str(tmp_path / "probe.png")
    Image.fromarray(np.full((32, 32, 3), 200, np.uint8)).save(img_path)

    class StubVLM:
        def analyze_image(self, image, prompt, seed=0):
            assert image.shape == (32, 32, 3)
            return f"STUB SAW: {prompt}"

    shared.attach_vlm(StubVLM())
    try:
        enc_main(["vision", "--image", img_path, "--prompt", "what is this?"])
    finally:
        shared.unload_vlm()
    assert "STUB SAW: what is this?" in capsys.readouterr().out


def test_encoders_vision_requires_weights(tmp_path):
    from PIL import Image

    import numpy as np
    import pytest as _pytest

    from flux2_tpu.cli.encoders import main as enc_main

    img_path = str(tmp_path / "probe.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)
    with _pytest.raises(SystemExit, match="encoder-dir"):
        enc_main(["vision", "--image", img_path])


def test_train_yaml_round3_fields(tmp_path):
    """Round-3 YAML surface: schedulers, EMA, samplers, buckets, val-loss."""
    import yaml as _yaml

    from flux2_tpu.cli.train import YAMLTrainingConfig

    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(_yaml.safe_dump({
        "training": {
            "lr_scheduler": "cosine_with_restarts", "warmup_steps": 50,
            "epochs": 3, "keep_only_last_n_checkpoints": 2,
            "caption_dropout_rate": 0.1, "ema_enabled": True,
            "log_every_n_steps": 5,
        },
        "loss": {"loss_weighting": "snr", "snr_gamma": 3.0,
                 "timestep_sampling": "flux_shift", "flux_shift_value": 3.0},
        "dataset": {"bucket_resolutions": [512, 768]},
        "validation_dataset_dir": "/tmp/val",
        "early_stop_on_overfit": True,
    }))
    cfg = YAMLTrainingConfig.from_yaml(str(cfg_path))
    assert cfg.lr_scheduler == "cosine_with_restarts" and cfg.warmup_steps == 50
    assert cfg.epochs == 3 and cfg.keep_last_checkpoints == 2  # alias
    assert cfg.caption_dropout == 0.1 and cfg.use_ema is True  # aliases
    assert cfg.log_every == 5
    assert cfg.loss_weighting == "snr" and cfg.snr_gamma == 3.0
    assert cfg.timestep_sampling == "flux_shift" and cfg.flux_shift == 3.0
    assert list(cfg.bucket_resolutions) == [512, 768]
    assert cfg.validation_dataset_dir == "/tmp/val" and cfg.early_stop_on_overfit


def test_train_lora_pp_tp_without_pp_exits(tmp_path):
    """pp_tp/pp_microbatches/pp_over_dcn are pipeline-stage knobs: setting
    them without pp > 1 must fail loudly instead of silently training dense
    (a Dev-32B run would otherwise OOM with no hint at the ignored knob)."""
    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text("model: klein-4b\ntraining:\n  pp_tp: 2\n  max_steps: 1\n")
    with pytest.raises(SystemExit, match="pp_tp"):
        main([
            "train-lora", "--config", str(cfg_path),
            "--output-dir", str(tmp_path / "out"), "--random-init",
        ])


def test_train_lora_save_every_zero_warns_validation_off(tmp_path, capsys):
    """save_every: 0 (final checkpoint only) with validation configured but
    validation_every unset: training must run, and the silently-disabled
    validation must be called out (previously a silent no-op)."""
    from flux2_tpu.models.flux2 import config as cfg_mod

    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(
        "model: klein-4b\n"
        "training:\n  max_steps: 1\n  save_every: 0\n  resolution: 64\n"
        "validation_dataset_dir: /nonexistent-val\n"
    )
    tiny = cfg_mod.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    orig = cfg_mod.Flux2Model.transformer_config
    try:
        cfg_mod.Flux2Model.transformer_config = property(lambda self: tiny)
        main([
            "train-lora", "--config", str(cfg_path),
            "--output-dir", str(tmp_path / "out"), "--random-init",
        ])
    finally:
        cfg_mod.Flux2Model.transformer_config = orig
    err = capsys.readouterr().err
    assert "validation_every" in err  # the loud warning


def test_shipped_example_yamls_parse_clean(capsys):
    """The repo's own examples/cat-toy configs must parse with every value
    applied and zero unknown-key warnings."""
    import glob

    files = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "cat-toy", "*.yaml")))
    assert len(files) >= 3
    for f in files:
        cfg = YAMLTrainingConfig.from_yaml(f)
        assert cfg.rank == 32 and cfg.trigger_word == "statue_cat_toy"
        out = capsys.readouterr()
        assert "unknown" not in (out.out + out.err), f
    dev = YAMLTrainingConfig.from_yaml([f for f in files if "dev" in f][0])
    assert dev.model == "dev" and dev.pp == 4 and dev.pp_tp == 2 and dev.dop_every_n_steps == 8
    vlm = YAMLTrainingConfig.from_yaml([f for f in files if "vlm" in f][0])
    assert vlm.vlm_scoring and vlm.vlm_early_stopping and vlm.vlm_early_stopping_min_delta == 0.5


def test_encoder_quantization_yaml_applies_when_flag_absent():
    """The train-lora --encoder-quantization flag defaults to None so the
    YAML's model.quantization (encoder-only, TrainingConfigYAML.swift:33-35)
    actually takes effect; an explicit flag still wins (r4 review fix)."""
    from flux2_tpu.cli.main import main as cli_main  # noqa: F401 (parser import path)
    from flux2_tpu.cli.train import resolve_encoder_quantization

    assert resolve_encoder_quantization(None, "int8") == "qint8"
    assert resolve_encoder_quantization(None, "nf4") == "nf4"
    assert resolve_encoder_quantization(None, None) == "bf16"
    assert resolve_encoder_quantization("w8a8", "int8") == "w8a8"  # flag wins


def test_train_lora_parser_accepts_allow_partial_resume():
    """--allow-partial-resume is the documented escape hatch of the strict
    optimizer restore; it must actually parse (r4 review fix)."""
    from flux2_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["train-lora", "--config", "x.yaml", "--allow-partial-resume", "--resume", "ckpt"]
    )
    assert args.allow_partial_resume is True
    assert build_parser().parse_args(["train-lora", "--config", "x.yaml"]).encoder_quantization is None


def test_degradation_threshold_fires_without_early_stopping():
    """The catastrophic-forgetting guard is independent of patience-based
    early stopping: with patience=0 (vlm early stopping off) a score
    collapse below best-threshold must still stop (r4 review fix)."""
    from flux2_tpu.training.validation import ValidationRecord, ValidationTracker

    t = ValidationTracker(patience=0, degradation_threshold=5.0)  # combined-score units
    assert not t.record(10, [ValidationRecord(step=10, prompt="p", scene=90, style=90)])
    assert not t.record(20, [ValidationRecord(step=20, prompt="p", scene=89, style=89)])
    assert t.record(30, [ValidationRecord(step=30, prompt="p", scene=10, style=10)])  # collapse


@pytest.mark.slow
def test_train_lora_random_init_real_dataset(tmp_path):
    """--random-init with an EXISTING dataset.path runs the REAL data path
    (image decode -> buckets -> VAE encode -> caption encode through the
    inline-BPE extractor) instead of synthetic tensors — the checkpoint-free
    e2e mode used for the cat-toy protocol (SimpleLoRATrainer.swift:244-350
    + examples/cat-toy) on hosts without weights."""
    from PIL import Image

    from flux2_tpu.models.flux2 import config as cfg_mod

    data = tmp_path / "train"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (96, 96, 3), np.uint8)).save(
            data / f"{i}.jpeg"
        )
        (data / f"{i}.txt").write_text(f"a photo of [trigger] number {i}")
    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(
        "model: klein-4b\n"
        "lora:\n  rank: 2\n"
        f"dataset:\n  path: {data}\n  trigger_word: statue_cat_toy\n"
        "training:\n  max_steps: 2\n  save_every: 2\n"
        "memory:\n  cache_latents: false\n  cache_text_embeddings: false\n"
        "  bucketing:\n    enabled: true\n    resolutions: [64]\n"
        "validation:\n"
        "  prompts:\n    - prompt: 'a statue cat toy on a beach'\n"
        "      apply_trigger: true\n      is_512: false\n"
        "  every_n_steps: 2\n  steps: 1\n  width: 64\n  height: 64\n"
    )
    tiny = cfg_mod.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    orig = cfg_mod.Flux2Model.transformer_config
    try:
        cfg_mod.Flux2Model.transformer_config = property(lambda self: tiny)
        main([
            "train-lora", "--config", str(cfg_path),
            "--output-dir", str(tmp_path / "out"), "--random-init",
        ])
    finally:
        cfg_mod.Flux2Model.transformer_config = orig
    out = tmp_path / "out"
    ckpt = out / "checkpoint_000002"
    assert (ckpt / "lora.safetensors").exists()
    assert (ckpt / "training_state.json").exists()
    state = json.loads((ckpt / "training_state.json").read_text())
    assert state["step"] == 2 and len(state["loss_history"]) == 2
    # a validation image was rendered through the real (random) weights
    vals = list(out.glob("validation/**/*.png")) + list(out.glob("**/val*__*.png"))
    assert vals, f"no validation image under {out}"


def test_compile_cache_enables_on_tunneled_tpu_hosts():
    """Regression (r5): 'axon,cpu' hosts pin CPU as FALLBACK platform; the
    old `'cpu' in platforms` guard disabled the persistent compile cache on
    exactly the hosts where TPU compiles cost minutes (rounds 1-4 ran every
    bench section cold). The decision keys on the primary platform + the
    resolved backend."""
    from flux2_tpu.cli.main import _cache_should_enable

    assert _cache_should_enable("axon,cpu", lambda: "tpu")      # the bug
    assert _cache_should_enable("tpu", lambda: "tpu")
    assert _cache_should_enable("", lambda: "tpu")
    assert not _cache_should_enable("cpu", lambda: "tpu")       # explicit cpu
    assert not _cache_should_enable("", lambda: "cpu")          # resolved cpu
    assert not _cache_should_enable("axon,cpu", lambda: (_ for _ in ()).throw(RuntimeError()))
