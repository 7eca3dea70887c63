"""train-lora CLI driver: YAML config + training loop orchestration.

Capability parity with ``Flux2CLI/TrainLoRACommand.swift`` +
``TrainingConfigYAML.swift`` + the trainer orchestration half of
``SimpleLoRATrainer.swift:244-350,1746-2409`` and
``Training/LoRATrainingHelper.swift``:

  - YAML sections (model / lora / dataset / training / loss / checkpoints /
    validation) with CLI-flag override precedence; resume; sentinel control.
  - Base-variant resolution: training ALWAYS fine-tunes the non-distilled
    sibling (ModelRegistry.swift:238-250).
  - Real data prep: VAE-encode the dataset through the LatentCache with
    bucket-homogeneous batches, encode captions (and DOP preservation
    captions with trigger->class swap, and I2I control images) through the
    attached text encoder (LoRATrainingHelper.swift data prep;
    SimpleLoRATrainer.swift:244-350).
  - Periodic validation with the DISTILLED sibling + scoring + best-
    checkpoint copy + early stopping (SimpleLoRATrainer.swift:1746-2409).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass
class YAMLTrainingConfig:
    model: str = "klein-4b"
    output_dir: str = "lora_output"
    dataset_dir: str = ""
    control_dir: Optional[str] = None
    trigger_word: Optional[str] = None
    rank: int = 16
    alpha: float = 16.0
    target_layers: str = "attention_ffn"  # attention|attention_output|attention_ffn|all
    learning_rate: float = 1e-4
    optimizer: str = "adamw"
    weight_decay: float = 0.01
    # reference user-facing defaults: cosine decay after 100 warmup steps
    # (LoRATrainingConfig.swift:573-574)
    warmup_steps: int = 100
    lr_scheduler: str = "cosine"
    lr_num_cycles: int = 3
    batch_size: int = 1
    grad_accumulation: int = 1
    max_steps: int = 1000
    epochs: int = 0  # >0: max_steps = epochs * ceil(len(dataset)/effective_batch)
    save_every: int = 250
    keep_last_checkpoints: int = 0  # prune to the last N checkpoint dirs (0 = keep all)
    log_every: int = 10
    timestep_sampling: str = "balanced"
    logit_normal_mean: float = 0.0
    logit_normal_std: float = 1.0
    flux_shift: float = 1.0
    loss_weighting: str = "none"  # none|bell_shaped|snr
    snr_gamma: float = 5.0
    dop_weight: float = 0.0
    dop_preservation_class: str = "person"
    use_ema: bool = False
    ema_decay: float = 0.99
    caption_dropout: float = 0.0  # P(train on the empty caption) per sample
    seed: int = 42
    resolution: int = 512
    # pipeline parallelism (GPipe over the stacked DiT blocks,
    # parallel/pipeline.py): pp stages x (n_devices/pp) data; the DCN-friendly
    # multi-slice training layout. 0/1 disables. pp_microbatches defaults to pp.
    pp: int = 1
    pp_microbatches: int = 0
    pp_over_dcn: bool = False  # stride the stage axis across slice groups
    pp_tp: int = 1  # tensor parallelism INSIDE each stage (GSPMD-auto tp axis)
    # multi-resolution bucketing: union of the ratio table scaled to each
    # listed resolution (LoRATrainingConfig.swift:235-239 bucketResolutions)
    bucket_resolutions: Sequence[int] = ()
    remat: bool = True
    control_dropout: float = 0.0
    cache_dir: Optional[str] = None
    cache_text_embeddings: bool = True  # disk-cache caption embeddings
    # train-loss plateau early stop (LoRATrainingConfig.swift:472-478):
    # checked on a 20-step moving average; 0 disables
    early_stop_loss_patience: int = 0
    early_stop_min_delta: float = 1e-4
    # validation-LOSS early stops on a held-out dataset
    # (LoRATrainingConfig.swift:223,483-500 — config-surfaced there,
    # implemented here): val-train gap (overfit) + val-loss stagnation
    validation_dataset_dir: Optional[str] = None
    early_stop_on_overfit: bool = False
    early_stop_max_val_gap: float = 0.5
    early_stop_gap_patience: int = 3
    early_stop_on_val_stagnation: bool = False
    early_stop_min_val_improvement: float = 0.1
    early_stop_val_stagnation_patience: int = 2
    # validation (SimpleLoRATrainer.swift:1746-2409)
    validation_prompts: Sequence[str] = ()
    validation_every: int = 0  # 0 -> save_every
    validation_steps: int = 4
    validation_size: int = 512
    validation_seed: int = 1234
    early_stop_patience: int = 3

    @classmethod
    def from_yaml(cls, path: str) -> "YAMLTrainingConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        flat = {}
        # Sections mirror the reference YAML layout; flat keys also accepted.
        for section in ("model", "lora", "dataset", "training", "loss", "checkpoints"):
            sec = raw.get(section)
            if isinstance(sec, dict):
                flat.update(sec)
        val = raw.get("validation")
        if isinstance(val, dict):
            mapping = {
                "prompts": "validation_prompts",
                "every": "validation_every",
                "every_n_steps": "validation_every",
                "steps": "validation_steps",
                "size": "validation_size",
                "seed": "validation_seed",
                "early_stop_patience": "early_stop_patience",
            }
            for k, v in val.items():
                flat[mapping.get(k, k)] = v
        flat.update({k: v for k, v in raw.items() if not isinstance(v, dict)})
        # reference YAML spellings (TrainingConfigYAML.swift)
        aliases = {
            "caption_dropout_rate": "caption_dropout",
            "keep_only_last_n_checkpoints": "keep_last_checkpoints",
            "warmup": "warmup_steps",
            "flux_shift_value": "flux_shift",
            "ema_enabled": "use_ema",
            "log_every_n_steps": "log_every",
        }
        for src, dst in aliases.items():
            if src in flat and dst not in flat:
                flat[dst] = flat.pop(src)
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in flat.items() if k in fields}
        return cls(**known)

    def override(self, **kw) -> "YAMLTrainingConfig":
        updates = {k: v for k, v in kw.items() if v is not None}
        return dataclasses.replace(self, **updates)


# ---------------------------------------------------------------------------
# Data preparation
# ---------------------------------------------------------------------------


def _prepare_real_data(pipe, cfg: YAMLTrainingConfig, tconfig):
    """VAE-encode the dataset + encode captions through the REAL pipeline.

    Composition of the already-tested primitives (LatentCache.get_or_encode,
    bucketed grouping, pipe.encode_image_to_packed_sequence,
    pipe.encode_prompt) the reference choreographs in
    LoRATrainingHelper.swift + SimpleLoRATrainer.swift:244-350.
    Returns (sample_batch(rng, bs) -> batch dict, items).
    """
    import jax.numpy as jnp

    from flux2_tpu.ops import latents as lu
    from flux2_tpu.ops.rope import rope_embeddings
    from flux2_tpu.training import data as td
    from flux2_tpu.utils import logging as flog

    resolutions = [int(r) for r in (cfg.bucket_resolutions or [cfg.resolution])]
    buckets = []
    for r in resolutions:
        for b in td.scaled_buckets(r):
            if b not in buckets:
                buckets.append(b)
    buckets = tuple(buckets)
    if len(resolutions) > 1:
        flog.info(f"multi-resolution bucketing: {resolutions} -> {len(buckets)} buckets")
    items = td.load_dataset(
        cfg.dataset_dir, trigger=cfg.trigger_word, control_dir=cfg.control_dir, buckets=buckets
    )
    if not items:
        raise SystemExit(f"no (image, caption) pairs found under {cfg.dataset_dir}")
    if cfg.control_dir:
        paired = [it for it in items if it.control_path]
        if len(paired) < len(items):
            flog.warning(
                f"{len(items) - len(paired)} item(s) have no control image; "
                f"training I2I on the {len(paired)} paired item(s)"
            )
        items = paired
        if not items:
            raise SystemExit(f"control_dir {cfg.control_dir} matches no dataset images")
    flog.info(f"dataset: {len(items)} items in {len(td.group_by_bucket(items))} buckets")

    # --- VAE-encode latents via the disk cache (real encode path) ---
    cache = td.LatentCache(
        cfg.cache_dir or os.path.join(cfg.output_dir, "latent_cache"),
        encoder_version="flux2-vae32-v1",
    )
    latents = {}
    for it in items:
        latents[it.image_path] = np.asarray(
            cache.get_or_encode(it, pipe.encode_image_to_packed_sequence), np.float32
        )[0]
    flog.info(f"encoded {len(latents)} latents -> {cache.cache_dir}")

    # --- captions (and DOP preservation captions) through the text encoder ---
    if pipe.text_encoder is None:
        raise SystemExit("training needs the text encoder (it encodes captions)")
    emb_cache = {}
    # disk cache (cacheTextEmbeddings, LoRATrainingConfig.swift:363): resume
    # runs skip the encoder re-encode; keyed by caption digest + encoder name
    emb_dir = None
    if cfg.cache_text_embeddings:
        emb_dir = os.path.join(
            cfg.cache_dir or os.path.join(cfg.output_dir, "latent_cache"), "text_embeddings"
        )
        os.makedirs(emb_dir, exist_ok=True)

    def embed(caption: str) -> np.ndarray:
        if caption not in emb_cache:
            path = None
            if emb_dir is not None:
                import hashlib

                # quantization changes the embedding VALUES at the same
                # shape — a stale-cache hazard if left out of the key; the
                # extraction recipe (mistral LEFT-pad vs klein RIGHT-pad+think)
                # changes them too, so it versions the key as well
                recipe = getattr(pipe.text_encoder, "recipe", "mistral")
                tag = (
                    f"{pipe.text_encoder_name or 'enc'}|{recipe}|"
                    f"{getattr(pipe, 'text_encoder_quantization', 'bf16')}|{caption}"
                )
                path = os.path.join(
                    emb_dir, hashlib.sha256(tag.encode()).hexdigest()[:24] + ".npy"
                )
                if os.path.exists(path):
                    emb_cache[caption] = np.load(path)
                    return emb_cache[caption]
            emb_cache[caption] = np.asarray(pipe.encode_prompt(caption), np.float32)[0]
            if path is not None:
                np.save(path, emb_cache[caption])
        return emb_cache[caption]

    for it in items:
        embed(it.caption)
    if cfg.caption_dropout > 0:
        embed("")  # unconditional embedding for caption dropout
    dop_caps = {}
    if cfg.dop_weight > 0 and cfg.trigger_word:
        # DOP preservation caption: trigger -> class swap
        # (SimpleLoRATrainer.swift:524-605)
        for it in items:
            dop_caps[it.image_path] = it.caption.replace(
                cfg.trigger_word, cfg.dop_preservation_class
            )
            embed(dop_caps[it.image_path])
    flog.info(f"encoded {len(emb_cache)} caption embedding(s)")

    # --- I2I control images: clean latents at the item's bucket dims ---
    control = {}
    if cfg.control_dir:
        for it in items:
            citem = td.DatasetItem(image_path=it.control_path, caption="", bucket=it.bucket)
            control[it.image_path] = np.asarray(
                cache.get_or_encode(citem, pipe.encode_image_to_packed_sequence), np.float32
            )[0]

    s_txt = next(iter(emb_cache.values())).shape[0]
    rope_cache = {}

    def rope_for(bucket, with_control):
        k = (bucket, with_control)
        if k not in rope_cache:
            w, h = bucket
            ids = [lu.text_position_ids(s_txt), lu.image_position_ids(h, w)]
            if with_control:
                # control tokens ride reference-image position ids (T=10)
                ids.append(lu.reference_image_position_ids([h // 16], [w // 16]))
            rope_cache[k] = rope_embeddings(jnp.asarray(np.concatenate(ids, axis=0)))
        return rope_cache[k]

    grouped = td.group_by_bucket(items)
    bucket_list = list(grouped.keys())
    weights = np.asarray([len(grouped[b]) for b in bucket_list], np.float64)
    weights /= weights.sum()

    def sample_batch(rng: np.random.RandomState, bs: int):
        b = bucket_list[rng.choice(len(bucket_list), p=weights)]
        group = grouped[b]
        chosen = [group[i] for i in rng.randint(0, len(group), size=bs)]
        # caption dropout: train some samples on the empty caption for
        # generalization (LoRATrainingConfig.swift:246)
        caps = [
            "" if cfg.caption_dropout > 0 and rng.uniform() < cfg.caption_dropout
            else it.caption
            for it in chosen
        ]
        batch = {
            "latents": jnp.asarray(np.stack([latents[it.image_path] for it in chosen])),
            "embeddings": jnp.asarray(np.stack([embed(c) for c in caps])),
        }
        use_control = bool(control) and rng.uniform() >= cfg.control_dropout
        if use_control:
            batch["control"] = jnp.asarray(
                np.stack([control[it.image_path] for it in chosen])
            )
        if dop_caps:
            batch["dop_embeddings"] = jnp.asarray(
                np.stack([embed(dop_caps[it.image_path]) for it in chosen])
            )
        if tconfig.guidance_embeds:
            batch["guidance"] = jnp.ones((bs,), jnp.float32)
        cos, sin = rope_for(b, use_control)
        batch["rope_cos"], batch["rope_sin"] = cos, sin
        return batch

    return sample_batch, items


def _prepare_synthetic_data(cfg: YAMLTrainingConfig, tconfig):
    """--random-init smoke mode: synthetic latents/embeddings (no VAE or
    encoder exists to encode with)."""
    import jax
    import jax.numpy as jnp

    from flux2_tpu.ops import latents as lu
    from flux2_tpu.ops.rope import rope_embeddings
    from flux2_tpu.utils import logging as flog

    flog.warning("random-init: training on synthetic tensors (smoke test)")
    h = w = cfg.resolution
    s_img = (h // 16) * (w // 16)
    s_txt = 32
    latents = jax.random.normal(jax.random.PRNGKey(1), (4, s_img, 128))
    embeddings = jax.random.normal(
        jax.random.PRNGKey(2), (4, s_txt, tconfig.joint_attention_dim)
    )
    ids = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))

    def sample_batch(rng: np.random.RandomState, bs: int):
        idx = rng.randint(0, latents.shape[0], size=bs)
        batch = {
            "latents": latents[idx],
            "embeddings": embeddings[idx],
            "rope_cos": cos,
            "rope_sin": sin,
        }
        if tconfig.guidance_embeds:
            batch["guidance"] = jnp.ones((bs,), jnp.float32)
        return batch

    return sample_batch


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------


def run_training(args) -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from flux2_tpu.io import registry
    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.models.flux2.config import Flux2Model
    from flux2_tpu.training import lora as lora_mod
    from flux2_tpu.training import trainer
    from flux2_tpu.training.control import TrainingController, TrainingState, config_hash
    from flux2_tpu.training.validation import (
        ValidationConfig,
        ValidationTracker,
        run_validation,
    )
    from flux2_tpu.utils import logging as flog
    from flux2_tpu.utils.beacon import RuntimeBeacon

    cfg = YAMLTrainingConfig.from_yaml(args.config).override(
        output_dir=args.output_dir, max_steps=args.max_steps
    )
    requested = Flux2Model(cfg.model)
    # LoRA training MUST fine-tune the non-distilled base sibling
    # (ModelRegistry.swift:238-250); the distilled sibling previews validation.
    train_model = registry.training_variant(requested)
    if train_model != requested:
        flog.info(f"resolved training variant: {requested.value} -> {train_model.value}")
    if cfg.pp <= 1 and (cfg.pp_tp > 1 or cfg.pp_microbatches or cfg.pp_over_dcn):
        # checked BEFORE any model build: these are pipeline-stage knobs and
        # silently training dense would OOM/crawl with no hint at the cause
        raise SystemExit(
            "pp_tp/pp_microbatches/pp_over_dcn only take effect with pp > 1 — "
            "set pp: N in the YAML (for tensor parallelism without pipeline "
            "stages use --shard instead)"
        )
    os.makedirs(cfg.output_dir, exist_ok=True)

    # --- base model ---
    pipe = None
    if getattr(args, "random_init", False):
        tconfig = train_model.transformer_config
        base_params = tfm.init_params(jax.random.PRNGKey(0), tconfig, dtype=jnp.float32)
        flog.warning("training against random-init base (smoke test)")
    else:
        from flux2_tpu.cli.main import build_pipeline

        build_args = argparse.Namespace(
            model=train_model.value,
            quantization=getattr(args, "quantization", "bf16") or "bf16",
            transformer_dir=getattr(args, "transformer_dir", None),
            vae_dir=getattr(args, "vae_dir", None),
            small_decoder=False,
            random_init=False,
            encoder_dir=getattr(args, "encoder_dir", None),
            encoder_tokenizer_dir=getattr(args, "encoder_tokenizer_dir", None),
            encoder_quantization=getattr(args, "encoder_quantization", "bf16") or "bf16",
            no_text_encoder=False,
            lora=[],
            shard=getattr(args, "shard", None),
            memory_profile=None,
        )
        pipe = build_pipeline(build_args)
        base_params = pipe.transformer_params
        tconfig = pipe.transformer_config

    # --- pipeline parallelism (GPipe stages over the stacked DiT blocks) ---
    pp_forward = None
    if cfg.pp > 1:
        from flux2_tpu.parallel import pipeline as pp_mod

        if getattr(args, "shard", None):
            raise SystemExit("pp and --shard are mutually exclusive (pp builds its own mesh)")
        if tconfig.num_layers % cfg.pp or tconfig.num_single_layers % cfg.pp:
            raise SystemExit(
                f"pp={cfg.pp} must divide both block stacks of {cfg.model} "
                f"({tconfig.num_layers} double, {tconfig.num_single_layers} single): "
                f"klein-4b (5/20) supports pp=5; klein-9b (8/24) and dev (8/48) pp=2/4/8"
            )
        n_dev = len(jax.devices())
        tp = max(1, cfg.pp_tp)
        if n_dev % (cfg.pp * tp):
            raise SystemExit(f"pp*pp_tp={cfg.pp}*{tp} does not divide {n_dev} devices")
        if tconfig.num_attention_heads % tp:
            raise SystemExit(
                f"pp_tp={tp} must divide the attention head count "
                f"({tconfig.num_attention_heads} for {cfg.model})"
            )
        m_micro = cfg.pp_microbatches or cfg.pp
        data_ax = n_dev // (cfg.pp * tp)
        if cfg.batch_size % m_micro or (cfg.batch_size // m_micro) % data_ax:
            raise SystemExit(
                f"batch_size {cfg.batch_size} must split into {m_micro} microbatches "
                f"each divisible by the data axis {data_ax} (pp={cfg.pp}, tp={tp}, "
                f"{n_dev} devices)"
            )
        if tp > 1 and jax.default_backend() == "cpu":
            # XLA:CPU miscompiles bf16 under partial-auto shard_map ("Invalid
            # binary instruction opcode copy", hlo_instruction.cc:1585 — repro
            # in docs/knowledge/decisions/pipeline-parallelism.md); f32
            # compiles fine and TPU is unaffected. Upcast on this backend only.
            base_params = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
                base_params,
            )
            flog.warning(
                "pp_tp on the CPU backend: bf16 base upcast to f32 "
                "(XLA:CPU partial-auto bf16 miscompile workaround)"
            )
        pp_mesh = pp_mod.make_pp_mesh(
            pp=cfg.pp, data=data_ax, tp=tp, pp_over_dcn=cfg.pp_over_dcn
        )
        base_params = jax.device_put(base_params, pp_mod.pp_param_sharding(pp_mesh, base_params))
        if pipe is not None:
            pipe.transformer_params = base_params
        pp_forward = pp_mod.make_pp_forward(pp_mesh, cfg.pp_microbatches or None)
        flog.info(
            f"pipeline parallelism: mesh {dict(pp_mesh.shape)}, {m_micro} microbatches "
            f"(bubble {(cfg.pp - 1) / (m_micro + cfg.pp - 1):.0%})"
            + (f", tp={tp} inside each stage" if tp > 1 else "")
        )

    # --- data prep (two-phase style; real encode path with real weights) ---
    if pipe is not None:
        if not (cfg.dataset_dir and os.path.isdir(cfg.dataset_dir)):
            raise SystemExit(
                "train-lora needs dataset_dir (images + .txt captions or manifest.jsonl); "
                "use --random-init for a checkpoint-free smoke run"
            )
        sample_batch, items = _prepare_real_data(pipe, cfg, tconfig)
    else:
        sample_batch = _prepare_synthetic_data(cfg, tconfig)
        items = []

    if cfg.epochs > 0 and items and getattr(args, "max_steps", None) is None:
        # epochs -> steps given the effective batch (LoRATrainingConfig.swift:281);
        # an explicit --max-steps beats YAML epochs (maxSteps override semantics)
        eff = cfg.batch_size * max(1, cfg.grad_accumulation)
        steps = cfg.epochs * max(1, -(-len(items) // eff))
        flog.info(f"epochs={cfg.epochs} -> {steps} steps ({len(items)} items, effective batch {eff})")
        cfg = dataclasses.replace(cfg, max_steps=steps)

    tcfg = trainer.TrainConfig(
        rank=cfg.rank,
        alpha=cfg.alpha,
        target_layers=cfg.target_layers,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        optimizer=cfg.optimizer,
        warmup_steps=cfg.warmup_steps,
        lr_scheduler=cfg.lr_scheduler,
        lr_num_cycles=cfg.lr_num_cycles,
        total_steps=cfg.max_steps,
        timestep_sampling=cfg.timestep_sampling,
        logit_normal_mean=cfg.logit_normal_mean,
        logit_normal_std=cfg.logit_normal_std,
        flux_shift=cfg.flux_shift,
        loss_weighting=(
            "bell" if cfg.loss_weighting in ("bell", "bellShaped", "bell_shaped", "weighted")
            else "snr" if cfg.loss_weighting == "snr"
            else "none"
        ),
        snr_gamma=cfg.snr_gamma,
        grad_accumulation=cfg.grad_accumulation,
        dop_weight=cfg.dop_weight,
        use_ema=cfg.use_ema,
        ema_decay=cfg.ema_decay,
        remat=cfg.remat,
        seed=cfg.seed,
    )

    # --- validation setup (distilled sibling previews; LoRA merged per pass) ---
    val_every = cfg.validation_every or cfg.save_every
    val_enabled = pipe is not None and bool(cfg.validation_prompts)
    if val_every <= 0 and (val_enabled or cfg.validation_dataset_dir):
        # save_every: 0 (final checkpoint only) would otherwise silently
        # disable the configured validation passes AND the early stops that
        # ride on them — say so loudly and skip the baseline pass too.
        flog.warning(
            "validation is configured but validation_every/save_every are 0 — "
            "no validation passes (or validation-based early stops) will run; "
            "set validation_every: N to re-enable them"
        )
        val_enabled = False
    val_pipe = None
    val_base = base_params
    val_tconfig = tconfig  # replaced by the sibling's own config when it loads
    tracker = ValidationTracker(patience=cfg.early_stop_patience)
    val_cfg = ValidationConfig(
        prompts=tuple(cfg.validation_prompts),
        every_n_steps=val_every,
        width=cfg.validation_size,
        height=cfg.validation_size,
        steps=cfg.validation_steps,
        seed=cfg.validation_seed,
        early_stop_patience=cfg.early_stop_patience,
        trigger_word=cfg.trigger_word,
    )
    scorer = None
    ref_images = []
    if val_enabled:
        from flux2_tpu.pipeline.pipeline import Flux2Pipeline

        sib = registry.distilled_sibling(train_model)
        val_model = train_model
        if sib != train_model:
            sdir = registry.find_model_path(registry.TRANSFORMER_REPOS[sib])
            if sdir is not None:
                from flux2_tpu.cli.main import _read_config_json, _to_bf16
                from flux2_tpu.io import checkpoints, weight_mapping

                sraw = checkpoints.load_weights_dir(sdir)
                sconfig = _read_config_json(sdir, sib.transformer_config)
                val_base = _to_bf16(
                    weight_mapping.map_transformer_weights(sraw, sconfig, dtype=np.float32)
                )
                val_model = sib
                # the sibling's on-disk config may differ from the training
                # variant's (it is re-read for exactly that reason) — the
                # val pipeline must run the weights under THEIR config
                val_tconfig = sconfig
                flog.info(f"validation previews use the distilled sibling {sib.value}")
            else:
                flog.warning(
                    f"distilled sibling {sib.value} weights not found; "
                    "validating with the training base variant"
                )
        val_pipe = Flux2Pipeline(
            model=val_model,
            transformer_params=val_base,
            transformer_config=val_tconfig,
            vae_params=pipe.vae_params,
            vae_config=pipe.vae_config,
            text_encoder=pipe.text_encoder,
        )
        scorer = _make_scorer(pipe)
        from flux2_tpu.training import data as td

        ref_images = [td.load_image(it.image_path, *it.bucket) for it in items[:4]]

    # --- validation LOSS on a held-out dataset (overfit/stagnation stops) ---
    val_loss_fn = None
    val_batches = []
    if pipe is not None and cfg.validation_dataset_dir:
        vcfg = dataclasses.replace(
            cfg, dataset_dir=cfg.validation_dataset_dir, dop_weight=0.0,
            control_dir=None, caption_dropout=0.0,
            cache_dir=os.path.join(cfg.output_dir, "val_latent_cache"),
        )
        val_sample, val_items = _prepare_real_data(pipe, vcfg, tconfig)
        val_loss_fn = trainer.make_eval_loss(base_params, tconfig, tcfg, forward_fn=pp_forward)
        vr = np.random.RandomState(cfg.validation_seed)
        n_val = min(4, max(1, len(val_items)))
        # FIXED batches + keys: the val-loss curve is comparable across steps
        val_batches = [val_sample(vr, cfg.batch_size) for _ in range(n_val)]
        flog.info(
            f"validation loss: {len(val_items)} held-out item(s), {n_val} fixed batch(es)"
        )

    # --- state / resume ---
    controller = TrainingController(cfg.output_dir)
    if args.resume:
        state_path = os.path.join(args.resume, "training_state.json")
        with open(state_path) as f:
            ck_meta = json.load(f)
        # structural compatibility: a changed rank/alpha/optimizer would
        # silently corrupt the restored optimizer state (reshaped/skipped
        # leaves) — refuse instead
        for field, ours in (("rank", tcfg.rank), ("alpha", tcfg.alpha), ("optimizer", tcfg.optimizer)):
            theirs = ck_meta.get(field)
            if theirs is not None and theirs != ours:
                raise SystemExit(
                    f"resume: checkpoint was trained with {field}={theirs} but the "
                    f"config says {ours} — restoring optimizer state across that "
                    f"change corrupts it; match the config or start fresh"
                )
        state_t = trainer.load_checkpoint(args.resume, base_params, tcfg)
        tstate = TrainingState.load(state_path)
        if tstate.config_hash and tstate.config_hash != config_hash(tcfg):
            flog.warning(
                "resume: training config differs from the checkpoint's "
                "(non-structural change, e.g. max_steps/LR schedule) — continuing"
            )
            tstate.config_hash = config_hash(tcfg)
        flog.info(f"resumed from {args.resume} at step {state_t.step}")
    else:
        state_t, _ = trainer.init_train_state(jax.random.PRNGKey(cfg.seed), base_params, tcfg)
        tstate = TrainingState(rng_seed=cfg.seed, config_hash=config_hash(tcfg))
    optimizer = trainer.make_optimizer(tcfg)
    step_fn = trainer.make_train_step(base_params, tconfig, tcfg, optimizer, forward_fn=pp_forward)
    lora_scale = lora_mod.LoRAConfig(tcfg.rank, tcfg.alpha).scale

    lora, opt_state, ema = state_t.lora, state_t.opt_state, state_t.ema
    plateau_best, plateau_bad = float("inf"), 0
    gap_bad, best_val, val_bad = 0, float("inf"), 0
    bs = cfg.batch_size * max(1, cfg.grad_accumulation)
    # Per-step RNG derivation (fold_in / step-seeded RandomState) instead of a
    # start-seeded chain: a resumed run draws the SAME batch/noise sequence an
    # uninterrupted run would, rather than replaying step 1's draws
    # (TrainingState.swift persists rngSeed for the same reason) — so the
    # PERSISTED seed wins over a changed YAML seed on resume.
    rng_seed = tstate.rng_seed if args.resume else cfg.seed
    if args.resume and rng_seed != cfg.seed:
        flog.warning(f"resume: using the checkpoint's rng_seed={rng_seed} (YAML seed differs)")
    base_key = jax.random.PRNGKey(rng_seed)
    # accumulated wall time survives resume (ETA = elapsed/step extrapolation)
    t_start = time.time() - (tstate.elapsed_s if args.resume else 0.0)
    val_dir = os.path.join(cfg.output_dir, "validation")
    val_ref_cache: dict = {}  # per-prompt I2I reference encodes, reused across passes
    val_emb_cache: dict = {}  # per-prompt embeddings (prompt set is run-constant)
    if args.resume and tstate.validation_scores:
        tracker.seed_from_history(tstate.validation_scores)

    with RuntimeBeacon("train-lora", model=cfg.model) as beacon:
        if val_enabled and not args.resume:
            # baseline images without the LoRA (SimpleLoRATrainer.swift:364-389)
            flog.info("generating baseline validation images (no LoRA)")
            baseline = run_validation(
                val_pipe, val_cfg, 0, embeddings_fn=val_pipe.encode_prompt,
                scorer=scorer, reference_images=ref_images, output_dir=val_dir,
                ref_cache=val_ref_cache, emb_cache=val_emb_cache,
            )
            for r in baseline:
                tstate.record_validation(0, r.scene, r.style, r.prompt)

        for step in range(tstate.step + 1, cfg.max_steps + 1):
            if controller.should_stop():
                flog.info("stop requested — checkpointing and exiting")
                break
            controller.wait_while_paused()

            k_step = jax.random.fold_in(base_key, step)
            rng = np.random.RandomState((rng_seed * 1_000_003 + step) % (2**32))
            batch = sample_batch(rng, bs)
            lora, opt_state, metrics = step_fn(lora, opt_state, batch, k_step)
            if tcfg.use_ema:
                ema = trainer.ema_update(ema, lora, tcfg.ema_decay)
            loss = float(metrics["loss"])
            tstate.step = step
            tstate.elapsed_s = time.time() - t_start
            tstate.record_loss(loss)
            beacon.update(phase="training", step=step, total_steps=cfg.max_steps)

            if step % max(1, cfg.log_every) == 0 or step == 1:
                eta = tstate.eta_seconds(cfg.max_steps)
                flog.info(f"step {step}/{cfg.max_steps} loss {loss:.4f} eta {eta and round(eta)}s")

            # train-loss plateau early stop on a 20-step moving average
            if cfg.early_stop_loss_patience > 0 and step % 20 == 0 and len(tstate.loss_history) >= 20:
                ma = float(np.mean(tstate.loss_history[-20:]))
                if ma < plateau_best - cfg.early_stop_min_delta:
                    plateau_best, plateau_bad = ma, 0
                else:
                    plateau_bad += 1
                    if plateau_bad >= cfg.early_stop_loss_patience:
                        flog.info(
                            f"early stop: loss plateau ({plateau_bad} checks without "
                            f"{cfg.early_stop_min_delta} improvement on the 20-step mean)"
                        )
                        break

            saved_path = None
            if (cfg.save_every > 0 and step % cfg.save_every == 0) or controller.consume_checkpoint_request():
                saved_path = _save(cfg, trainer, tstate, lora, opt_state, tcfg, step, ema=ema)
                write_learning_curve_svg(tstate.loss_history, os.path.join(cfg.output_dir, "learning_curve.svg"))

            if val_enabled and val_every > 0 and step % val_every == 0:
                # validate with the distilled sibling + current LoRA merged
                # (SimpleLoRATrainer.swift:1746-2409); EMA weights are the
                # evaluated ones when enabled
                eval_lora = ema if (tcfg.use_ema and ema is not None) else lora
                val_pipe.transformer_params = lora_mod.merge_into_params(
                    val_base, eval_lora, lora_scale
                )
                records = run_validation(
                    val_pipe, val_cfg, step, embeddings_fn=val_pipe.encode_prompt,
                    scorer=scorer, reference_images=ref_images, output_dir=val_dir,
                    ref_cache=val_ref_cache, emb_cache=val_emb_cache,
                )
                val_pipe.transformer_params = val_base
                for r in records:
                    tstate.record_validation(step, r.scene, r.style, r.prompt)
                stop_early = tracker.record(step, records)
                mean = float(np.mean([r.combined for r in records])) if records else 0.0
                flog.info(f"validation @ {step}: combined {mean:.2f} (best {tracker.best_score:.2f} @ {tracker.best_step})")
                if tracker.best_step == step:
                    if saved_path is None:
                        # validation improved at a non-save step: checkpoint
                        # now so `best/` always holds the scored weights
                        saved_path = _save(cfg, trainer, tstate, lora, opt_state, tcfg, step, ema=ema)
                    best_dir = os.path.join(cfg.output_dir, "best")
                    shutil.rmtree(best_dir, ignore_errors=True)
                    shutil.copytree(saved_path, best_dir)
                    flog.info(f"best checkpoint -> {best_dir}")
                if stop_early:
                    flog.info(
                        f"early stop: {cfg.early_stop_patience} non-improving validation(s)"
                    )
                    break

            if val_loss_fn is not None and val_every > 0 and step % val_every == 0:
                # held-out loss with the evaluated (EMA when enabled) weights
                eval_lora = ema if (tcfg.use_ema and ema is not None) else lora
                vloss = float(np.mean([
                    float(val_loss_fn(eval_lora, vb, jax.random.PRNGKey(cfg.validation_seed + i)))
                    for i, vb in enumerate(val_batches)
                ]))
                train_ma = (
                    float(np.mean(tstate.loss_history[-20:])) if tstate.loss_history else vloss
                )
                gap = vloss - train_ma
                tstate.record_val_loss(step, vloss, gap)
                flog.info(f"val loss @ {step}: {vloss:.4f} (train MA {train_ma:.4f}, gap {gap:+.4f})")
                stop = False
                if cfg.early_stop_on_overfit:
                    if gap > cfg.early_stop_max_val_gap:
                        gap_bad += 1
                        if gap_bad >= cfg.early_stop_gap_patience:
                            flog.info(
                                f"early stop: val-train gap {gap:.3f} > "
                                f"{cfg.early_stop_max_val_gap} for {gap_bad} check(s) (overfitting)"
                            )
                            stop = True
                    else:
                        gap_bad = 0
                if cfg.early_stop_on_val_stagnation:
                    if vloss < best_val - cfg.early_stop_min_val_improvement:
                        best_val, val_bad = vloss, 0
                    else:
                        val_bad += 1
                        if val_bad >= cfg.early_stop_val_stagnation_patience:
                            flog.info(f"early stop: val loss stagnant for {val_bad} check(s)")
                            stop = True
                if stop:
                    break

    _save(cfg, trainer, tstate, lora, opt_state, tcfg, tstate.step, ema=ema)
    write_learning_curve_svg(tstate.loss_history, os.path.join(cfg.output_dir, "learning_curve.svg"))
    flog.info(f"training done at step {tstate.step}; output in {cfg.output_dir}")


def _make_scorer(pipe):
    """VLM scene/style scorer when available, else the pixel-stat fallback
    averaged over the reference set (LoRAEvaluator.swift scoring)."""
    from flux2_tpu.cli.main import _pixel_scorer, _vlm_scorer

    vlm = _vlm_scorer(pipe)
    if vlm is not None:
        return vlm

    def scorer(image, refs, prompt):
        if not len(refs):
            return 0.0, 0.0
        pairs = [_pixel_scorer(image, r) for r in refs]
        return (
            float(np.mean([p[0] for p in pairs])),
            float(np.mean([p[1] for p in pairs])),
        )

    return scorer


def _save(cfg, trainer_mod, tstate, lora, opt_state, tcfg, step, ema=None):
    path = os.path.join(cfg.output_dir, f"checkpoint_{step:06d}")
    st = trainer_mod.TrainState(lora=lora, opt_state=opt_state, step=step, ema=ema)
    # ONE training_state.json: save_checkpoint writes its compat metadata
    # (rank/alpha/optimizer/lr) and the TrainingState fields ride in `extra`
    # — a second tstate.save() here used to clobber the metadata
    trainer_mod.save_checkpoint(path, st, tcfg, extra=dataclasses.asdict(tstate))
    print(f"checkpoint -> {path}")
    _prune_checkpoints(cfg, keep=path)
    return path


def _prune_checkpoints(cfg, keep: str) -> None:
    """keep_last_checkpoints > 0: delete all but the newest N checkpoint
    dirs (LoRATrainingConfig.swift:383). The `best/` copy is a separate
    directory and never pruned."""
    n = getattr(cfg, "keep_last_checkpoints", 0)
    if n <= 0:
        return
    def step_of(d: str) -> int:
        try:
            return int(d.split("_", 1)[1])
        except ValueError:
            return -1

    # numeric sort: lexicographic would mis-order steps past 999999
    dirs = sorted(
        (d for d in os.listdir(cfg.output_dir)
         if d.startswith("checkpoint_") and os.path.isdir(os.path.join(cfg.output_dir, d))),
        key=step_of,
    )
    for d in dirs[:-n]:
        full = os.path.join(cfg.output_dir, d)
        if os.path.abspath(full) != os.path.abspath(keep):
            shutil.rmtree(full, ignore_errors=True)


def write_learning_curve_svg(losses, path: str, width: int = 640, height: int = 240) -> None:
    """Loss-history SVG learning curve (SimpleLoRATrainer.swift:2421-2592)."""
    if not losses:
        return
    pad = 30
    xs = np.linspace(pad, width - pad, len(losses))
    lo, hi = min(losses), max(losses)
    rng = (hi - lo) or 1.0
    ys = [height - pad - (l - lo) / rng * (height - 2 * pad) for l in losses]
    points = " ".join(f"{x:.1f},{y:.1f}" for x, y in zip(xs, ys))
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">'
        f'<rect width="100%" height="100%" fill="#0d1117"/>'
        f'<polyline points="{points}" fill="none" stroke="#58a6ff" stroke-width="1.5"/>'
        f'<text x="{pad}" y="16" fill="#c9d1d9" font-size="11">loss {losses[-1]:.4f} '
        f"(min {lo:.4f}, {len(losses)} steps)</text></svg>"
    )
    with open(path, "w") as f:
        f.write(svg)
