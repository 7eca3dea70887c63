"""LoRA + trainer tests on tiny configs (hermetic, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.ops import latents as lu
from flux2_tpu.ops.rope import rope_embeddings
from flux2_tpu.training import lora as lora_mod
from flux2_tpu.training import trainer

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier

CONFIG = cfg.Flux2TransformerConfig(
    num_layers=1, num_single_layers=1, num_attention_heads=2,
    attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
)


@pytest.fixture(scope="module")
def base_params():
    return tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)


def _batch(b=2, s_txt=4, h=64, w=64):
    s_img = (h // 16) * (w // 16)
    ids = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))
    return {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (b, s_img, 128)),
        "embeddings": jax.random.normal(jax.random.PRNGKey(2), (b, s_txt, 96)),
        "rope_cos": cos,
        "rope_sin": sin,
    }


def test_lora_init_shapes(base_params):
    lora = lora_mod.init_lora(jax.random.PRNGKey(0), base_params, lora_mod.LoRAConfig(rank=4))
    a = lora["double_blocks"]["to_q"]["a"]
    b = lora["double_blocks"]["to_q"]["b"]
    assert a.shape == (1, CONFIG.inner_dim, 4)
    assert b.shape == (1, 4, CONFIG.inner_dim)
    np.testing.assert_array_equal(np.asarray(b), 0.0)  # identity at init


def test_lora_merge_identity_at_init(base_params):
    lora = lora_mod.init_lora(jax.random.PRNGKey(0), base_params, lora_mod.LoRAConfig(rank=4))
    merged = lora_mod.merge_into_params(base_params, lora, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(merged["double_blocks"]["to_q"]),
        np.asarray(base_params["double_blocks"]["to_q"]),
        atol=1e-7,
    )
    # untargeted leaves untouched
    assert merged["x_embedder"]["kernel"] is base_params["x_embedder"]["kernel"]


def test_lora_merge_math(base_params):
    lora = lora_mod.init_lora(jax.random.PRNGKey(0), base_params, lora_mod.LoRAConfig(rank=4))
    lora["double_blocks"]["to_q"]["b"] = jnp.ones_like(lora["double_blocks"]["to_q"]["b"])
    merged = lora_mod.merge_into_params(base_params, lora, scale=2.0)
    expected = np.asarray(base_params["double_blocks"]["to_q"]) + 2.0 * np.einsum(
        "lir,lro->lio",
        np.asarray(lora["double_blocks"]["to_q"]["a"]),
        np.asarray(lora["double_blocks"]["to_q"]["b"]),
    )
    np.testing.assert_allclose(np.asarray(merged["double_blocks"]["to_q"]), expected, atol=1e-5)


def test_timestep_samplers():
    key = jax.random.PRNGKey(0)
    for mode in ("uniform", "content", "style", "balanced"):
        s = trainer.sample_timesteps(key, 512, mode)
        arr = np.asarray(s)
        assert arr.shape == (512,)
        assert (arr >= 0).all() and (arr < 1.0).all()
    # content favors low t, style favors high t
    content = np.asarray(trainer.sample_timesteps(key, 2048, "content")).mean()
    style = np.asarray(trainer.sample_timesteps(key, 2048, "style")).mean()
    assert content < 0.35 and style > 0.65


def test_bell_weights():
    w = trainer.bell_weights(jnp.array([0.5]))  # t=500 -> peak 1.0
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-6)
    w0 = trainer.bell_weights(jnp.array([0.0]))  # t=0 -> exp(-0.5) ~ 0.6065
    np.testing.assert_allclose(np.asarray(w0), np.exp(-0.5), rtol=1e-5)


def test_train_step_reduces_loss(base_params):
    tcfg = trainer.TrainConfig(rank=4, alpha=4.0, learning_rate=5e-3, remat=False, timestep_sampling="uniform")
    state, opt = trainer.init_train_state(jax.random.PRNGKey(3), base_params, tcfg)
    step = trainer.make_train_step(base_params, CONFIG, tcfg, opt)
    batch = _batch()
    lora, opt_state = state.lora, state.opt_state
    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(8):
        lora, opt_state, metrics = step(lora, opt_state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same batch+noise -> loss must decrease
    assert float(metrics["grad_norm"]) >= 0


def test_grad_accumulation_matches_full_batch(base_params):
    """Accumulated micro-batch grads == full-batch grads (same total data)."""
    tcfg1 = trainer.TrainConfig(rank=4, alpha=4.0, remat=False, grad_accumulation=1, timestep_sampling="uniform")
    tcfg2 = dataclasses_replace(tcfg1, grad_accumulation=2)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(3), base_params, tcfg1)
    s1 = trainer.make_train_step(base_params, CONFIG, tcfg1, opt)
    s2 = trainer.make_train_step(base_params, CONFIG, tcfg2, opt)
    batch = _batch(b=4)
    _, _, m1 = s1(state.lora, state.opt_state, batch, jax.random.PRNGKey(0))
    _, _, m2 = s2(state.lora, state.opt_state, batch, jax.random.PRNGKey(0))
    # Different RNG structure (per-micro keys) -> losses differ, but both finite
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_dop_loss_zero_at_init(base_params):
    """At init (b=0) LoRA == base, so DOP loss must be exactly 0."""
    tcfg = trainer.TrainConfig(rank=4, alpha=4.0, remat=False)
    lora = lora_mod.init_lora(jax.random.PRNGKey(0), base_params, lora_mod.LoRAConfig(4, 4.0))
    batch = _batch()
    sig = jnp.array([0.5, 0.5])
    noise = jax.random.normal(jax.random.PRNGKey(9), batch["latents"].shape)
    d = trainer.dop_loss(
        base_params, lora, CONFIG, tcfg,
        batch["latents"], batch["embeddings"], noise, sig,
        batch["rope_cos"], batch["rope_sin"],
    )
    assert float(d) < 1e-10


def test_checkpoint_save_resume(base_params, tmp_path):
    tcfg = trainer.TrainConfig(rank=4, alpha=4.0, remat=False)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(3), base_params, tcfg)
    step = trainer.make_train_step(base_params, CONFIG, tcfg, opt)
    lora, opt_state, _ = step(state.lora, state.opt_state, _batch(), jax.random.PRNGKey(0))
    st = trainer.TrainState(lora=lora, opt_state=opt_state, step=1)
    path = str(tmp_path / "ckpt_000001")
    trainer.save_checkpoint(path, st, tcfg, extra={"loss": 1.0})
    assert os.path.exists(os.path.join(path, "lora.safetensors"))
    assert os.path.exists(os.path.join(path, "optimizer.safetensors"))
    restored = trainer.load_checkpoint(path, base_params, tcfg)
    assert restored.step == 1
    np.testing.assert_allclose(
        np.asarray(restored.lora["double_blocks"]["to_q"]["a"]),
        np.asarray(lora["double_blocks"]["to_q"]["a"]),
        atol=1e-6,
    )
    # optimizer state round-trips (full state — unlike the mlx-swift limitation)
    r_leaves = jax.tree_util.tree_leaves(restored.opt_state)
    o_leaves = jax.tree_util.tree_leaves(opt_state)
    assert len(r_leaves) == len(o_leaves)
    for r, o in zip(r_leaves, o_leaves):
        if hasattr(o, "shape") and getattr(o, "size", 0) > 0:
            np.testing.assert_allclose(np.asarray(r, np.float64), np.asarray(o, np.float64), atol=1e-6)


def dataclasses_replace(cfg_obj, **kw):
    import dataclasses

    return dataclasses.replace(cfg_obj, **kw)


def test_train_step_with_dop(base_params):
    """DOP regularization wired through the jitted train step."""
    tcfg = trainer.TrainConfig(rank=4, alpha=4.0, remat=False, dop_weight=0.5, timestep_sampling="uniform")
    state, opt = trainer.init_train_state(jax.random.PRNGKey(3), base_params, tcfg)
    step = trainer.make_train_step(base_params, CONFIG, tcfg, opt)
    batch = _batch()
    batch["dop_embeddings"] = jax.random.normal(jax.random.PRNGKey(5), batch["embeddings"].shape)
    lora, opt_state, metrics = step(state.lora, state.opt_state, batch, jax.random.PRNGKey(0))
    # at init LoRA == base -> dop loss must be ~0; after an update it grows
    assert float(metrics["dop_loss"]) < 1e-8
    lora, opt_state, metrics2 = step(lora, opt_state, batch, jax.random.PRNGKey(1))
    assert float(metrics2["dop_loss"]) > 0
    assert np.isfinite(float(metrics2["loss"]))


def test_mx_formats_in_model_forward(base_params):
    """mxfp8 weights run through the full DiT forward."""
    from flux2_tpu.ops import quant
    from flux2_tpu.ops import latents as lu2
    from flux2_tpu.ops.rope import rope_embeddings as re2

    qparams = quant.quantize_params(base_params, "mxfp8", min_size=1024)
    ids = np.concatenate([lu2.text_position_ids(4), lu2.image_position_ids(64, 64)], axis=0)
    cos, sin = re2(jnp.asarray(ids))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 128))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 96))
    ref = tfm.forward(base_params, CONFIG, hidden, txt, jnp.array([0.5]), cos, sin)
    out = tfm.forward(qparams, CONFIG, hidden, txt, jnp.array([0.5]), cos, sin)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / (np.abs(np.asarray(ref)).mean() + 1e-9)
    assert rel < 0.2, rel  # fp8 weights stay in the ballpark


def test_train_step_with_bf16_base_params():
    """Mixed-precision training: bf16 base weights + f32 LoRA masters.

    Regression for the img/txt stream-dtype split (f32 noisy input vs bf16
    context embeddings broke the scan carry when base params were bf16)."""
    base = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.bfloat16)
    tcfg = trainer.TrainConfig(rank=4, alpha=4.0, remat=True)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(1), base, tcfg)
    step_fn = trainer.make_train_step(base, CONFIG, tcfg, opt)
    batch = _batch()
    lora, opt_state, m = step_fn(state.lora, state.opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    # LoRA masters stay f32 through the update
    leaf = jax.tree_util.tree_leaves(lora)[0]
    assert leaf.dtype == jnp.float32


# ---------------------------------------------------------------------------
# Round-3 trainer depth: unmerged LoRA forward, LR schedules, EMA, samplers,
# target-layer selection
# ---------------------------------------------------------------------------


def test_unmerged_lora_forward_matches_merged(base_params):
    """transformer.forward(lora=...) == forward(merge_into_params(...))."""
    lc = lora_mod.LoRAConfig(rank=4, alpha=8.0)
    lora = lora_mod.init_lora(jax.random.PRNGKey(0), base_params, lc)
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(9), x.shape), lora
    )
    b = _batch(b=1)
    t = jnp.asarray([0.5])
    merged = lora_mod.merge_into_params(base_params, lora, lc.scale)
    y_merged = tfm.forward(
        merged, CONFIG, b["latents"], b["embeddings"], t, b["rope_cos"], b["rope_sin"]
    )
    y_unmerged = tfm.forward(
        base_params, CONFIG, b["latents"], b["embeddings"], t, b["rope_cos"], b["rope_sin"],
        lora=lora, lora_scale=lc.scale,
    )
    y_base = tfm.forward(
        base_params, CONFIG, b["latents"], b["embeddings"], t, b["rope_cos"], b["rope_sin"]
    )
    assert float(jnp.abs(y_merged - y_base).max()) > 1e-3  # LoRA has an effect
    np.testing.assert_allclose(np.asarray(y_unmerged), np.asarray(y_merged), atol=2e-5)
    # remat path agrees too
    y_r = tfm.forward(
        base_params, CONFIG, b["latents"], b["embeddings"], t, b["rope_cos"], b["rope_sin"],
        lora=lora, lora_scale=lc.scale, remat=True,
    )
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_merged), atol=2e-5)


def test_train_step_never_materializes_base_cotangent(base_params):
    """The jitted step's HLO must not bake base weights in as constants
    (captured multi-GB constants were the round-3 compile/OOM bug)."""
    tcfg = trainer.TrainConfig(rank=2, alpha=2.0, remat=True)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(0), base_params, tcfg)
    step = trainer.make_train_step(base_params, CONFIG, tcfg, opt)
    import warnings

    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        lora, _, m = step(state.lora, state.opt_state, _batch(b=1), jax.random.PRNGKey(3))
    assert not any("constants were captured" in str(w.message) for w in wlist)
    assert np.isfinite(float(m["loss"]))


def test_lr_schedules():
    base = 1e-4
    for name in ("constant", "linear", "cosine", "cosine_with_restarts"):
        tc = trainer.TrainConfig(learning_rate=base, lr_scheduler=name, warmup_steps=10, total_steps=110)
        sched = trainer.lr_schedule(tc)
        assert float(sched(0)) == 0.0  # warmup starts at 0
        np.testing.assert_allclose(float(sched(10)), base, rtol=1e-6)  # warmup peak
        if name == "constant":
            np.testing.assert_allclose(float(sched(110)), base, rtol=1e-6)
        elif name in ("linear", "cosine"):
            assert float(sched(110)) < 1e-6  # decayed to ~0 at the horizon
        else:  # restarts: LR comes back up after each cycle boundary
            per = (110 - 10) // 3
            end_c1 = float(sched(10 + per - 1))
            start_c2 = float(sched(10 + per + 1))
            assert start_c2 > end_c1 + base / 2


def test_sample_timesteps_logit_normal_and_flux_shift():
    key = jax.random.PRNGKey(0)
    ln = trainer.sample_timesteps(key, 4096, "logit_normal", logit_mean=0.0, logit_std=1.0)
    assert float(ln.min()) >= 0.0 and float(ln.max()) <= 0.999
    assert abs(float(ln.mean()) - 0.5) < 0.02  # sigmoid of centered normal
    ln_hi = trainer.sample_timesteps(key, 4096, "logit_normal", logit_mean=1.0)
    assert float(ln_hi.mean()) > float(ln.mean()) + 0.1  # mean shifts the mass

    fs1 = trainer.sample_timesteps(key, 4096, "flux_shift", shift=1.0)
    u = jax.random.uniform(key, (4096,))  # shift=1 is the identity map
    np.testing.assert_allclose(np.asarray(fs1), np.clip(np.asarray(u), 0, 0.999), atol=1e-6)
    fs3 = trainer.sample_timesteps(key, 4096, "flux_shift", shift=3.0)
    assert float(fs3.mean()) > float(fs1.mean()) + 0.1  # shift>1 skews high


def test_ema_update_and_checkpoint_roundtrip(base_params, tmp_path):
    tcfg = trainer.TrainConfig(rank=2, alpha=2.0, use_ema=True, ema_decay=0.9)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(0), base_params, tcfg)
    assert state.ema is not None
    bumped = jax.tree_util.tree_map(lambda x: x + 1.0, state.lora)
    ema = trainer.ema_update(state.ema, bumped, tcfg.ema_decay)
    leaf = jax.tree_util.tree_leaves(ema)[0]
    init_leaf = jax.tree_util.tree_leaves(state.ema)[0]
    np.testing.assert_allclose(
        np.asarray(leaf), 0.9 * np.asarray(init_leaf) + 0.1 * (np.asarray(init_leaf) + 1.0),
        rtol=1e-6,
    )
    st = trainer.TrainState(lora=bumped, opt_state=state.opt_state, step=7, ema=ema)
    trainer.save_checkpoint(str(tmp_path / "ck"), st, tcfg)
    assert (tmp_path / "ck" / "lora_ema.safetensors").exists()
    restored = trainer.load_checkpoint(str(tmp_path / "ck"), base_params, tcfg)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.ema)[0]), np.asarray(leaf), rtol=1e-6
    )


def test_target_layers_attention_only(base_params):
    tcfg = trainer.TrainConfig(rank=2, alpha=2.0, target_layers="attention")
    state, _ = trainer.init_train_state(jax.random.PRNGKey(0), base_params, tcfg)
    assert "to_q" in state.lora["double_blocks"]
    assert "ff_in" not in state.lora["double_blocks"]
    assert "mlp_gate" not in state.lora["single_blocks"]
    # and the step trains only those leaves
    opt = trainer.make_optimizer(tcfg)
    step = trainer.make_train_step(base_params, CONFIG, tcfg, opt)
    lora, _, m = step(state.lora, state.opt_state, _batch(b=1), jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))


def test_qlora_train_step_on_quantized_base():
    """QLoRA-style: the unmerged LoRA trains against a QTensor (qint8) base
    (TrainingQuantization, LoRATrainingConfig.swift:9-34)."""
    from flux2_tpu.ops import quant

    base = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.bfloat16)
    qbase = quant.quantize_params(base, "qint8")
    tcfg = trainer.TrainConfig(rank=4, alpha=4.0, remat=True)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(1), qbase, tcfg)
    step = trainer.make_train_step(qbase, CONFIG, tcfg, opt)
    b = _batch(b=1)
    lora, ost, m = step(state.lora, state.opt_state, b, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss"])) and float(m["grad_norm"]) > 0
    # the zero-initialized b leaves received real gradient updates
    b_leaf = lora["double_blocks"]["to_q"]["b"]
    assert float(jnp.abs(b_leaf).max()) > 0


def test_dop_with_control_rope(base_params):
    """I2I control training + DOP together: the batch rope covers
    [txt ; img ; control] positions but dop_loss forwards only [txt ; img]
    — it must slice the rope instead of crashing on a shape mismatch."""
    b, s_txt, h, w = 2, 4, 64, 64
    s_img = (h // 16) * (w // 16)
    ids = np.concatenate([
        lu.text_position_ids(s_txt),
        lu.image_position_ids(h, w),
        lu.reference_image_position_ids([h // 16], [w // 16]),  # control LAST
    ], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (b, s_img, 128)),
        "embeddings": jax.random.normal(jax.random.PRNGKey(2), (b, s_txt, 96)),
        "control": jax.random.normal(jax.random.PRNGKey(3), (b, s_img, 128)),
        "dop_embeddings": jax.random.normal(jax.random.PRNGKey(4), (b, s_txt, 96)),
        "rope_cos": cos,
        "rope_sin": sin,
    }
    tcfg = trainer.TrainConfig(rank=2, alpha=2.0, remat=False, dop_weight=0.5)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(0), base_params, tcfg)
    step = trainer.make_train_step(base_params, CONFIG, tcfg, opt)
    _, _, m = step(state.lora, state.opt_state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["dop_loss"]))


def test_snr_weights():
    """Min-SNR-gamma (v-pred): high weight at low sigma, clamped; ->0 as
    sigma->1; implemented though the reference only CLI-surfaces "snr"."""
    s = jnp.asarray([0.1, 0.5, 0.9])
    w = trainer.snr_weights(s, gamma=5.0)
    # sigma=0.1 -> SNR=81 -> min(81,5)/82
    np.testing.assert_allclose(float(w[0]), 5.0 / 82.0, rtol=1e-5)
    # sigma=0.5 -> SNR=1 -> min(1,5)/2
    np.testing.assert_allclose(float(w[1]), 0.5, rtol=1e-5)
    assert float(w[2]) < float(w[1])  # high noise downweighted
    # loss path runs with snr weighting
    base = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)
    tcfg = trainer.TrainConfig(rank=2, alpha=2.0, loss_weighting="snr", remat=False)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(1), base, tcfg)
    step = trainer.make_train_step(base, CONFIG, tcfg, opt)
    _, _, m = step(state.lora, state.opt_state, _batch(b=1), jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))


def test_make_eval_loss_deterministic(base_params):
    tcfg = trainer.TrainConfig(rank=2, alpha=2.0, remat=False)
    state, _ = trainer.init_train_state(jax.random.PRNGKey(0), base_params, tcfg)
    ev = trainer.make_eval_loss(base_params, CONFIG, tcfg)
    b = _batch(b=1)
    l1 = float(ev(state.lora, b, jax.random.PRNGKey(7)))
    l2 = float(ev(state.lora, b, jax.random.PRNGKey(7)))
    assert l1 == l2 and np.isfinite(l1)


def test_merge_into_params_quantized_base(base_params):
    """QLoRA validation merge: QTensor leaves dequantize -> add -> requantize
    (same format), staying quantized instead of crashing on .astype."""
    from flux2_tpu.ops import quant

    qbase = quant.quantize_params(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), base_params), "qint8"
    )
    lora = lora_mod.init_lora(jax.random.PRNGKey(0), qbase, lora_mod.LoRAConfig(rank=4))
    lora["double_blocks"]["to_q"]["b"] = jnp.ones_like(lora["double_blocks"]["to_q"]["b"]) * 0.01
    merged = lora_mod.merge_into_params(qbase, lora, scale=1.0)
    w = merged["double_blocks"]["to_q"]
    assert isinstance(w, quant.QTensor) and w.format == "qint8"
    # the delta survived the requantize roundtrip
    before = quant.dequantize(qbase["double_blocks"]["to_q"], jnp.float32)
    after = quant.dequantize(w, jnp.float32)
    delta = np.einsum(
        "lir,lro->lio",
        np.asarray(lora["double_blocks"]["to_q"]["a"]),
        np.asarray(lora["double_blocks"]["to_q"]["b"]),
    )
    err = np.abs((np.asarray(after) - np.asarray(before)) - delta)
    assert err.max() < 0.01  # within int8 quantization noise
