"""Pipeline parallelism (GPipe over the stacked DiT blocks) on the 8-device
virtual CPU mesh. Exactness against the dense ``transformer.forward`` is the
contract: same block functions, same math, different schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.ops import latents as lu
from flux2_tpu.ops.rope import rope_embeddings
from flux2_tpu.parallel import pipeline as pp
from flux2_tpu.training import lora as lora_mod

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier

CONFIG = cfg.Flux2TransformerConfig(
    num_layers=2,
    num_single_layers=4,
    num_attention_heads=2,
    attention_head_dim=128,
    joint_attention_dim=96,
    guidance_embeds=False,
)


def _inputs(batch, h=64, w=64, s_txt=8):
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    s_img = (h // 16) * (w // 16)
    hidden = jax.random.normal(ks[0], (batch, s_img, 128), jnp.float32)
    txt = jax.random.normal(ks[1], (batch, s_txt, CONFIG.joint_attention_dim), jnp.float32)
    t = jax.random.uniform(ks[2], (batch,), jnp.float32, 0.1, 0.9)
    ids = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))
    return hidden, txt, t, cos, sin


def test_make_pp_mesh_layouts():
    m = pp.make_pp_mesh(pp=4, data=2)
    assert m.shape == {"data": 2, "pp": 4}
    # pp_over_dcn strides the stage axis across contiguous device groups:
    # stage s of data-group g is device [s*data + g] instead of [g*pp + s],
    # so each stage's devices sit inside one slice-major group.
    m_dcn = pp.make_pp_mesh(pp=4, data=2, pp_over_dcn=True)
    ids = np.vectorize(lambda d: d.id)(m_dcn.devices)
    assert ids[0].tolist() == [0, 2, 4, 6]  # data row 0 walks across groups
    with pytest.raises(ValueError):
        pp.make_pp_mesh(pp=3, data=2)


def test_pp_param_sharding_specs():
    params = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)
    mesh = pp.make_pp_mesh(pp=4, data=2)
    sh = pp.pp_param_sharding(mesh, params)
    assert sh["double_blocks"]["to_q"].spec == P("pp")
    assert sh["single_blocks"]["out_mlp"].spec == P("pp")
    assert sh["x_embedder"]["kernel"].spec == P()


def test_pipelined_forward_matches_dense():
    params = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)
    hidden, txt, t, cos, sin = _inputs(batch=8)
    dense = tfm.forward(params, CONFIG, hidden, txt, t, cos, sin)

    mesh = pp.make_pp_mesh(pp=2, data=4)
    params_pp = jax.device_put(params, pp.pp_param_sharding(mesh, params))
    hidden_d = jax.device_put(hidden, NamedSharding(mesh, P("data")))

    piped = jax.jit(
        lambda p, h, tx, ts: pp.pipelined_forward(
            p, CONFIG, h, tx, ts, cos, sin, mesh=mesh
        )
    )(params_pp, hidden_d, txt, t)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(dense), atol=2e-5)

    # more microbatches than stages (the bubble-shrinking regime); smaller
    # data axis so the microbatch size stays divisible
    mesh4 = pp.make_pp_mesh(pp=2, data=2, devices=jax.devices()[:4])
    piped4 = jax.jit(
        lambda p, h, tx, ts: pp.pipelined_forward(
            p, CONFIG, h, tx, ts, cos, sin, mesh=mesh4, num_microbatches=4
        )
    )(params, hidden, txt, t)
    np.testing.assert_allclose(np.asarray(piped4), np.asarray(dense), atol=2e-5)


def test_pipelined_forward_with_lora_and_grads():
    """LoRA adapters ride the pipeline (stacked [L,...] leaves shard over pp
    like the base weights) and jax.grad through the tick scan reproduces the
    dense gradients — the property that makes pp usable for training."""
    devices = jax.devices()[:4]
    mesh = pp.make_pp_mesh(pp=2, data=2, devices=devices)
    params = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)
    lcfg = lora_mod.LoRAConfig(
        rank=2, alpha=4.0,
        targets=(("double_blocks", "to_q"), ("single_blocks", "mlp_gate")),
    )
    lora = lora_mod.init_lora(jax.random.PRNGKey(1), params, lcfg)
    # b inits to zeros (grad wrt a would vanish); randomize for a real check
    lora = jax.tree.map(lambda x: jax.random.normal(jax.random.PRNGKey(2), x.shape) * 0.02, lora)
    hidden, txt, t, cos, sin = _inputs(batch=4)

    def dense_loss(lo):
        out = tfm.forward(params, CONFIG, hidden, txt, t, cos, sin, lora=lo, lora_scale=lcfg.scale)
        return jnp.sum(out**2)

    def piped_loss(lo):
        out = pp.pipelined_forward(
            params, CONFIG, hidden, txt, t, cos, sin,
            mesh=mesh, lora=lo, lora_scale=lcfg.scale, remat=True,
        )
        return jnp.sum(out**2)

    l_dense, g_dense = jax.value_and_grad(dense_loss)(lora)
    l_piped, g_piped = jax.jit(jax.value_and_grad(piped_loss))(lora)
    np.testing.assert_allclose(float(l_piped), float(l_dense), rtol=1e-6)
    for (pa, a), (pb, bz) in zip(
        jax.tree_util.tree_leaves_with_path(g_dense),
        jax.tree_util.tree_leaves_with_path(g_piped),
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(bz), np.asarray(a), atol=3e-4, err_msg=str(pa))


def test_pipelined_forward_pp_tp_matches_dense():
    """Tensor parallelism INSIDE pipeline stages: the (data, pp, tp) mesh
    keeps pp/data manual while the stage body stays GSPMD-auto over tp, so
    the stacked weights' column/row shardings drive tensor-parallel stage
    matmuls. Exact vs dense."""
    mesh = pp.make_pp_mesh(pp=2, data=2, tp=2)
    assert mesh.shape == {"data": 2, "pp": 2, "tp": 2}
    params = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)
    hidden, txt, t, cos, sin = _inputs(batch=8)
    dense = tfm.forward(params, CONFIG, hidden, txt, t, cos, sin)

    params_pp = jax.device_put(params, pp.pp_param_sharding(mesh, params))
    # layer axis on pp + feature dims on tp (column for QKV, row for out)
    assert params_pp["double_blocks"]["to_q"].sharding.spec == P("pp", None, "tp")
    assert params_pp["double_blocks"]["to_out"].sharding.spec == P("pp", "tp", None)
    assert params_pp["single_blocks"]["out_mlp"].sharding.spec == P("pp", "tp", None)

    piped = jax.jit(
        lambda p, h, tx, ts: pp.pipelined_forward(
            p, CONFIG, h, tx, ts, cos, sin, mesh=mesh
        )
    )(params_pp, hidden, txt, t)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(dense), atol=5e-5)


def test_pp_tp_mesh_layouts():
    m = pp.make_pp_mesh(pp=2, data=2, tp=2, pp_over_dcn=True)
    ids = np.vectorize(lambda d: d.id)(m.devices)
    # stage-major groups: stage s owns contiguous devices [s*4, s*4+4), so
    # its tp collectives stay inside that group's ICI
    assert sorted(ids[:, 0, :].ravel().tolist()) == [0, 1, 2, 3]
    assert sorted(ids[:, 1, :].ravel().tolist()) == [4, 5, 6, 7]
    with pytest.raises(ValueError):
        pp.make_pp_mesh(pp=2, data=2, tp=3)


def test_dev32b_pp_tp_fit_proof():
    """Dev-32B bf16 fits v5e-8 as pp=4 x tp=2: per-device parameter bytes
    computed analytically from the pp_param_sharding specs (the XLA:CPU
    bf16+partial-auto miscompile — see the knowledge note — rules out an
    AOT compile here; argument bytes are a pure function of the specs).
    The dense bf16 model (~64 GB) is 4x a 16 GB chip; pp=4 x tp=2 puts
    ~1/8 of the stacked weights on each device."""
    mesh = pp.make_pp_mesh(
        pp=4, data=1, tp=2, devices=jax.devices()[:8]
    )
    dev_cfg = cfg.FLUX2_DEV
    assert dev_cfg.num_layers % 4 == 0 and dev_cfg.num_single_layers % 4 == 0

    shapes = jax.eval_shape(
        lambda k: tfm.init_params(k, dev_cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    shardings = pp.pp_param_sharding(mesh, shapes)

    def per_device_bytes(leaf, sharding):
        n = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        for ax in sharding.spec:
            if ax is not None:
                n //= mesh.shape[ax]
        return n

    total = sum(
        per_device_bytes(l, s)
        for l, s in zip(jax.tree_util.tree_leaves(shapes), jax.tree_util.tree_leaves(shardings))
    )
    dense = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize for l in jax.tree_util.tree_leaves(shapes)
    )
    assert dense / 1e9 > 50.0  # the dense model really is way over one chip
    per_gb = total / 1e9
    assert per_gb < 12.0, f"{per_gb:.2f} GB/device leaves no activation headroom"


def test_train_step_with_pp_forward_matches_dense():
    """trainer.make_train_step(forward_fn=make_pp_forward(mesh)) — the
    composition cli/train.run_training uses for ``pp: N`` — produces the
    same loss and updated LoRA as the dense step (same key => same
    sigmas/noise draws)."""
    from flux2_tpu.training import trainer

    mesh = pp.make_pp_mesh(pp=2, data=2, devices=jax.devices()[:4])
    params = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)
    tcfg = trainer.TrainConfig(rank=2, alpha=4.0, remat=True, grad_accumulation=1)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(1), params, tcfg)

    hidden, txt, _, cos, sin = _inputs(batch=4)
    batch = {"latents": hidden, "embeddings": txt, "rope_cos": cos, "rope_sin": sin}
    key = jax.random.PRNGKey(5)

    dense_step = trainer.make_train_step(params, CONFIG, tcfg, opt)
    lora_d, _, met_d = dense_step(state.lora, state.opt_state, batch, key)

    pp_params = jax.device_put(params, pp.pp_param_sharding(mesh, params))
    pp_step = trainer.make_train_step(
        pp_params, CONFIG, tcfg, opt, forward_fn=pp.make_pp_forward(mesh)
    )
    lora_p, _, met_p = pp_step(state.lora, state.opt_state, batch, key)

    np.testing.assert_allclose(float(met_p["loss"]), float(met_d["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(lora_d), jax.tree_util.tree_leaves(lora_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_qlora_train_step_through_pp():
    """QLoRA composes with pp: a qint8 QTensor base shards its
    codes/scales over the pp layer axis (QTensor children inherit the
    stacked leaves' placement) and the unmerged LoRA trains through the
    pipelined forward."""
    from flux2_tpu.ops import quant
    from flux2_tpu.training import trainer

    mesh = pp.make_pp_mesh(pp=2, data=2, devices=jax.devices()[:4])
    base = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.bfloat16)
    qbase = quant.quantize_params(base, "qint8", min_size=1 << 10)
    assert any(
        isinstance(l, quant.QTensor)
        for l in jax.tree_util.tree_leaves(
            qbase, is_leaf=lambda l: isinstance(l, quant.QTensor)
        )
    )
    qbase = jax.device_put(qbase, pp.pp_param_sharding(mesh, qbase))
    tcfg = trainer.TrainConfig(rank=2, alpha=2.0, remat=True, grad_accumulation=1)
    state, opt = trainer.init_train_state(jax.random.PRNGKey(1), qbase, tcfg)
    step = trainer.make_train_step(qbase, CONFIG, tcfg, opt, forward_fn=pp.make_pp_forward(mesh))

    hidden, txt, _, cos, sin = _inputs(batch=4)
    batch = {"latents": hidden, "embeddings": txt, "rope_cos": cos, "rope_sin": sin}
    lora, _, m = step(state.lora, state.opt_state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["loss"]))
    # zero-initialized b leaves received real gradient updates
    assert float(jnp.abs(lora["double_blocks"]["to_q"]["b"]).max()) > 0


def test_pipelined_forward_validation_errors():
    mesh = pp.make_pp_mesh(pp=2, data=4)
    params = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)
    hidden, txt, t, cos, sin = _inputs(batch=8)
    with pytest.raises(ValueError, match="microbatches"):
        pp.pipelined_forward(params, CONFIG, hidden, txt, t, cos, sin, mesh=mesh, num_microbatches=3)
    odd = cfg.Flux2TransformerConfig(
        num_layers=3, num_single_layers=4, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    with pytest.raises(ValueError, match="divide"):
        pp.pipelined_forward(params, odd, hidden, txt, t, cos, sin, mesh=mesh)
