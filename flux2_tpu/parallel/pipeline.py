"""Pipeline parallelism (GPipe) over the scan-stacked DiT blocks.

The reference is single-device (SURVEY.md §2.6) — like the rest of
``flux2_tpu.parallel`` this is a new TPU-first subsystem, not a port. It
completes the parallelism matrix: data / fsdp / tp / sp (existing) + **pp**
(this module). Expert parallelism is deliberately absent: FLUX.2 has no
MoE layers anywhere (dense SwiGLU FFNs only, Flux2FeedForward.swift:42-108),
so there is nothing to shard over an ``ep`` axis.

Where pp fits on TPU
--------------------
Within one slice, tensor/fsdp/sequence sharding beat pipelining (XLA
collectives ride full-bandwidth ICI and there is no bubble). Pipelining
earns its keep **across slices**, where only DCN connects device groups:
a pipeline stage boundary moves ONE microbatch activation per tick
point-to-point, the cheapest possible inter-slice traffic pattern —
vs fsdp/tp, whose per-layer all-gathers/psums would saturate DCN. The
intended deployment is therefore ``pp`` = slice axis for multi-slice LoRA
training, with ``data`` (and, inside each stage, tp/fsdp via the existing
mesh) riding ICI. See also make_multislice_mesh (mesh.py), which solves
the same problem with pure data parallelism when the global batch is big
enough; pp is the answer when it is not (model-parallel scale-out).

Design
------
The DiT stores each block stack as stacked per-layer arrays (leading axis
= layer, ``transformer.init_params``), which makes stage assignment a
*sharding* of the layer axis: stage ``p`` holds layers
``[p*L/P, (p+1)*L/P)`` of a stack — no parameter surgery, just
``PartitionSpec("pp")`` on the leading dim. The forward pipelines the two
stacks back-to-back (double-stream, then single-stream); prelude
(embedders, time/guidance embed, modulations) and the AdaLN head are
replicated — they are <0.1% of FLOPs.

Schedule: classic GPipe. The batch splits into M microbatches; a
``lax.scan`` over ``M + P - 1`` ticks runs inside ``shard_map``; each tick
every stage applies its local layers to its current microbatch and
``ppermute``s the activation to the next stage. Bubble fraction is
``(P-1)/(M+P-1)`` — choose M ≥ P (the default M = P gives ≤ 50%;
M = 4P gives ≤ 20%). Per-sample conditioning (the AdaLN modulation
tensors) travels WITH its microbatch through the pipeline as part of the
carry pytree. Backward (``jax.grad`` straight through) replays the tick
scan in reverse — GPipe's all-forward-then-all-backward schedule with
per-block rematerialization available via ``remat=``.

Exactness: the pipelined forward computes bit-identical math to
``transformer.forward`` (same block functions), verified in
tests/test_pipeline_parallel.py on an 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.flux2.config import Flux2TransformerConfig
from ..models.flux2 import transformer as tfm

PP_AXIS = "pp"
DATA_AXIS = "data"
TP_AXIS = "tp"


def make_pp_mesh(
    pp: int,
    data: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    pp_over_dcn: bool = False,
) -> Mesh:
    """A (data, pp[, tp]) mesh for pipelined training.

    ``tp > 1`` adds a tensor-parallel axis INSIDE each pipeline stage: the
    stage body stays GSPMD-*auto* over tp (``pipeline_scan`` marks only
    pp/data as manual), so XLA shards the per-stage block matmuls over the
    head/hidden dims and inserts the psums — the standard column/row layout
    of ``sharding.DIT_RULES`` — while the GPipe tick schedule stays manual.
    Use when one stage's parameters exceed a chip (e.g. Dev-32B bf16 at
    pp=4 is ~16 GB/stage).

    ``pp_over_dcn=True`` lays stages across the slice boundary (stage axis
    strides over slice-major device order) so each stage — including its
    tp group — lives inside one slice's ICI and only the microbatch
    hand-off crosses DCN. Default (False) keeps stages contiguous, correct
    for single-slice meshes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if pp * data * tp != n:
        raise ValueError(f"pp*data*tp = {pp}*{data}*{tp} != {n} devices")
    if tp == 1:
        if pp_over_dcn:
            arr = np.asarray(devices).reshape(pp, data).T  # stage strides across groups
        else:
            arr = np.asarray(devices).reshape(data, pp)
        return Mesh(arr, (DATA_AXIS, PP_AXIS))
    if pp_over_dcn:
        # stage-major groups: stage s holds a contiguous (data*tp) block, so
        # its tp collectives ride that block's ICI
        arr = np.asarray(devices).reshape(pp, data, tp).transpose(1, 0, 2)
    else:
        arr = np.asarray(devices).reshape(data, pp, tp)
    return Mesh(arr, (DATA_AXIS, PP_AXIS, TP_AXIS))


def pp_param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """NamedShardings placing each block stack's layer axis on ``pp``.

    Stacked leaves under double_blocks/single_blocks get ``P("pp", ...)``;
    everything else (embedders, modulation kernels, head) is replicated.
    When the mesh has a ``tp`` axis (>1), stacked weight matrices also get
    the column/row tensor-parallel placement from ``sharding.DIT_RULES``
    on their feature dims (the stage body is GSPMD-auto over tp).
    Apply with ``jax.device_put(params, pp_param_sharding(mesh, params))``.
    """
    tp = mesh.shape.get(TP_AXIS, 1)

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "double_blocks" not in names and "single_blocks" not in names:
            return NamedSharding(mesh, P())
        if tp == 1:
            return NamedSharding(mesh, P(PP_AXIS))
        from . import sharding as sh

        spec = sh.spec_for_path(sh._path_str(path), sh.DIT_RULES)
        # rules are (layer, in, out): pin the layer axis to pp, keep tp
        # placements, drop fsdp (absent from this mesh), honor divisibility
        axes = [PP_AXIS]
        for i, ax in enumerate(list(spec)[1:], start=1):
            if ax == TP_AXIS and i < leaf.ndim and leaf.shape[i] % tp == 0:
                axes.append(TP_AXIS)
            else:
                axes.append(None)
        return NamedSharding(mesh, P(*axes[: max(1, leaf.ndim)]))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def pipeline_scan(stage_fn, stacked, microbatches, per_mb, consts, mesh: Mesh, axis: str = PP_AXIS):
    """Run ``stage_fn`` as a GPipe pipeline over the ``axis`` mesh dim.

    - ``stage_fn(stacked_local, carry, mbc, consts) -> carry`` applies one
      stage's local layers (leaves of ``stacked_local`` are ``[L/P, ...]``).
    - ``stacked``: pytree of stacked per-layer arrays, leading dim L with
      ``L % P == 0``; sharded over ``axis`` on dim 0.
    - ``microbatches``: pytree of ``[M, Bm, ...]`` activations; the batch
      dim (axis 1) is sharded over ``data``. ONLY this pytree rides the
      ppermute chain and the final psum.
    - ``per_mb``: pytree of ``[M, Bm, ...]`` per-microbatch conditioning
      (e.g. AdaLN modulations) that stages READ but never transform. It is
      pp-replicated, so every stage indexes the entry for the microbatch it
      is processing at tick ``t`` (microbatch ``t - p``) locally instead of
      shipping it stage-to-stage — no ppermute/psum traffic for it.
    - ``consts``: replicated pytree (e.g. RoPE tables) passed through.

    Returns the carry pytree ``[M, Bm, ...]`` after all L layers, with the
    same (data-sharded, pp-replicated) layout as the input.

    Memory note: every stage keeps the full microbatch set resident plus
    the per-tick carry stack — the same O(M) activation footprint GPipe
    always has. Use ``remat`` inside ``stage_fn`` for the per-layer state.
    """
    n_stages = mesh.shape[axis]
    m = jax.tree_util.tree_leaves(microbatches)[0].shape[0]
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def _stage(stacked_local, mb, mbc, consts_local):
        p = jax.lax.axis_index(axis)
        state = jax.tree.map(lambda x: jnp.zeros_like(x[0]), mb)

        def tick(state, t):
            # stage 0 injects microbatch t (bubble ticks re-feed the last
            # one — computed then discarded); later stages consume what the
            # previous stage ppermuted to them last tick.
            inj = jax.tree.map(lambda x: x[jnp.minimum(t, m - 1)], mb)
            cur = jax.tree.map(lambda a, b: jnp.where(p == 0, a, b), inj, state)
            # stage p processes microbatch t-p at tick t (clamped copies on
            # fill/drain ticks are computed then discarded)
            idx = jnp.clip(t - p, 0, m - 1)
            mbc_t = jax.tree.map(lambda x: x[idx], mbc)
            out = stage_fn(stacked_local, cur, mbc_t, consts_local)
            nxt = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm), out)
            return nxt, out

        _, outs = jax.lax.scan(tick, state, jnp.arange(m + n_stages - 1))
        # Stage P-1 emits microbatch t-(P-1) at tick t: its valid outputs
        # are ticks [P-1, P-1+M). Zero elsewhere + psum replicates them.
        y = jax.tree.map(lambda x: x[n_stages - 1 : n_stages - 1 + m], outs)
        on_last = p == n_stages - 1
        y = jax.tree.map(lambda x: jnp.where(on_last, x, jnp.zeros_like(x)), y)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), y)

    mb_spec = jax.tree.map(lambda _: P(None, DATA_AXIS), microbatches)
    return jax.shard_map(
        _stage,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(axis), stacked),
            mb_spec,
            jax.tree.map(lambda _: P(None, DATA_AXIS), per_mb),
            jax.tree.map(lambda _: P(), consts),
        ),
        out_specs=mb_spec,
        # Manual ONLY over the pipeline axes; any further mesh axis (tp)
        # stays GSPMD-auto inside the stage body, so per-stage matmuls run
        # tensor-parallel off the weights' shardings with XLA's psums.
        axis_names={DATA_AXIS, axis},
        check_vma=False,
    )(stacked, microbatches, per_mb, consts)


def make_pp_forward(mesh: Mesh, num_microbatches: Optional[int] = None):
    """A ``transformer.forward``-compatible callable routed through
    ``pipelined_forward`` on ``mesh`` — the drop-in ``forward_fn`` for
    ``trainer.make_train_step`` / ``make_eval_loss`` (pp training). Expects
    the base params already placed per ``pp_param_sharding(mesh, ...)``."""

    def fwd(params, config, hidden, txt, timestep, cos, sin,
            guidance=None, remat=False, lora=None, lora_scale=1.0):
        return pipelined_forward(
            params, config, hidden, txt, timestep, cos, sin,
            guidance=guidance, mesh=mesh, num_microbatches=num_microbatches,
            remat=remat, lora=lora, lora_scale=lora_scale,
        )

    return fwd


def pipelined_forward(
    params,
    config: Flux2TransformerConfig,
    hidden_states: jnp.ndarray,  # [B, S_img, 128]
    encoder_hidden_states: jnp.ndarray,  # [B, S_txt, joint_dim]
    timestep: jnp.ndarray,  # [B]
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    remat: "bool | str" = False,
    lora=None,
    lora_scale: float = 1.0,
) -> jnp.ndarray:
    """``transformer.forward`` with both block stacks pipelined over ``pp``.

    Same arithmetic as the dense forward (identical block functions); the
    two stacks run as two chained GPipe pipelines (the double→single
    boundary is a hard dependency, so chaining costs one extra fill/drain
    rather than complicating stage assignment across heterogeneous
    blocks). Requires ``num_layers % pp == 0 and num_single_layers % pp
    == 0`` and ``batch % num_microbatches == 0``.
    """
    n_stages = mesh.shape[PP_AXIS]
    b = hidden_states.shape[0]
    m = num_microbatches if num_microbatches is not None else n_stages
    if b % m:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    n_data = mesh.shape.get(DATA_AXIS, 1)
    if (b // m) % n_data:
        raise ValueError(
            f"microbatch size {b // m} not divisible by data axis {n_data} "
            f"(batch {b} / {m} microbatches)"
        )
    if config.num_layers % n_stages or config.num_single_layers % n_stages:
        raise ValueError(
            f"block stacks ({config.num_layers} double, {config.num_single_layers} "
            f"single) must divide by pp={n_stages}"
        )
    nh = config.num_attention_heads
    s_txt = encoder_hidden_states.shape[1]

    img, txt, temb, img_mod, txt_mod, single_mod = tfm._prelude(
        params, config, hidden_states, encoder_hidden_states, timestep, guidance
    )
    consts = (rope_cos.astype(jnp.float32), rope_sin.astype(jnp.float32))

    def mb_split(x):
        return x.reshape(m, b // m, *x.shape[1:])

    lora_d = lora.get("double_blocks") if lora is not None else None
    lora_s = lora.get("single_blocks") if lora is not None else None

    def double_stage(stacked, carry, mbc, consts):
        cos, sin = consts

        def body(c, xs):
            bp, lp = xs if lora_d is not None else (xs, None)
            fn = tfm._remat_wrap(
                functools.partial(tfm.double_block, num_heads=nh, lora_scale=lora_scale),
                remat,
            )
            i, t = fn(bp, c[0], c[1], mbc["img_mod"], mbc["txt_mod"], cos, sin, lp=lp)
            return (i, t), None

        (i, t), _ = jax.lax.scan(body, (carry["img"], carry["txt"]), stacked)
        return {"img": i, "txt": t}

    stacked_d = (params["double_blocks"], lora_d) if lora_d is not None else params["double_blocks"]
    out = pipeline_scan(
        double_stage,
        stacked_d,
        {"img": mb_split(img), "txt": mb_split(txt)},
        {"img_mod": mb_split(img_mod), "txt_mod": mb_split(txt_mod)},
        consts,
        mesh,
    )

    x = jnp.concatenate([out["txt"], out["img"]], axis=2)  # [M, Bm, S, D]

    def single_stage(stacked, carry, mbc, consts):
        cos, sin = consts

        def body(c, xs):
            bp, lp = xs if lora_s is not None else (xs, None)
            fn = tfm._remat_wrap(
                functools.partial(tfm.single_block, num_heads=nh, lora_scale=lora_scale),
                remat,
            )
            return fn(bp, c, mbc["mod"], cos, sin, lp=lp), None

        y, _ = jax.lax.scan(body, carry["x"], stacked)
        return {"x": y}

    stacked_s = (params["single_blocks"], lora_s) if lora_s is not None else params["single_blocks"]
    out = pipeline_scan(
        single_stage, stacked_s, {"x": x}, {"mod": mb_split(single_mod)}, consts, mesh
    )

    x = out["x"].reshape(b, *out["x"].shape[2:])
    return tfm._final(params, temb, x[:, s_txt:])
