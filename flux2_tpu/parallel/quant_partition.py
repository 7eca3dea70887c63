"""GSPMD partitioning rules for the W8A8 int8-MXU matmul.

A ``pallas_call`` is opaque to the SPMD partitioner: under a mesh, XLA's
only safe choice is to fully replicate (all-gather) the sharded quantized
codes before every matmul — defeating weight sharding at runtime. This
module wraps the W8A8 matmul in ``jax.experimental.custom_partitioning``:

  - q's N (output) dim sharded -> COLUMN-parallel: every shard computes
    x @ q_shard on its N slice, result stays N-sharded, no collective.
    Any K-dim sharding (fsdp) is stripped — one all-gather of int8 codes,
    half the bytes of the equivalent dense-bf16 fsdp gather.
  - else q's K dim sharded -> ROW-parallel: x's contraction dim shards the
    same way, each shard computes a partial product, and the rule inserts
    ONE psum over the K axes (the Megatron pattern, int8 kernel inside).
  - neither -> replicated body.

Leading x dims keep their sharding (data-parallel batch, sp-sharded
tokens), so the rules compose with batch/context parallelism. Enabled via
``flux2_tpu.ops.quant.set_partitioned_runtime(True)`` (Flux2Pipeline.shard
turns it on automatically).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _impl(x, q, scale):
    """Per-shard body: the regular W8A8 path (kernel on TPU, dequant else)."""
    from flux2_tpu.ops import quant, quant_kernels

    w = quant.W8A8Tensor(q, scale, q.shape[-2])
    if jax.default_backend() == "tpu" and quant_kernels.w8a8_supported(x, w):
        return quant_kernels.w8a8_matmul(x, w)
    return x @ quant.dequantize_w8a8(w, dtype=x.dtype)


def _spec_of(shape) -> Tuple:
    s = getattr(shape, "sharding", None)
    spec = tuple(getattr(s, "spec", ()) or ())
    ndim = len(shape.shape)
    return spec + (None,) * (ndim - len(spec))


def _axes(entry) -> Tuple:
    if entry is None:
        return ()
    return tuple(entry) if isinstance(entry, (tuple, list)) else (entry,)


def _infer_sharding(mesh, arg_shapes, result_shape):
    x_spec = _spec_of(arg_shapes[0])
    q_spec = _spec_of(arg_shapes[1])
    if _axes(q_spec[-1]):  # column-parallel: result N-sharded
        out_last = q_spec[-1]
    else:  # row-parallel or replicated: result N replicated
        out_last = None
    return NamedSharding(mesh, P(*x_spec[:-1], out_last))


def _partition(mesh, arg_shapes, result_shape):
    x_spec = _spec_of(arg_shapes[0])
    q_spec = _spec_of(arg_shapes[1])
    n_axes = _axes(q_spec[-1])
    k_axes = _axes(q_spec[-2])

    if n_axes:
        # column-parallel: strip K sharding, keep N; no collective.
        x_sharding = NamedSharding(mesh, P(*x_spec[:-1], None))
        q_sharding = NamedSharding(mesh, P(None, q_spec[-1]))
        s_sharding = NamedSharding(mesh, P(None, q_spec[-1]))
        out_sharding = NamedSharding(mesh, P(*x_spec[:-1], q_spec[-1]))
        lower_fn = _impl
    elif k_axes:
        # row-parallel: x contraction dim sharded like q's K; psum at end.
        x_sharding = NamedSharding(mesh, P(*x_spec[:-1], q_spec[-2]))
        q_sharding = NamedSharding(mesh, P(q_spec[-2], None))
        s_sharding = NamedSharding(mesh, P(None, None))
        out_sharding = NamedSharding(mesh, P(*x_spec[:-1], None))

        def lower_fn(x, q, scale):
            return jax.lax.psum(_impl(x, q, scale), k_axes)

    else:
        # replicated weights: keep x's sharding on leading dims only.
        x_sharding = NamedSharding(mesh, P(*x_spec[:-1], None))
        q_sharding = NamedSharding(mesh, P(None, None))
        s_sharding = NamedSharding(mesh, P(None, None))
        out_sharding = NamedSharding(mesh, P(*x_spec[:-1], None))
        lower_fn = _impl

    return mesh, lower_fn, out_sharding, (x_sharding, q_sharding, s_sharding)


def _sharding_rule(mesh, value_types, result_types):
    """Shardy einsum-like rule, built per call from the x rank:
    ``d0 .. k, k n, u n -> d0 .. n`` with k a reduction factor."""
    rank = len(value_types[0].shape)
    lead = " ".join(f"d{i}" for i in range(rank - 1))
    rule = f"{lead} k, k n, u n -> {lead} n"
    return rule, {"reduction_factors": ("k",)}


_w8a8_partitioned = custom_partitioning(_impl)
_w8a8_partitioned.def_partition(
    infer_sharding_from_operands=_infer_sharding,
    partition=_partition,
    sharding_rule=_sharding_rule,
)


def w8a8_matmul_partitioned(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x [.., K] @ W8A8Tensor[K, N] with SPMD-native partitioning."""
    return _w8a8_partitioned(x, w.q, w.scale)


# --- W4A8: column-parallel only -------------------------------------------
#
# The packed codes' row dim is K/2 and the scale rows are K/block — neither
# maps 1:1 onto x's contraction factor, so the rule simply forbids sharding
# them (need_replication) and keeps the N (column) factor shardable. That
# covers the DiT layout's qkv/MLP-in projections; K-sharded (row-parallel)
# W4A8 weights gather at int4 width, which is already a 4x smaller
# collective than dense bf16.


def _impl_w4(x, q, scale, *, block, orig_in):
    from flux2_tpu.ops import quant, quant_kernels

    w = quant.W4A8Tensor(q, scale, block, orig_in)
    if jax.default_backend() == "tpu" and quant_kernels.w4a8_supported(x, w):
        return quant_kernels.w4a8_matmul(x, w)
    return x @ quant.dequantize_w4a8(w, dtype=x.dtype)


def _infer_sharding_w4(mesh, arg_shapes, result_shape):
    x_spec = _spec_of(arg_shapes[0])
    q_spec = _spec_of(arg_shapes[1])
    return NamedSharding(mesh, P(*x_spec[:-1], q_spec[-1]))


def _partition_w4(block, orig_in, mesh, arg_shapes, result_shape):
    x_spec = _spec_of(arg_shapes[0])
    q_spec = _spec_of(arg_shapes[1])
    x_sharding = NamedSharding(mesh, P(*x_spec[:-1], None))
    q_sharding = NamedSharding(mesh, P(None, q_spec[-1]))
    s_sharding = NamedSharding(mesh, P(None, q_spec[-1]))
    out_sharding = NamedSharding(mesh, P(*x_spec[:-1], q_spec[-1]))

    def lower_fn(x, q, scale):
        return _impl_w4(x, q, scale, block=block, orig_in=orig_in)

    return mesh, lower_fn, out_sharding, (x_sharding, q_sharding, s_sharding)


def _sharding_rule_w4(block, orig_in, mesh, value_types, result_types):
    rank = len(value_types[0].shape)
    lead = " ".join(f"d{i}" for i in range(rank - 1))
    rule = f"{lead} e, f n, g n -> {lead} n"
    return rule, {"need_replication_factors": ("e", "f", "g")}


# block/orig_in are static per weight — one custom_partitioning instance is
# built (and cached) per distinct (block, orig_in), closing over them so the
# partitioned callable sees array args only.
_W4_CACHE = {}


def w4a8_matmul_partitioned(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x [.., K] @ W4A8Tensor[K, N] with SPMD-native column partitioning."""
    import functools

    key = (w.block, w.orig_in)
    fn = _W4_CACHE.get(key)
    if fn is None:
        block, orig_in = key

        def impl(x, q, scale):
            return _impl_w4(x, q, scale, block=block, orig_in=orig_in)

        fn = custom_partitioning(impl)
        fn.def_partition(
            infer_sharding_from_operands=_infer_sharding_w4,
            partition=functools.partial(_partition_w4, block, orig_in),
            sharding_rule=functools.partial(_sharding_rule_w4, block, orig_in),
        )
        _W4_CACHE[key] = fn
    return fn(x, w.q, w.scale)
