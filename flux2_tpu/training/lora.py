"""LoRA adapters for the FLUX.2 DiT: init, merge, target selection.

Capability parity with the reference's inference-side LoRA
(``Sources/Flux2Core/LoRA/LoRALoader.swift``, merge semantics
``WeightLoader.swift:736-856``: W += scale * (B @ A)) and the training-side
injection (``Training/Model/LoRALinear.swift:117-197``): adapters target the
attention Q/K/V(+added)/out projections and FFN projections of double blocks
and the fused projections of single blocks; embedders and modulation layers
are intentionally NOT adapted.

TPU-first shape: because DiT weights are stacked per layer ([L, in, out]),
one LoRA leaf pair covers ALL layers of a kind: a [L, in, r], b [L, r, out].
``b`` initializes to zeros so training starts at the identity; ``a`` uses
uniform Kaiming-style init (LoRALinear.swift:20-60).

Two application modes:
  - ``merge_into_params``: returns params with W + scale*(a@b) folded in —
    the inference path (load -> merge -> generate).
  - UNMERGED: the trainer passes the LoRA pytree to
    ``transformer.forward(lora=...)`` which computes y = x@W + s*(x@a)@b
    per target (transformer._lmm) — backward never materializes an
    [in,out] cotangent (merged training needs base-sized f32 gradients,
    more HBM than a chip for full-width DiTs) and the base may be a
    quantized QTensor (QLoRA-style, LoRATrainingConfig.swift:9-34).
  - scale can be recomputed per-adapter: scale = alpha / rank * user_scale
    (LoRALoader.swift:75-94).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flux2_tpu.utils.rngs import key_iter

Params = Dict[str, Any]

# DiT leaves that take LoRA adapters, keyed (block_group, leaf).
DEFAULT_TARGETS: Tuple[Tuple[str, str], ...] = (
    ("double_blocks", "to_q"),
    ("double_blocks", "to_k"),
    ("double_blocks", "to_v"),
    ("double_blocks", "to_out"),
    ("double_blocks", "add_q"),
    ("double_blocks", "add_k"),
    ("double_blocks", "add_v"),
    ("double_blocks", "add_out"),
    ("double_blocks", "ff_in"),
    ("double_blocks", "ff_out"),
    ("double_blocks", "ff_ctx_in"),
    ("double_blocks", "ff_ctx_out"),
    ("single_blocks", "to_q"),
    ("single_blocks", "to_k"),
    ("single_blocks", "to_v"),
    ("single_blocks", "mlp_gate"),
    ("single_blocks", "mlp_up"),
    ("single_blocks", "out_attn"),
    ("single_blocks", "out_mlp"),
)

ATTENTION_ONLY_TARGETS: Tuple[Tuple[str, str], ...] = tuple(
    t for t in DEFAULT_TARGETS if t[1] not in ("ff_in", "ff_out", "ff_ctx_in", "ff_ctx_out", "mlp_gate", "mlp_up", "out_mlp")
)


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 16.0
    targets: Tuple[Tuple[str, str], ...] = DEFAULT_TARGETS

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def init_lora(
    key: jax.Array,
    params: Params,
    config: LoRAConfig,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """LoRA pytree mirroring the targeted leaves: {group: {leaf: {a, b}}}."""
    lora: Params = {}
    keys = key_iter(key, len(config.targets))
    for group, leaf in config.targets:
        w = params[group][leaf]  # [L, in, out]
        if hasattr(w, "shape"):
            nl, d_in, d_out = w.shape
        else:  # QTensor base (QLoRA-style training on a quantized model)
            nl, d_in, d_out = w.q.shape[0], w.orig_in, w.q.shape[-1]
        bound = 1.0 / (d_in**0.5)
        a = jax.random.uniform(next(keys), (nl, d_in, config.rank), jnp.float32, -bound, bound)
        b = jnp.zeros((nl, config.rank, d_out), jnp.float32)
        lora.setdefault(group, {})[leaf] = {"a": a.astype(dtype), "b": b.astype(dtype)}
    return lora


def _merge_qtensor_slicewise(w, delta, scale: float):
    """dequantize -> add -> requantize a stacked QTensor leaf ONE LAYER AT A
    TIME (``lax.map`` over the stacked axis): the dense f32 transient is a
    single [K, N] slice, never the whole [L, K, N] stack — a Dev-32B
    whole-stack transient OOMs a 16 GB chip (same rationale as
    ``ops.quant._requant_slicewise``)."""
    from flux2_tpu.ops import quant

    aux = (w.format, w.group_size, w.orig_in)
    if w.q.ndim == 2:
        dense = quant.dequantize(w, jnp.float32) + scale * delta
        return quant.quantize(dense, w.format, group_size=w.group_size)

    lead = w.q.shape[: w.q.ndim - 2]

    def merge2d(children):
        qs, ss, bs, d = children
        dense = quant.dequantize(quant.QTensor(qs, ss, bs, *aux), jnp.float32)
        nq = quant.quantize(dense + scale * d, w.format, group_size=w.group_size)
        return nq.q, nq.scale, nq.bias

    flat = (
        w.q.reshape(-1, *w.q.shape[len(lead):]),
        w.scale.reshape(-1, *w.scale.shape[len(lead):]),
        None if w.bias is None else w.bias.reshape(-1, *w.bias.shape[len(lead):]),
        delta.reshape(-1, *delta.shape[delta.ndim - 2:]),
    )
    q, s, b = jax.lax.map(merge2d, flat)
    return quant.QTensor(
        q.reshape(*lead, *q.shape[1:]),
        s.reshape(*lead, *s.shape[1:]),
        None if b is None else b.reshape(*lead, *b.shape[1:]),
        *aux,
    )


def merge_into_params(params: Params, lora: Params, scale: float) -> Params:
    """Return params with W' = W + scale * (a @ b) on every adapted leaf.

    Matches the reference merge W += scale*(B@A) (WeightLoader.swift:793-819;
    the transpose difference is layout only — weights here are [in, out]).

    QTensor leaves (quantized/QLoRA bases) merge via a per-leaf
    dequantize -> add -> REQUANTIZE roundtrip (same format/group size), so
    merged validation/inference keeps the quantized HBM footprint; the
    transient dense leaf exists one at a time.
    """
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    merged = {**out}
    for group, leaves in lora.items():
        new_group = dict(merged[group])
        for leaf, ab in leaves.items():
            w = new_group[leaf]
            delta = jnp.einsum("lir,lro->lio", ab["a"].astype(jnp.float32), ab["b"].astype(jnp.float32))
            if hasattr(w, "astype"):
                new_group[leaf] = (w.astype(jnp.float32) + scale * delta).astype(w.dtype)
            else:
                from flux2_tpu.ops import quant

                if not isinstance(w, quant.QTensor):
                    raise TypeError(
                        f"cannot merge LoRA into runtime-format leaf {group}/{leaf} "
                        f"({type(w).__name__}); merge into the storage-format or "
                        "bf16 params before converting to w8a8/w4a8"
                    )
                new_group[leaf] = _merge_qtensor_slicewise(w, delta, scale)
        merged[group] = new_group
    return merged


def num_lora_params(lora: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(lora))


def lora_zeros_like(lora: Params) -> Params:
    return jax.tree_util.tree_map(jnp.zeros_like, lora)
