"""GSPMD partition rules for flux2-tpu parameter pytrees.

Sharding is expressed as (path-regex -> PartitionSpec) rules resolved against
``jax.tree_util`` key paths, then applied as ``NamedSharding`` constraints —
the single entry point for distributing any model here (DiT, VAE, text
encoders). XLA then inserts the collectives (all-gather for fsdp weights,
psum for tp row-parallel matmuls) over ICI.

DiT layout (per SURVEY.md §2.6 / §7-4):
  - column-parallel (shard output features over tp): Q/K/V projections
    (= attention-head sharding, since inner = heads x head_dim), MLP
    gate/up projections.
  - row-parallel (shard input features over tp): attention/MLP output
    projections -> one psum per block.
  - everything 2D also shards its *other* axis over fsdp so weights-at-rest
    scale with the full mesh.
  - modulation/embedding/norm leaves replicate over tp (tiny).

The stacked-layer leading axis (lax.scan) stays unsharded.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flux2_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, TP_AXIS

Rules = Sequence[Tuple[str, P]]


# --- FLUX.2 DiT -----------------------------------------------------------

# NOTE: leaf paths look like "double_blocks/to_q" (stacked [L, in, out]) or
# "x_embedder/kernel" ([in, out]). Specs below include the leading layer axis
# for stacked leaves.
DIT_RULES: Rules = (
    # stacked double-stream blocks [L, in, out]
    (r"double_blocks/(to_q|to_k|to_v|add_q|add_k|add_v)$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"double_blocks/(to_out|add_out)$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"double_blocks/(ff_in|ff_ctx_in)$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"double_blocks/(ff_out|ff_ctx_out)$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"double_blocks/norm_", P(None, None)),
    # stacked single-stream blocks
    (r"single_blocks/(to_q|to_k|to_v|mlp_gate|mlp_up)$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"single_blocks/(out_attn|out_mlp)$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"single_blocks/norm_", P(None, None)),
    # embedders / modulation: shard the big input dim over fsdp only
    (r"(x_embedder|context_embedder)/kernel$", P(FSDP_AXIS, TP_AXIS)),
    (r"(time_embed|guidance_embed)/linear1$", P(None, FSDP_AXIS)),
    (r"(time_embed|guidance_embed)/linear2$", P(FSDP_AXIS, None)),
    (r"(double_mod_img|double_mod_txt|single_mod)/kernel$", P(FSDP_AXIS, None)),
    (r"norm_out/kernel$", P(FSDP_AXIS, None)),
    (r"proj_out/kernel$", P(TP_AXIS, None)),
)

# --- Text encoders (Mistral / Qwen3) ---------------------------------------

DECODER_RULES: Rules = (
    (r"embed_tokens$", P(TP_AXIS, FSDP_AXIS)),
    (r"layers/(q_proj|k_proj|v_proj)$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"layers/o_proj$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"layers/(gate_proj|up_proj)$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"layers/down_proj$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"layers/(input_norm|post_attn_norm|q_norm|k_norm)$", P(None, None)),
    (r"final_norm$", P(None)),
    (r"lm_head$", P(FSDP_AXIS, TP_AXIS)),
)

# --- VAE: small; replicate -------------------------------------------------

VAE_RULES: Rules = ()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_str: str, rules: Rules) -> P:
    # Quantized weights (QTensor / W8A8 / W4A8) are pytrees whose children
    # append a flat-index segment to the leaf path; the parent's rule
    # applies to every child (codes/scale/bias keep the dense leaf's rank,
    # and make_shardings drops axes whose dim doesn't divide — e.g. the
    # size-1 scale rows).
    path_str = re.sub(r"/\[<flat index \d+>\]$", "", path_str)
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            return spec
    return P()  # replicate by default


def make_shardings(params: Any, mesh: Mesh, rules: Rules) -> Any:
    """NamedSharding pytree matching ``params``, resolved from rules.

    A rule whose spec has more axes than a leaf has dims falls back to
    replication for safety; specs naming mesh axes of size 1 are fine.
    """

    def resolve(path, leaf):
        spec = spec_for_path(_path_str(path), rules)
        if len(spec) > leaf.ndim:
            spec = P()
        # Drop axes whose shard size doesn't divide the dim.
        fixed = []
        for i, axis in enumerate(spec):
            if axis is None:
                fixed.append(None)
                continue
            size = mesh.shape[axis]
            fixed.append(axis if leaf.shape[i] % size == 0 else None)
        return NamedSharding(mesh, P(*fixed) if fixed else P())

    return jax.tree_util.tree_map_with_path(resolve, params)


def shard_params(params: Any, mesh: Mesh, rules: Rules) -> Any:
    """Device-put params with rule-derived shardings."""
    shardings = make_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def activation_sharding(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
