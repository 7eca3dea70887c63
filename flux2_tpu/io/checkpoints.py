"""Top-level checkpoint loading + prequantized export.

Parity targets:
  - ``Loading/WeightLoader.swift:14-50`` — multi-file safetensors loading
    (all ``*.safetensors`` in a directory, or an index json).
  - ``Loading/PrequantizedCheckpoint.swift`` — export/load of natively
    quantized weights at ``<model>/tpu-prequantized/<fmt>/transformer.safetensors``
    with: source fingerprint (name/size/mtime), payload-completeness check
    before any mutation, validate-before-mutate key/shape checks, atomic
    save, and LoRA-baked tagging.

Flattening convention: pytree paths join with ``/``; QTensor leaves expand
to ``<path>##q``, ``<path>##scale``, ``<path>##bias`` with the static fields
recorded in the file metadata under ``quant:<path>``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.io import safetensors_io
from flux2_tpu.ops.quant import QTensor

PREQUANT_DIRNAME = "tpu-prequantized"


# ---------------------------------------------------------------------------
# Directory loading (raw checkpoints)
# ---------------------------------------------------------------------------


def load_weights_dir(path: str) -> Dict[str, np.ndarray]:
    """Merge all safetensors files in a directory into one flat dict."""
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files in {path}")
    weights: Dict[str, np.ndarray] = {}
    for f in files:
        weights.update(safetensors_io.load_file(os.path.join(path, f)))
    return weights


# ---------------------------------------------------------------------------
# Pytree <-> flat tensors (with QTensor support)
# ---------------------------------------------------------------------------


def flatten_pytree(params: Any) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    flat: Dict[str, np.ndarray] = {}
    meta: Dict[str, str] = {}

    def visit(path: str, node: Any):
        if isinstance(node, QTensor):
            flat[path + "##q"] = np.asarray(node.q)
            flat[path + "##scale"] = np.asarray(node.scale)
            if node.bias is not None:
                flat[path + "##bias"] = np.asarray(node.bias)
            meta["quant:" + path] = json.dumps(
                {"format": node.format, "group_size": node.group_size, "orig_in": node.orig_in}
            )
        elif isinstance(node, dict):
            for k, v in node.items():
                visit(f"{path}/{k}" if path else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(f"{path}/{i}", v)
        else:
            flat[path] = np.asarray(node)

    visit("", params)
    return flat, meta


def unflatten_to_like(flat: Dict[str, np.ndarray], meta: Dict[str, str], template: Any) -> Any:
    """Rebuild a pytree with the TEMPLATE's structure from flat tensors.

    Validates every leaf exists with matching shape BEFORE returning
    (validate-before-mutate, PrequantizedCheckpoint.swift:150+).
    """

    def visit(path: str, node: Any):
        if isinstance(node, dict):
            return {k: visit(f"{path}/{k}" if path else k, v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [visit(f"{path}/{i}", v) for i, v in enumerate(node)]
        qmeta = meta.get("quant:" + path)
        if qmeta is not None:
            info = json.loads(qmeta)
            bias = flat.get(path + "##bias")
            return QTensor(
                jnp.asarray(flat[path + "##q"]),
                jnp.asarray(flat[path + "##scale"]),
                jnp.asarray(bias) if bias is not None else None,
                info["format"],
                info["group_size"],
                info["orig_in"],
            )
        if path + "##q" in flat:  # quantized on disk, template unquantized: fine
            info = _infer_quant_info(meta, path)
            bias = flat.get(path + "##bias")
            return QTensor(
                jnp.asarray(flat[path + "##q"]),
                jnp.asarray(flat[path + "##scale"]),
                jnp.asarray(bias) if bias is not None else None,
                **info,
            )
        if path not in flat:
            raise KeyError(f"checkpoint missing tensor: {path}")
        arr = flat[path]
        if hasattr(node, "shape") and tuple(arr.shape) != tuple(node.shape):
            raise ValueError(f"shape mismatch at {path}: ckpt {arr.shape} vs model {node.shape}")
        dtype = node.dtype if hasattr(node, "dtype") else arr.dtype
        return jnp.asarray(arr).astype(dtype)

    return visit("", template)


def load_flat_pytree(flat: Dict[str, np.ndarray], meta: Dict[str, str]) -> Any:
    """Rebuild a pytree purely from flat keys (no template)."""
    tree: Dict[str, Any] = {}
    qpaths = {k[len("quant:"):] for k in meta if k.startswith("quant:")}

    def insert(path: str, value):
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    done = set()
    for key in flat:
        base = key.split("##")[0]
        if base in done:
            continue
        if base in qpaths:
            info = json.loads(meta["quant:" + base])
            bias = flat.get(base + "##bias")
            insert(
                base,
                QTensor(
                    jnp.asarray(flat[base + "##q"]),
                    jnp.asarray(flat[base + "##scale"]),
                    jnp.asarray(bias) if bias is not None else None,
                    info["format"],
                    info["group_size"],
                    info["orig_in"],
                ),
            )
            done.add(base)
        elif "##" not in key:
            insert(key, jnp.asarray(flat[key]))
            done.add(base)
    return tree


def _infer_quant_info(meta: Dict[str, str], path: str) -> dict:
    raise KeyError(f"quantization metadata missing for {path}")


# ---------------------------------------------------------------------------
# Prequantized export / load
# ---------------------------------------------------------------------------


def source_fingerprint(source_dir: str) -> str:
    """name/size/mtime fingerprint of the source checkpoint files
    (PrequantizedCheckpoint.swift:92-105)."""
    parts = []
    for f in sorted(os.listdir(source_dir)):
        if f.endswith(".safetensors"):
            st = os.stat(os.path.join(source_dir, f))
            parts.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
    return "|".join(parts)


def prequantized_path(model_dir: str, fmt: str) -> str:
    return os.path.join(model_dir, PREQUANT_DIRNAME, fmt, "transformer.safetensors")


def export_prequantized(
    params: Any,
    model_dir: str,
    fmt: str,
    source_dir: Optional[str] = None,
    lora_baked: bool = False,
) -> str:
    """Atomically export a (quantized) parameter pytree."""
    path = prequantized_path(model_dir, fmt)
    flat, meta = flatten_pytree(params)
    meta["format"] = fmt
    meta["lora_baked"] = "1" if lora_baked else "0"
    if source_dir and os.path.isdir(source_dir):
        meta["source_fingerprint"] = source_fingerprint(source_dir)
    safetensors_io.save_file(flat, path, metadata=meta)
    return path


def load_prequantized(
    path: str,
    expected_source_dir: Optional[str] = None,
) -> Tuple[Any, Dict[str, str]]:
    """Load a prequantized checkpoint with full integrity validation.

    Raises on truncated payloads (before touching any state) and on source
    fingerprint mismatch when expected_source_dir is given.
    """
    if not safetensors_io.payload_is_complete(path):
        raise ValueError(f"prequantized checkpoint payload incomplete: {path}")
    meta = safetensors_io.load_metadata(path)
    if expected_source_dir and meta.get("source_fingerprint"):
        current = source_fingerprint(expected_source_dir)
        if current != meta["source_fingerprint"]:
            raise ValueError(
                "prequantized checkpoint is stale: source checkpoint changed "
                f"since export ({path})"
            )
    flat = safetensors_io.load_file(path)
    return load_flat_pytree(flat, meta), meta
