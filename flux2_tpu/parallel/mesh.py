"""Device mesh construction for flux2-tpu.

The reference is strictly single-device (SURVEY.md §2.6); parallelism is a
new first-class subsystem here. One mesh, four axes:

  - ``data``: data parallelism (batch > 1 generation, LoRA training).
  - ``fsdp``: weight sharding for the 32B DiT / 24B encoder (ZeRO-3 style —
    parameters sharded at rest, all-gathered per layer by XLA).
  - ``tp``  : tensor parallelism inside each DiT block (attention heads and
    MLP hidden sharded; XLA inserts the psum on the row-parallel output
    projections).
  - ``sp``  : sequence (context) parallelism — the joint token axis sharded
    for ring attention on very long multi-reference sequences. Size 1 unless
    requested; keeping it separate from ``tp`` avoids the head-sharded ↔
    seq-sharded layout flip (an involuntary full reshard) at the ring's
    shard_map boundary.

Axes are sized so ``data * fsdp * tp * sp == len(devices)``; collectives
ride ICI when the mesh is built from a contiguous slice (jax's default
device order). ``sp`` is innermost so ring ppermute hops are
nearest-neighbor.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TP_AXIS = "tp"
SP_AXIS = "sp"
AXIS_NAMES = (DATA_AXIS, FSDP_AXIS, TP_AXIS, SP_AXIS)


def make_mesh(
    data: int = 1,
    fsdp: int = 1,
    tp: int = -1,
    sp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp, tp, sp) mesh. ``-1`` sizes one axis from the rest."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [data, fsdp, tp, sp]
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by fixed axes {known}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} does not cover {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, AXIS_NAMES)


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    dev = device if device is not None else jax.devices()[0]
    return Mesh(np.asarray([dev]).reshape(1, 1, 1, 1), AXIS_NAMES)


def best_mesh_for_inference(n_devices: Optional[int] = None) -> Mesh:
    """Default inference layout: all devices on tp (batch-1 latency)."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    return make_mesh(data=1, fsdp=1, tp=n, devices=devices[:n])


def make_multislice_mesh(
    num_slices: int,
    fsdp: int = 1,
    tp: int = -1,
    sp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Multi-slice layout: ``data`` rides DCN, model axes ride ICI.

    The scaling-book recipe for TPU pods connected over data-center network:
    only the lowest-bandwidth-tolerant axis (pure data parallelism — one
    gradient/psum per step, or fully independent serving batches) crosses
    the slice boundary; fsdp/tp/sp collectives (per-layer all-gathers, per-
    block psums, ring ppermutes) stay inside a slice's ICI.

    Devices are grouped by ``slice_index`` when the runtime exposes it
    (real multi-slice jobs); otherwise the device list is split into
    ``num_slices`` contiguous groups (virtual/CPU meshes) — jax orders
    devices slice-major, so contiguous groups match slice boundaries.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % num_slices:
        raise ValueError(f"{n} devices not divisible into {num_slices} slices")
    per_slice = n // num_slices
    if any(hasattr(d, "slice_index") and d.slice_index is not None for d in devices):
        devices = sorted(devices, key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
    ordered = np.asarray(devices).reshape(num_slices, per_slice)

    sizes = [fsdp, tp, sp]
    if sizes.count(-1) > 1:
        raise ValueError("at most one of fsdp/tp/sp may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if per_slice % known:
            raise ValueError(f"{per_slice} devices/slice not divisible by {known}")
        sizes[sizes.index(-1)] = per_slice // known
    if int(np.prod(sizes)) != per_slice:
        raise ValueError(f"in-slice mesh {sizes} does not cover {per_slice} devices/slice")
    arr = ordered.reshape(num_slices, *sizes)
    return Mesh(arr, AXIS_NAMES)
