"""Device mesh + sharding layout.

The reference is single-process single-GPU (SURVEY.md §2d) — there is no
comm layer to port.  This module is the rebuild's scaling story, designed
for ICI-connected TPU slices:

  * mesh axes: ``data`` (batch/data-parallel) × ``space`` (spatial
    partitioning of H for large images — the reference's ``crops:`` analog
    at the XLA level).
  * Parameters/optimizer state are replicated; batches are sharded
    ``P('data', 'space')`` on (N, H).  Gradient reduction and cross-chip
    BatchNorm stats become XLA-inserted ``psum``s over ICI (GSPMD), i.e.
    sync-BN falls out for free rather than being a hand-written NCCL call.
  * A 1-device mesh degenerates to plain jit with zero overhead, which is
    how the single-chip bench path runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1   # -1 = all remaining devices
    space: int = 1

    @staticmethod
    def from_config(mesh_cfg: Dict[str, int]) -> "MeshSpec":
        return MeshSpec(
            data=int(mesh_cfg.get("data", -1)),
            space=int(mesh_cfg.get("space", 1)),
        )


def build_mesh(spec: Optional[MeshSpec] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    spec = spec or MeshSpec()
    space = max(1, spec.space)
    data = spec.data if spec.data and spec.data > 0 else n // space
    if data * space != n:
        raise ValueError(
            f"mesh {data}x{space} (data x space) does not cover {n} devices"
        )
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batches: shard N over 'data' and H over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Host numpy batch dict → device arrays laid out on the mesh."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree.map(put, batch)
