"""Device mesh + sharding layout.

The reference is single-process single-GPU (SURVEY.md §2d) — there is no
comm layer to port.  This module is the rebuild's scaling story, designed
for ICI-connected TPU slices and (optionally) DCN-connected multi-host
fleets:

  * mesh axes: ``data`` (batch/data-parallel) × ``space`` (spatial
    partitioning of H for large images — the reference's ``crops:`` analog
    at the XLA level).
  * Parameters/optimizer state are replicated; batches are sharded
    ``P('data', 'space')`` on (N, H).  Gradient reduction and cross-chip
    BatchNorm stats become XLA-inserted ``psum``s over ICI (GSPMD), i.e.
    sync-BN falls out for free rather than being a hand-written NCCL call.
  * Multi-host: ``mesh: {hosts: H}`` (or automatically when
    ``jax.process_count() > 1``) places a DCN factor OUTERMOST on the
    ``data`` axis via ``mesh_utils.create_hybrid_device_mesh``.  The step
    function is unchanged — "hosts" is not a separate axis, it is the
    slow-varying end of ``data``, so XLA's hierarchical collectives do
    ICI-reduce-scatter → DCN-allreduce → ICI-all-gather automatically.
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
    hosts: int = 0   # DCN factor on the data axis; 0 = jax.process_count()

    @staticmethod
    def from_config(mesh_cfg: Dict[str, int]) -> "MeshSpec":
        return MeshSpec(
            data=int(mesh_cfg.get("data", -1)),
            space=int(mesh_cfg.get("space", 1)),
            hosts=int(mesh_cfg.get("hosts", 0)),
        )


def build_mesh(spec: Optional[MeshSpec] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    spec = spec or MeshSpec()
    space = max(1, spec.space)
    hosts = spec.hosts if spec.hosts and spec.hosts > 0 else max(
        1, jax.process_count())
    data = spec.data if spec.data and spec.data > 0 else n // space
    if data * space != n:
        raise ValueError(
            f"mesh {data}x{space} (data x space) does not cover {n} devices"
        )
    if data % hosts:
        raise ValueError(
            f"mesh data axis ({data}) is not divisible by the DCN/hosts "
            f"factor ({hosts})")

    if jax.process_count() > 1:
        # real multi-process run: hybrid ICI×DCN layout so the outer part
        # of the data axis crosses hosts and the inner part + space stay
        # on ICI within each host.  ``hosts`` is defined as the per-PROCESS
        # granule (module docstring), so process_is_granule=True — the
        # helper's default granule is slice_index, which is 0 for every
        # device on a single multi-host pod slice and would raise.  When
        # the configured hosts factor does not match the process count
        # (or the helper rejects the topology) fall back to a plain
        # process-ordered reshape: DCN factor still outermost on `data`.
        from jax.experimental import mesh_utils

        try:
            if hosts != jax.process_count():
                raise ValueError(
                    f"mesh hosts={hosts} != process_count="
                    f"{jax.process_count()}")
            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(data // hosts, space),
                dcn_mesh_shape=(hosts, 1),
                devices=devices,
                process_is_granule=True,
            )
        except ValueError as e:
            # fall back, but LOUDLY — a silently ignored hosts factor (or
            # a masked topology error) changes cross-DCN collective
            # placement with no visible signal
            import warnings

            warnings.warn(
                f"hybrid DCN mesh unavailable ({e}); using a "
                "process-ordered reshape — hosts blocking stays outermost "
                "on `data`, but ICI/DCN collective placement is XLA's "
                "default")
            ordered = sorted(
                devices, key=lambda d: (d.process_index, getattr(d, "id", 0)))
            arr = np.asarray(ordered).reshape(data, space)
    else:
        # single process (incl. the virtual-CPU test mesh): a plain
        # reshape gives the same (data, space) logical layout; an explicit
        # hosts factor is honored as the outer blocking of `data` so
        # multi-host configs stay testable without processes
        arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batches: shard N over 'data' and H over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Host numpy batch dict → device arrays laid out on the mesh.

    Single-process: a plain sharded ``device_put``.  Multi-process: every
    host assembles the same GLOBAL batch (the index plans are
    deterministic, so they agree), and each process materializes only the
    shards its addressable devices own via ``jax.make_array_from_callback``
    — ownership comes from the sharding's own ``devices_indices_map``, so
    no assumption about process→row contiguity is baked in, and no batch
    bytes ever ride DCN.
    """
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    nproc = jax.process_count()

    def put(x):
        if not (hasattr(x, "ndim") and x.ndim >= 2):
            return jax.device_put(x, rep)
        if nproc == 1:
            return jax.device_put(x, sh)
        x = np.asarray(x)
        # callback is invoked only for this process's addressable devices,
        # with each device's GLOBAL index tuple — correct under any
        # device order the hybrid mesh (or its fallback) produced
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, batch)
