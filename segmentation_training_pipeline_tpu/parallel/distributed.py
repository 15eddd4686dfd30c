"""Multi-host (multi-process) bootstrap — the DCN story.

The reference is single-process (SURVEY.md §2d: no NCCL/MPI/horovod), so
there is nothing to port; this module is the rebuild's scale-out path when
a single ICI-connected slice is not enough:

  * one Python process per host, each seeing its local TPU chips;
  * ``jax.distributed.initialize()`` wires the processes into one logical
    runtime (global ``jax.devices()``);
  * ``build_mesh`` (mesh.py) then lays the DATA axis with the DCN factor
    OUTERMOST, so XLA lowers gradient/BN psums hierarchically:
    reduce-scatter over ICI inside each host, then the (much smaller)
    partial sums over DCN, then all-gather over ICI — the standard
    bandwidth-optimal hierarchy (scaling-book recipe); nothing is
    hand-written.

Activation: either set the standard JAX env vars
(``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` —
or rely on TPU metadata auto-detection on Cloud TPU VMs) and call
``maybe_initialize()``, or run the CLI with ``STP_DISTRIBUTED=1``.
Single-process runs are the default and never touch jax.distributed.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def maybe_initialize(force: Optional[bool] = None) -> bool:
    """Initialize jax.distributed when multi-host execution is requested.

    Returns True iff running multi-process afterwards.  Idempotent; a
    no-op unless ``force`` is True or the environment carries coordinator
    settings (``STP_DISTRIBUTED``/``JAX_COORDINATOR_ADDRESS``).
    """
    global _INITIALIZED
    want = force if force is not None else (
        os.environ.get("STP_DISTRIBUTED", "0") not in ("0", "false", "")
        or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    )
    if want and not _INITIALIZED:
        # args come from env / TPU metadata; explicit kwargs only when set
        kw = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kw["coordinator_address"] = os.environ["JAX_COORDINATOR_ADDRESS"]
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kw)
        _INITIALIZED = True
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, metrics CSV, log lines).  Always True single-process."""
    return jax.process_index() == 0
