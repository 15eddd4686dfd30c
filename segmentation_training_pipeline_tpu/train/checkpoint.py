"""Checkpoint save/load with the reference's directory contract.

Reference: Keras ``ModelCheckpoint(save_best_only, monitor=primary_metric)``
→ ``weights/best-{fold}.{stage}.weights`` (HDF5), reloaded between stages
and by ``cfg.load(fold, stage)`` (SURVEY.md §5 'Checkpoint / resume').

TPU-native: the variables pytree (params + batch_stats) serializes via
flax msgpack to the same path contract; a JSON sidecar records the model
identity + best-metric value for fast inspection and resume bookkeeping.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, variables: Dict[str, Any],
                    meta: Optional[Dict[str, Any]] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_vars = jax.device_get(variables)
    payload = serialization.to_bytes(host_vars)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic — a crash never leaves a torn checkpoint
    if meta is not None:
        # sidecar is atomic too: multi-host peers read it right after the
        # stage barrier while the primary may still be rewriting it
        tmp_meta = path + ".json.tmp"
        with open(tmp_meta, "w") as f:
            json.dump(meta, f, indent=2, default=float)
        os.replace(tmp_meta, path + ".json")


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of ``template`` (a freshly-init variables
    pytree — guards against arch/config mismatch at load time)."""
    with open(path, "rb") as f:
        payload = f.read()
    return serialization.from_bytes(template, payload)


def checkpoint_meta(path: str) -> Optional[Dict[str, Any]]:
    side = path + ".json"
    if os.path.exists(side):
        with open(side) as f:
            return json.load(f)
    return None
