"""Pallas TPU kernel: fused shear-resample pass.

The XLA lowering of `fast_warp._shear_pass` issues ~10 roll+select sweeps
(plus fraction blend and fill masking) — each a full HBM round-trip over
the batch.  This kernel fuses the whole pass into ONE read + ONE write per
tile: the tile sits in VMEM and the log-shift runs entirely on registers/
VMEM via `pltpu.roll` (static shift per step) + per-line bit masks.

Layout: operates on (B, C, H, W) — channels-outer so the rolled spatial
axis lands on the vector lanes (x-shear) or sublanes (y-shear) instead of
wasting lanes on a 3/4-channel minor dim.  fast_warp transposes in/out
(cheap layout ops XLA folds into neighbors).

Semantics match `fast_warp._shear_pass` exactly (same log-shift, fraction
blend / nearest select, edge clamps, analytic OOB fill) — property-tested
against it in tests/test_pallas_shear.py, and against interpret mode on
CPU where no TPU is attached.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _shear_kernel(offs_ref, kind_ref, x_ref, out_ref, *,
                  n: int, norig: int, src_shift: int, fill: float,
                  nbits: int):
    """One (line-tile × full-roll-axis) block.

    offs_ref: (1, T, 1) f32 — per-line displacements for this tile (lines
    on sublanes; a size-1 lane dim keeps Mosaic's tiling rules happy where
    a (1, T) lane-sliced load would not).
    kind_ref: (C, 1) i32 — 0: bilinear (image), 1: nearest (mask).
    x_ref/out_ref: (1, 1, T, n) f32 — lines × roll axis (axis on lanes;
    the caller transposes so this is always true).
    """
    ci = pl.program_id(1)
    offs = offs_ref[0, :, 0]                    # (T,)
    x = x_ref[0, 0]                             # (T, n)

    kfloor = jnp.floor(offs)
    frac = (offs - kfloor)[:, None]             # (T, 1)
    kmod = kfloor.astype(jnp.int32) % n         # (T,)

    out = x
    for bit in range(nbits):
        # pltpu.roll needs a non-negative shift: left-roll by s == roll n-s
        rolled = pltpu.roll(out, (n - (1 << bit)) % n, 1)
        sel = ((kmod >> bit) & 1)[:, None] == 1
        out = jnp.where(sel, rolled, out)
    nxt = pltpu.roll(out, n - 1, 1)

    # original-frame source coordinate per output pixel
    # tpu.iota only emits integers; cast after
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    src = idx + offs[:, None] - float(src_shift)      # (T, n)

    is_mask = kind_ref[ci, 0] == 1
    blend = (1.0 - frac) * out + frac * nxt
    blend = jnp.where(src >= norig - 1.0, out, blend)  # edge clamp high
    blend = jnp.where(src < 0.0, nxt, blend)           # edge clamp low
    near = jnp.where(frac >= 0.5, nxt, out)
    res = jnp.where(is_mask, near, blend)

    oob = (src < -0.5) | (src > norig - 0.5)
    out_ref[0, 0] = jnp.where(oob, fill, res)


def shear_pass_tpu(x_bchw: Array, offs: Array, kinds: Array,
                   norig: int, src_shift: int, fill: float,
                   line_tile: int = 8,
                   interpret: bool = False) -> Array:
    """Fused shear along the LAST axis of (B, C, L, N).

    x_bchw: (B, C, L, N) f32 — N is the rolled axis (on lanes).
    offs:   (B, L) f32 — per-line displacement (source = idx + offs).
    kinds:  (C,) i32 — 0 bilinear / 1 nearest per channel.
    """
    b, c, l, n = x_bchw.shape
    t = min(line_tile, l)
    while l % t:
        t -= 1
    nbits = max(1, (n - 1).bit_length())

    kern = functools.partial(
        _shear_kernel, n=n, norig=norig,
        src_shift=src_shift, fill=fill, nbits=nbits)

    grid = (b, c, l // t)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, 1), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, n), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, n), lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, l, n), x_bchw.dtype),
        interpret=interpret,
    )(offs[..., None], kinds.reshape(c, 1), x_bchw)
