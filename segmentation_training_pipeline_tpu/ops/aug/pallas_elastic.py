"""Pallas TPU kernel: bounded-displacement 2-D resample (elastic warp).

The elastic path was the last gather in the augmentation engine: XLA's
footprint gather costs ~110 ms at B16 512² (random-access HBM latency).
Elastic displacements are BOUNDED (|d| ≤ K, a static bound derived from
the config's alpha/sigma), which a gather can't exploit but a
VMEM-resident kernel can:

  * the whole y-padded source plane for one (batch, channel) sits in VMEM
    (~1.3 MB at 512²+2K) — the block index repeats across the row-tile
    grid axis, so Pallas DMAs it once per (batch, channel);
  * y taps: range-select over the 2K+1 possible integer displacements —
    each candidate is a dynamic-base row-slice of the band (no gather);
  * x taps (K ≤ 30): windowed ``tpu.dynamic_gather`` — one (g0, g1)
    gather pair per 128-lane window (Mosaic gathers are same-shape
    within one vreg only); larger K falls back to the incremental
    1-lane-roll range-select.

Outputs/fields are processed in row tiles (keeps scoped VMEM well under
the 16 MB limit at any batch size).  Images interpolate bilinearly
(y-blend inside the slice loop, x-blend in the roll loop); masks take
the rounded tap from the same loops.  Cost is O(K) vector sweeps instead
of O(H·W) random accesses — ~7x faster than the footprint gather for
typical alpha ≤ 40.

Used by lowering.py for elastic configs whose static bound fits
(K ≤ 64); anything else falls back to warp.warp_joint's exact gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _elastic_joint_kernel(flags_ref, dy_ref, dx_ref, img_ref, out_ref, *,
                          k: int, h: int, w: int, t: int, fill: float):
    """One (batch, channel, row-tile) block; per-channel nearest flag.

    Nearest sampling IS bilinear with the fractional offsets rounded to
    {0, 1} (floor(d)+round(frac) == floor(d+0.5)), so the flag costs two
    scalar-selected rounds outside the sweeps — the O(K) loop bodies are
    identical for image and mask channels, and ONE kernel launch covers
    both (image kinds: bilinear; mask kinds: exact nearest)."""
    is_near = flags_ref[pl.program_id(1)] != 0
    base = pl.program_id(2) * t
    dy_raw = dy_ref[0]
    dx_raw = dx_ref[0]

    yy = (jax.lax.broadcasted_iota(jnp.int32, (t, w), 0)
          .astype(jnp.float32) + base)
    xx = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1).astype(jnp.float32)
    dy = jnp.clip(yy + dy_raw, 0.0, h - 1.0) - yy
    dx = jnp.clip(xx + dx_raw, 0.0, w - 1.0) - xx

    # floor(f+0.5), not jnp.round: half-to-even rounds a .5 tie DOWN while
    # the oracle's footprint convention (warp.py `fy >= 0.5`) takes the
    # upper tap — caught on-chip by tools/tpu_smoke.py as a 1-pixel mask
    # mismatch (round-4 smoke run)
    iy = jnp.floor(dy)
    fy = dy - iy
    fy = jnp.where(is_near, jnp.floor(fy + 0.5), fy)
    ix = jnp.floor(dx)
    fx = dx - ix
    fx = jnp.where(is_near, jnp.floor(fx + 0.5), fx)

    band = img_ref[0, 0, pl.ds(base, t + 2 * k + 1), :]
    row = jnp.zeros((t, w), jnp.float32)
    for s in range(-k, k + 1):
        cand = band[k + s: k + s + t, :]
        nxt = band[k + s + 1: k + s + 1 + t, :]
        row = jnp.where(iy == s, (1.0 - fy) * cand + fy * nxt, row)

    if k <= 30 and w >= 128 and w % 64 == 0:
        # x resample via tpu.dynamic_gather: one (g0, g1) gather pair per
        # 128-lane window (stride 64, ±32 halo) replaces the 2K+1 roll
        # sweep — Mosaic's gather is same-shape-within-one-vreg only, so
        # windows overlap 2x; still ~1.8x faster (tools /tmp/dg_probe).
        # Valid for K ≤ 30: interior windows need idx ∈ [lo, lo+126] so
        # the +1 bilinear tap stays in-window (hi tap = gather of the
        # 1-lane-rolled band at the same index; the roll's lane-127
        # wraparound is only ever hit with zero blend weight).
        ixi = ix.astype(jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        src_i = jnp.clip(col + ixi, 0, w - 1)
        sy = yy + dy_raw
        sx = xx + dx_raw
        oob = (sy < -0.5) | (sy > h - 0.5) | (sx < -0.5) | (sx > w - 0.5)
        for tw in range(w // 64):
            lo = min(max(tw * 64 - 32, 0), w - 128)
            band = row[:, lo:lo + 128]
            nxtb = pltpu.roll(band, 127, 1)        # band[:, m+1 mod 128]
            idxw = jnp.clip(src_i[:, lo:lo + 128] - lo, 0, 127)
            g0 = jnp.take_along_axis(band, idxw, axis=1,
                                     mode="promise_in_bounds")
            g1 = jnp.take_along_axis(nxtb, idxw, axis=1,
                                     mode="promise_in_bounds")
            fxw = fx[:, lo:lo + 128]
            val = (1.0 - fxw) * g0 + fxw * g1
            off = tw * 64 - lo
            sl = slice(tw * 64, tw * 64 + 64)
            out_ref[0, 0, :, sl] = jnp.where(
                oob[:, sl], fill, val[:, off:off + 64])
        return

    cur = pltpu.roll(row, k % w, 1)
    out = jnp.zeros((t, w), jnp.float32)
    for s in range(-k, k + 1):
        nxt = pltpu.roll(cur, w - 1, 1)
        out = jnp.where(ix == s, (1.0 - fx) * cur + fx * nxt, out)
        cur = nxt

    sy = yy + dy_raw
    sx = xx + dx_raw
    oob = (sy < -0.5) | (sy > h - 0.5) | (sx < -0.5) | (sx > w - 0.5)
    out_ref[0, 0] = jnp.where(oob, fill, out)


def elastic_resample_joint_tpu(planes: Array, flags: Array, dy: Array,
                               dx: Array, k: int, fill: float,
                               row_tile: int = 128,
                               interpret: bool = False) -> Array:
    """planes (B, C, H, W) f32, flags (C,) int32 (1 = nearest channel),
    dy/dx (B, H, W) f32 with |d| ≤ k → (B, C, H, W)."""
    b, c, h, w = planes.shape
    t = min(row_tile, h)
    while t >= 8 and (h % t or t % 8):
        t -= 1
    if t < 8:
        t = h
    padded = jnp.pad(planes, ((0, 0), (0, 0), (k, k + 1), (0, 0)),
                     constant_values=fill)
    kern = functools.partial(_elastic_joint_kernel, k=k, h=h, w=w, t=t,
                             fill=fill)
    # index maps under scalar prefetch receive the scalar ref as an extra
    # trailing argument
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, c, h // t),
        in_specs=[
            pl.BlockSpec((1, t, w), lambda i, j, r, _fl: (i, r, 0)),
            pl.BlockSpec((1, t, w), lambda i, j, r, _fl: (i, r, 0)),
            pl.BlockSpec((1, 1, h + 2 * k + 1, w),
                         lambda i, j, r, _fl: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, t, w),
                               lambda i, j, r, _fl: (i, j, r, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        interpret=interpret,
    )(flags.astype(jnp.int32), dy, dx, padded)


def warp_elastic_joint(images: Array, masks: Array, dy: Array, dx: Array,
                       k: int, fill: float = 0.0,
                       interpret: bool = False):
    """Elastic-only joint warp: images bilinear, masks nearest — the
    displacement-field half of warp.warp_joint with the affine already
    applied (see lowering.py's split).  Image and mask channels ride ONE
    kernel launch (per-channel kind flags) so the displacement tiles are
    DMA'd once."""
    ci = images.shape[-1]
    planes = jnp.concatenate(
        [images.astype(jnp.float32), masks.astype(jnp.float32)],
        axis=-1).transpose(0, 3, 1, 2)
    flags = jnp.concatenate([
        jnp.zeros((ci,), jnp.int32),
        jnp.ones((masks.shape[-1],), jnp.int32)])
    out = elastic_resample_joint_tpu(planes, flags, dy, dx, k, fill,
                                     interpret=interpret)
    out = out.transpose(0, 2, 3, 1)
    return out[..., :ci], out[..., ci:].astype(masks.dtype)
