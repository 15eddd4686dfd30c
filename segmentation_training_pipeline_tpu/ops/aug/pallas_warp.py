"""Pallas TPU kernels: fully-fused affine warp (x-pipeline + y-pipeline).

The multipass warp (fast_warp.warp_joint_multipass) decomposes each inverse
affine into rot90 · x-shear · scale+translate · y-shear.  Its round-1/2
realization paid real HBM for the glue: a pad materialization, an einsum
pair, and SIX transposes (each shear kernel wants its roll axis on lanes,
so the caller transposed in and out around every pass) — at B128 512² the
glue moves ~10 GB of canvas for zero math.

These two kernels keep the whole pipeline in (B, C, H, W) layout and fuse
everything between the rot90 pre-pass and the final output:

  kernel X (per (b, c) plane, whole plane VMEM-resident):
    1. x-pad into a scratch canvas (fill constant, no HBM pad array)
    2. x-shear: log-shift lane rolls with per-row bit masks
    3. x-scale+translate: one MXU dot against a tap matrix built in-kernel
       from the per-image scalars (no HBM tap matrices either)
  kernel Y (per (b, c) plane):
    4. y-scale+translate: MXU dot (tap matrix in-kernel, original-frame
       validity + edge clamps)
    5. y-shear: log-shift SUBLANE rolls with per-column bit masks
    6. static row-slice back to the frame

Mask channels ride the same launches: nearest sampling IS bilinear with
the fractional offsets rounded to {0, 1} (floor(d)+round(frac) ==
floor(d+0.5)), so a per-channel kind flag selects rounded fractions and
the tap/roll structure is shared (same trick as pallas_elastic's joint
kernel).  Semantics are property-tested equal to the unfused passes
(tests/test_pallas_warp.py) which are themselves oracle-tested against
warp.warp_joint.

Reference: imgaug Affine joint image+mask semantics (SURVEY §2b) — the
upstream runs scipy/OpenCV warps on host processes; there is no kernel to
port, this decomposition is the TPU-native design.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _dot3(a: Array, b: Array) -> Array:
    """~f32-accurate matmul from 3 bf16 MXU passes (hi/lo split, lo·lo
    term dropped).  Precision.HIGHEST costs ~6 passes; the default single
    bf16 pass loses ~1 gray level at 255 scale.  Residual error here is
    |a_lo|·|b_lo| ≲ 2⁻¹⁶ relative (≈0.004 at 255) — invisible next to the
    warp's bilinear quantization, at half the HIGHEST dot cost."""
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    d += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    d += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return d


def _warp_x_kernel(scal_ref, kind_ref, x_ref, out_ref, canvas_ref, *,
                   h: int, w: int, px: int, fill: float):
    """x-pipeline for one (batch, channel) plane.

    scal_ref: (B, 6) f32 SMEM — (s1, e1, tx, e2, ty, s2) per image, tx/ty
    already center-adjusted by the caller (fast_warp composition).
    kind_ref: (C, 1) i32 — 0 bilinear (image) / 1 nearest (mask).
    x_ref/out_ref: (1, 1, H, W) f32;  canvas_ref: (H, W+2px) f32 scratch.
    """
    wp = w + 2 * px
    bi = pl.program_id(0)
    s1 = scal_ref[bi, 0]
    e1 = scal_ref[bi, 1]
    tx = scal_ref[bi, 2]
    cy = (h - 1) / 2.0
    is_mask = kind_ref[pl.program_id(1), 0] == 1

    # 1. x-pad into scratch (canvas fill built in VMEM, never in HBM)
    canvas_ref[:, :] = jnp.full((h, wp), fill, jnp.float32)
    canvas_ref[:, px:px + w] = x_ref[0, 0]

    # 2. x-shear: src_x = x + s1·(y - cy) on the padded canvas
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    offs = s1 * (ii - cy)                       # (H, 1) per-row displacement
    kfloor = jnp.floor(offs)
    frac = offs - kfloor
    frac = jnp.where(is_mask, jnp.floor(frac + 0.5), frac)
    kmod = kfloor.astype(jnp.int32) % wp

    out = canvas_ref[:, :]
    for bit in range(max(1, (wp - 1).bit_length())):
        rolled = pltpu.roll(out, (wp - (1 << bit)) % wp, 1)
        sel = ((kmod >> bit) & 1) == 1
        out = jnp.where(sel, rolled, out)
    nxt = pltpu.roll(out, wp - 1, 1)

    idx = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 1).astype(jnp.float32)
    src = idx + offs - float(px)                # original-frame x coordinate
    res = (1.0 - frac) * out + frac * nxt
    res = jnp.where(src >= w - 1.0, out, res)   # edge clamp high
    res = jnp.where(src < 0.0, nxt, res)        # edge clamp low
    oob = (src < -0.5) | (src > w - 0.5)
    canvas_ref[:, :] = jnp.where(oob, fill, res)

    # 3. x-scale+translate: dst col j reads canvas col e1·j + tx + px.
    # Tap matrix (wp, w) built from iota compares — never touches HBM.
    kk = jax.lax.broadcasted_iota(jnp.int32, (wp, w), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (wp, w), 1).astype(jnp.float32)
    col = e1 * jj + tx + float(px)              # (wp, w), constant per row
    s0 = jnp.floor(col)
    f = col - s0
    f = jnp.where(is_mask, jnp.floor(f + 0.5), f)
    taps = (kk == s0) * (1.0 - f) + (kk == s0 + 1.0) * f
    taps = jnp.where(col >= wp - 1.0, (kk == wp - 1.0) * 1.0, taps)
    taps = jnp.where(col < 0.0, (kk == 0.0) * 1.0, taps)
    valid = (col >= -0.5) & (col <= wp - 0.5)
    taps = jnp.where(valid, taps, 0.0)

    res2 = _dot3(canvas_ref[:, :], taps)                     # (h, w)
    if fill != 0.0:
        # invalid dst columns must read `fill`, not 0 (valid Ry rows in
        # kernel Y preserve the constant: their tap weights sum to 1).
        # `col`/`valid` are constant down each column, so row 0 is the
        # per-dst-column validity.
        res2 = jnp.where(valid[:1, :], res2, fill)
    out_ref[0, 0] = res2


def _y_pipeline(scal_ref, kind_ref, x_ref, canvas_ref, *,
                h: int, w: int, py: int, fill: float):
    """Shared y-pipeline body: y-scale dot + y-shear sublane rolls.
    Returns (res (H+2py, W) canvas, is_mask) — callers slice the frame or
    run the elastic tail over the band."""
    hp = h + 2 * py
    bi = pl.program_id(0)
    e2 = scal_ref[bi, 3]
    ty = scal_ref[bi, 4]
    s2 = scal_ref[bi, 5]
    cx = (w - 1) / 2.0
    is_mask = kind_ref[pl.program_id(1), 0] == 1

    # 4. y-scale+translate: canvas row i reads source row e2·(i-py) + ty,
    # validity/edge clamps against the ORIGINAL H frame (the x passes never
    # moved y, so this is the composite y source coordinate).
    ii = jax.lax.broadcasted_iota(jnp.int32, (hp, h), 0).astype(jnp.float32)
    kk = jax.lax.broadcasted_iota(jnp.int32, (hp, h), 1).astype(jnp.float32)
    srcy = e2 * (ii - float(py)) + ty
    s0 = jnp.floor(srcy)
    f = srcy - s0
    f = jnp.where(is_mask, jnp.floor(f + 0.5), f)
    taps = (kk == s0) * (1.0 - f) + (kk == s0 + 1.0) * f
    taps = jnp.where(srcy >= h - 1.0, (kk == h - 1.0) * 1.0, taps)
    taps = jnp.where(srcy < 0.0, (kk == 0.0) * 1.0, taps)
    validy = (srcy >= -0.5) & (srcy <= h - 0.5)
    taps = jnp.where(validy, taps, 0.0)

    canvas = _dot3(taps, x_ref[0, 0])                        # (hp, w)
    if fill != 0.0:
        canvas = jnp.where(validy[:, :1], canvas, fill)
    canvas_ref[:, :] = canvas

    # 5. y-shear: src_y = y + s2·(x - cx); whole canvas is valid content
    # (matches _shear_pass(axis=1, src_shift=0, orig_n=hp))
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    offs = s2 * (jj - cx)                       # (1, W) per-column
    kfloor = jnp.floor(offs)
    frac = offs - kfloor
    frac = jnp.where(is_mask, jnp.floor(frac + 0.5), frac)
    kmod = kfloor.astype(jnp.int32) % hp

    out = canvas_ref[:, :]
    for bit in range(max(1, (hp - 1).bit_length())):
        rolled = pltpu.roll(out, (hp - (1 << bit)) % hp, 0)
        sel = ((kmod >> bit) & 1) == 1
        out = jnp.where(sel, rolled, out)
    nxt = pltpu.roll(out, hp - 1, 0)

    idx = jax.lax.broadcasted_iota(jnp.int32, (hp, w), 0).astype(jnp.float32)
    src = idx + offs
    res = (1.0 - frac) * out + frac * nxt
    res = jnp.where(src >= hp - 1.0, out, res)
    res = jnp.where(src < 0.0, nxt, res)
    oob = (src < -0.5) | (src > hp - 0.5)
    res = jnp.where(oob, fill, res)
    return res, is_mask


def _warp_y_kernel(scal_ref, kind_ref, x_ref, out_ref, canvas_ref, *,
                   h: int, w: int, py: int, fill: float):
    """Plain y-pipeline: static slice back to the frame rows."""
    res, _ = _y_pipeline(scal_ref, kind_ref, x_ref, canvas_ref,
                         h=h, w=w, py=py, fill=fill)
    out_ref[0, 0] = res[py:py + h, :]


def _warp_ye_kernel(scal_ref, kind_ref, dy_ref, dx_ref, x_ref, out_ref,
                    canvas_ref, *, h: int, w: int, py: int, k: int,
                    fill: float):
    """y-pipeline + fused elastic tail.

    The two-stage path (affine warp → slice → pad with fill → elastic
    kernel) re-reads the whole batch from HBM; here the y-shear canvas is
    already VMEM-resident and rows [py-K, py+h+K+1) ARE the elastic
    band: the displacement clamp keeps every non-zero tap inside the
    frame rows [py, py+h) (+1 zero-weight bilinear neighbor), so sampling
    the canvas band is exact vs the padded-frame formulation
    (pallas_elastic._elastic_joint_kernel semantics; requires py ≥ K+1,
    enforced by the caller).

    dy_ref/dx_ref: (1, H, W) f32 — per-pixel displacements, |d| ≤ K.
    """
    res, is_mask = _y_pipeline(scal_ref, kind_ref, x_ref, canvas_ref,
                               h=h, w=w, py=py, fill=fill)
    # stage the sheared canvas back into scratch: the 2K+1 band reads
    # below become ref slices (cheap address math) instead of slices of a
    # live SSA value the compiler must keep materialized
    canvas_ref[:, :] = res
    dy_raw = dy_ref[0]
    dx_raw = dx_ref[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    dy = jnp.clip(yy + dy_raw, 0.0, h - 1.0) - yy
    dx = jnp.clip(xx + dx_raw, 0.0, w - 1.0) - xx

    iy = jnp.floor(dy)
    fy = dy - iy
    fy = jnp.where(is_mask, jnp.floor(fy + 0.5), fy)
    row = jnp.zeros((h, w), jnp.float32)
    for s in range(-k, k + 1):
        cand = canvas_ref[py + s: py + s + h, :]
        nxt = canvas_ref[py + s + 1: py + s + 1 + h, :]
        row = jnp.where(iy == s, (1.0 - fy) * cand + fy * nxt, row)

    ix = jnp.floor(dx)
    fx = dx - ix
    fx = jnp.where(is_mask, jnp.floor(fx + 0.5), fx)
    cur = pltpu.roll(row, k % w, 1)
    out = jnp.zeros((h, w), jnp.float32)
    for s in range(-k, k + 1):
        nxt2 = pltpu.roll(cur, w - 1, 1)
        out = jnp.where(ix == s, (1.0 - fx) * cur + fx * nxt2, out)
        cur = nxt2

    sy = yy + dy_raw
    sx = xx + dx_raw
    oob = ((sy < -0.5) | (sy > h - 0.5) | (sx < -0.5) | (sx > w - 0.5))
    out_ref[0, 0] = jnp.where(oob, fill, out)


def warp_fused_tpu(planes: Array, kinds: Array, scalars: Array,
                   px: int, py: int, fill: float,
                   dy: Optional[Array] = None, dx: Optional[Array] = None,
                   k: int = 0,
                   interpret: bool = False) -> Array:
    """planes (B, C, H, W) f32; kinds (C,) i32; scalars (B, 6) f32 =
    (s1, e1, tx, e2, ty, s2) per image → warped (B, C, H, W).

    Two pallas_call launches (x-pipeline, y-pipeline); all padding, tap
    matrices, and intermediates live in VMEM scratch.  With dy/dx
    ((B, H, W) f32, |d| ≤ k ≤ py-1) the elastic resample fuses into the
    y-pipeline launch (kernel YE) — no extra round trip.
    """
    b, c, h, w = planes.shape
    kx = functools.partial(_warp_x_kernel, h=h, w=w, px=px, fill=fill)

    grid = (b, c)
    # full-array SMEM refs (Mosaic rejects sub-(8,128) blocked SMEM specs);
    # kernels index by program_id
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kind_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    plane_spec = pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)

    mid = pl.pallas_call(
        kx, grid=grid,
        in_specs=[scal_spec, kind_spec, plane_spec],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w + 2 * px), jnp.float32)],
        interpret=interpret,
    )(scalars, kinds.reshape(c, 1), planes)

    y_scratch = [pltpu.VMEM((h + 2 * py, w), jnp.float32)]
    # the YE kernel holds several plane-sized values at once (canvas, tap
    # matrix, roll chain, elastic band selects): the default 16M scoped
    # limit OOMs at 512² — raise it just enough (bigger limits degrade
    # Mosaic's pipelining headroom)
    params = pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024)
    if dy is None:
        ky = functools.partial(_warp_y_kernel, h=h, w=w, py=py, fill=fill)
        return pl.pallas_call(
            ky, grid=grid,
            in_specs=[scal_spec, kind_spec, plane_spec],
            out_specs=plane_spec,
            out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
            scratch_shapes=y_scratch,
            interpret=interpret,
        )(scalars, kinds.reshape(c, 1), mid)

    assert k + 1 <= py, f"elastic bound K={k} needs y-pad ≥ K+1, got {py}"
    kye = functools.partial(_warp_ye_kernel, h=h, w=w, py=py, k=k,
                            fill=fill)
    # displacement tiles repeat across the channel grid axis → DMA'd once
    # per batch element
    disp_spec = pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kye, grid=grid,
        in_specs=[scal_spec, kind_spec, disp_spec, disp_spec, plane_spec],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        scratch_shapes=y_scratch,
        compiler_params=params,
        interpret=interpret,
    )(scalars, kinds.reshape(c, 1), dy.astype(jnp.float32),
      dx.astype(jnp.float32), mid)


def warp_joint_fused(images: Array, masks: Array,
                     s1: Array, e1: Array, e2: Array,
                     tx: Array, ty: Array, s2: Array,
                     px: int, py: int, fill: float = 0.0,
                     dy: Optional[Array] = None,
                     dx: Optional[Array] = None, k: int = 0,
                     interpret: bool = False) -> Tuple[Array, Array]:
    """Fused equivalent of fast_warp's pass1→pass3 chain (after rot90
    extraction and shear-centering — the caller passes the adjusted
    scalars), optionally with the elastic resample fused into the
    y-launch.  images (B,H,W,C) f32, masks (B,H,W,K) → same shapes."""
    ci = images.shape[-1]
    joint = jnp.concatenate(
        [images.astype(jnp.float32), masks.astype(jnp.float32)],
        axis=-1).transpose(0, 3, 1, 2)
    kinds = jnp.concatenate([
        jnp.zeros((ci,), jnp.int32),
        jnp.ones((masks.shape[-1],), jnp.int32)])
    scalars = jnp.stack([s1, e1, tx, e2, ty, s2], axis=1).astype(jnp.float32)
    out = warp_fused_tpu(joint, kinds, scalars, px, py, fill,
                         dy=dy, dx=dx, k=k, interpret=interpret)
    out = out.transpose(0, 2, 3, 1)
    return out[..., :ci], out[..., ci:].astype(masks.dtype)
