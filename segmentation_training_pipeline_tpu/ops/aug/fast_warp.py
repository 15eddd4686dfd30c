"""Gather-free affine warp: 3-pass shear/scale decomposition.

The footprint-gather warp (warp.py) is exact but HBM-random-access bound:
one bilinear gather at B16 512² costs ~110 ms on v5e — more than the whole
fwd+bwd.  This module replaces it for the (overwhelmingly common) pure
affine case with the classic multi-pass decomposition (Catmull & Smith
1980; Paeth 1986), built only from TPU-native primitives:

    inverse affine  A = R90^k · S1(x-shear) · D(scale+translate) · S2(y-shear)

  * R90^k / flips  — lax.transpose/rev + a 4-way select (no data-dependent
    control flow; all four variants are cheap layout ops XLA fuses).
  * shear passes   — per-line constant displacement ⇒ log-shift: ≤10
    roll+select sweeps (VPU, fully fusable), one extra roll for the
    bilinear fraction.  No gather: a shear moves every pixel of a line by
    the same amount, so `jnp.roll` + a per-line bit mask routes exactly.
  * scale pass     — separable resample ⇒ two batched matmuls against
    per-image (n_dst × n_src) bilinear/nearest tap matrices (MXU).

Images get bilinear taps, masks ride the same passes with nearest taps —
joint-transform consistency by construction (same guarantee as
warp.warp_joint, SURVEY §2b imgaug joint-augmentation semantics).

Deviation (documented): multi-pass bilinear applies 1-D interpolation per
pass, so rotated outputs are marginally smoother than single-pass bilinear
(the classic multi-pass trade-off; exact for pure translate/scale/flip).
Elastic displacement fields need true 2-D gathers and stay on
warp.warp_joint.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def use_pallas(env_var: str) -> bool:
    """Kernel dispatch: Pallas on real TPUs, XLA fallback elsewhere.
    Override with <env_var>=0/1 (shared by the shear + elastic paths)."""
    env = os.environ.get(env_var)
    if env is not None:
        return env.lower() not in ("0", "false")
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _use_pallas_shear() -> bool:
    return use_pallas("STP_PALLAS_SHEAR")


# ---------------------------------------------------------------------------
# decomposition
# ---------------------------------------------------------------------------

def _decompose(mats: Array, h: int, w: int):
    """Split (B,3,3) inverse affines into rot90-k + shear/scale factors.

    Returns (k, s1, e1, e2, tx, ty, s2) with all factors (B,) such that
      A ≈ R90(k) · [[1,s1],[0,1]] · [[e1,0],[0,e2]] · [[1,0],[s2,1]] (+t)
    where R90(k) is the inverse rot90-by-k matrix about the image center.
    Choosing k = round(θ/90°) keeps the residual rotation within ±45°, so
    the S1·D·S2 factorization never degenerates (|d| ≥ cos45°·scale).
    """
    a = mats[:, 0, 0]
    b = mats[:, 0, 1]
    c = mats[:, 1, 0]
    d = mats[:, 1, 1]
    tx = mats[:, 0, 2]
    ty = mats[:, 1, 2]

    # Rotation angle of the inverse map.  Convention: warp.rot90s(k=1)'s
    # 2x2 is [[0,-1],[1,0]] = Rot(+90°), i.e. theta = atan2(-b, a).
    # det<0 (odd flip count): write A = Fx·M̃ (x-flip negates the whole
    # first row) and extract M̃'s angle — the residual then carries the
    # flip in a negative e1.
    det = a * d - b * c
    flip = det < 0
    a_ = jnp.where(flip, -a, a)
    b_ = jnp.where(flip, -b, b)
    theta = jnp.arctan2(-b_, a_)
    k = jnp.round(theta / (math.pi / 2.0)).astype(jnp.int32) % 4

    # The select pre-pass applies M_k (np.rot90 by k); the residual must
    # satisfy M_k · Mr = A  ⇒  Mr = M_k⁻¹ · A  (LEFT-multiply by the
    # inverse rot90 about the center).
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ang = -k.astype(jnp.float32) * (math.pi / 2.0)   # angle of M_k⁻¹
    ck, sk = jnp.cos(ang), jnp.sin(ang)
    r00, r01 = ck, -sk
    r10, r11 = sk, ck
    rt0 = cx - r00 * cx - r01 * cy
    rt1 = cy - r10 * cx - r11 * cy
    m00 = r00 * a + r01 * c
    m01 = r00 * b + r01 * d
    m02 = r00 * tx + r01 * ty + rt0
    m10 = r10 * a + r11 * c
    m11 = r10 * b + r11 * d
    m12 = r10 * tx + r11 * ty + rt1

    # S1·D·S2 factorization of [[m00,m01],[m10,m11]]
    eps = 1e-6
    m11s = jnp.where(jnp.abs(m11) < eps, eps, m11)
    e2 = m11s
    s1 = m01 / m11s
    s2 = m10 / m11s
    e1 = m00 - m01 * m10 / m11s
    # t' = S1^{-1} t
    tpx = m02 - s1 * m12
    tpy = m12
    return k, s1, e1, e2, tpx, tpy, s2


def _rot90_select(x: Array, k: Array) -> Array:
    """Per-image rot90 by traced k∈{0..3}: 4 static variants + select.

    Matches warp.rot90s semantics: non-square inputs keep their shape
    (rot90 + resize); for the multi-pass path we only use it on square
    dims or fold the aspect scale into the scale pass — callers pass
    square H=W (the standard training config) or k is forced to 0.
    """
    # np.rot90 direction (CCW in array axes), matching warp.rot90s
    r1 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=1)
    r2 = jnp.flip(jnp.flip(x, axis=1), axis=2)
    r3 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)
    kb = k[:, None, None, None]
    return jnp.where(kb == 1, r1, jnp.where(kb == 2, r2,
                     jnp.where(kb == 3, r3, x)))


# ---------------------------------------------------------------------------
# the passes
# ---------------------------------------------------------------------------

def _shear_pass(img: Array, mask: Array, offs: Array, axis: int,
                fill: float, src_shift: int = 0,
                orig_n: Optional[int] = None,
                out_slice: Optional[Tuple[int, int]] = None,
                ) -> Tuple[Array, Array]:
    """Resample along ``axis`` with per-line displacement ``offs``.

    img/mask: (B, H, W, C/K); offs: (B, R) where R is the size of the
    *other* spatial axis; source = dst_index + offs[line].  Images blend
    bilinearly, masks take the rounded tap — both from the same log-shift
    sweep (shared rolls).

    Padded-canvas plumbing: the *original* (unpadded) source coordinate is
    ``idx + offs - src_shift`` and OOB/edge-clamping tests run against
    ``orig_n`` (defaults to the canvas size); ``out_slice=(start, len)``
    crops the output along ``axis`` at the end.
    """
    n = img.shape[axis]
    norig = n if orig_n is None else orig_n
    c = img.shape[-1]

    if _use_pallas_shear():
        from .pallas_shear import shear_pass_tpu

        k = mask.shape[-1]
        joint = jnp.concatenate([img, mask.astype(img.dtype)], axis=-1)
        if axis == 2:   # roll along W: (B,H,W,C) -> (B,C,H,W)
            x = joint.transpose(0, 3, 1, 2)
        else:           # roll along H: (B,H,W,C) -> (B,C,W,H)
            x = joint.transpose(0, 3, 2, 1)
        kinds = jnp.asarray([0] * c + [1] * k, jnp.int32)
        out = shear_pass_tpu(x, offs, kinds, norig=norig,
                             src_shift=src_shift, fill=fill)
        out = (out.transpose(0, 2, 3, 1) if axis == 2
               else out.transpose(0, 3, 2, 1))
        img_out, mask_out = out[..., :c], out[..., c:].astype(mask.dtype)
        if out_slice is not None:
            start, length = out_slice
            img_out = jax.lax.slice_in_dim(img_out, start, start + length,
                                           axis=axis)
            mask_out = jax.lax.slice_in_dim(mask_out, start, start + length,
                                            axis=axis)
        return img_out, mask_out

    joint = jnp.concatenate([img, mask.astype(img.dtype)], axis=-1)

    kfloor = jnp.floor(offs)
    frac = (offs - kfloor)
    kmod = kfloor.astype(jnp.int32) % n  # circular: OOB masked analytically

    if axis == 2:     # displacement varies along H (rows)
        exp = lambda v: v[:, :, None, None]     # (B,H) -> (B,H,1,1)
    else:             # axis == 1: varies along W (cols)
        exp = lambda v: v[:, None, :, None]     # (B,W) -> (B,1,W,1)

    out = joint
    for bit in range(max(1, (n - 1).bit_length())):
        rolled = jnp.roll(out, -(1 << bit), axis=axis)
        sel = exp((kmod >> bit) & 1).astype(bool)
        out = jnp.where(sel, rolled, out)
    nxt = jnp.roll(out, -1, axis=axis)

    # per-pixel ORIGINAL source coordinate (for edge clamping + OOB fill)
    shape = [1, 1, 1, 1]
    shape[axis] = n
    idx = jnp.arange(n, dtype=jnp.float32).reshape(shape)
    src = idx + exp(offs).astype(jnp.float32) - float(src_shift)

    f = exp(frac).astype(img.dtype)
    img_out = (1.0 - f) * out[..., :c] + f * nxt[..., :c]
    # edge clamp (matches warp_joint's clip-to-[0, n-2] bilinear):
    #   src in [n-1, n-0.5]: blend would leave the frame — take tap n-1
    #   src in (-0.5, 0):    integer tap is off-frame — take the next tap
    img_out = jnp.where(src >= norig - 1.0, out[..., :c], img_out)
    img_out = jnp.where(src < 0.0, nxt[..., :c], img_out)
    # nearest never leaves the frame for valid src: round(src) ∈ [0, n-1]
    mask_out = jnp.where(exp(frac >= 0.5), nxt[..., c:], out[..., c:])

    oob = (src < -0.5) | (src > norig - 0.5)
    img_out = jnp.where(oob, jnp.asarray(fill, img_out.dtype), img_out)
    mask_out = jnp.where(oob, jnp.asarray(fill, mask_out.dtype), mask_out)
    if out_slice is not None:
        start, length = out_slice
        img_out = jax.lax.slice_in_dim(img_out, start, start + length, axis=axis)
        mask_out = jax.lax.slice_in_dim(mask_out, start, start + length, axis=axis)
    return img_out, mask_out.astype(mask.dtype)


def _resample_matrices(e: Array, t: Array, n_dst: int, n_src: int,
                       orig_n: int, dst_shift: int, src_shift: int, dtype):
    """(B,) scale/offset → (B, n_dst, n_src) bilinear + nearest matrices.

    Row i holds the taps for dst index i on a shifted canvas: the original
    source coordinate is ``src = e·(i - dst_shift) + t`` and the matrix
    column for it is ``src + src_shift`` (source canvas padded by
    src_shift).  OOB rows (src outside the original frame) are all-zero
    (caller adds fill).
    """
    dst = jnp.arange(n_dst, dtype=jnp.float32) - float(dst_shift)
    src = e[:, None] * dst[None, :] + t[:, None]        # (B, n_dst) original
    col = src + float(src_shift)                         # padded column coord
    s0 = jnp.floor(col)
    f = col - s0
    cols = jnp.arange(n_src, dtype=jnp.float32)[None, None, :]
    s0e = s0[:, :, None]
    bil = ((1.0 - f)[:, :, None] * (cols == s0e)
           + f[:, :, None] * (cols == s0e + 1.0))
    # clamped edges (warp_joint clips x0 to [0, n-2]): src in [n-1, n-0.5]
    # puts full weight on the last original column, src in (-0.5, 0) on the
    # first
    last = float(orig_n - 1 + src_shift)
    first = float(src_shift)
    bil = jnp.where((src >= orig_n - 1.0)[:, :, None],
                    (cols == last) * 1.0, bil)
    bil = jnp.where((src < 0.0)[:, :, None], (cols == first) * 1.0, bil)
    # floor(src+0.5), not round(): jnp.round half-to-even breaks the
    # footprint-gather convention (fx >= 0.5 picks the upper tap)
    near = (cols == jnp.floor(col + 0.5)[:, :, None]) * 1.0
    # warp_joint's convention: strict inequalities define OOB, so the
    # half-pixel boundary src == n-0.5 is still valid (edge-clamped)
    valid = ((src >= -0.5) & (src <= orig_n - 0.5))[:, :, None]
    bil = jnp.where(valid, bil, 0.0).astype(dtype)
    near = jnp.where(valid, near, 0.0).astype(dtype)
    return bil, near, valid[:, :, 0]


def _scale_pass(img: Array, mask: Array, e1: Array, tx: Array,
                e2: Array, ty: Array, fill: float,
                orig_hw: Tuple[int, int], pad_in_x: int = 0,
                pad_out_y: int = 0) -> Tuple[Array, Array]:
    """Separable scale+translate via MXU matmuls: out = Ry · x · Rxᵀ.

    Input may be x-padded by ``pad_in_x``; output is y-padded by
    ``pad_out_y`` (rows [-pad, h+pad) of the original frame) and x-unpadded.
    """
    b, h_in, w_in, c = img.shape
    h, w = orig_hw
    dt = img.dtype
    # y: reads the ORIGINAL y frame (pass 1 never moved y) — the read
    # coordinate is the final composite y source, so original-frame
    # validity + edge clamping apply here.
    ry_b, ry_n, vy = _resample_matrices(
        e2, ty, h + 2 * pad_out_y, h, h, pad_out_y, 0, dt)
    # x: reads pass 1's INTERMEDIATE canvas — content legitimately lives
    # in the padding (sheared-out, coming back), so validity spans the
    # whole padded canvas; the original-frame x test already ran in pass 1.
    rx_b, rx_n, vx = _resample_matrices(
        e1, tx + float(pad_in_x), w, w_in, w_in, 0, 0, dt)

    def apply(x, ry, rx):
        # HIGHEST: default TPU matmul truncates to bf16 (~1% pixel error)
        y = jnp.einsum("bij,bjwc->biwc", ry, x,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(dt)
        return jnp.einsum("bij,bhjc->bhic", rx, y,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST).astype(dt)

    img_out = apply(img, ry_b, rx_b)
    mask_out = apply(mask.astype(dt), ry_n, rx_n)
    if fill != 0.0:
        oob = ~(vy[:, :, None] & vx[:, None, :])
        img_out = jnp.where(oob[..., None], jnp.asarray(fill, dt), img_out)
        mask_out = jnp.where(oob[..., None], jnp.asarray(fill, dt), mask_out)
    return img_out, mask_out.astype(mask.dtype)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def warp_joint_multipass(images: Array, masks: Array, mats: Array,
                         fill: float = 0.0,
                         pad_frac: float = 0.5,
                         fused: Optional[bool] = None,
                         interpret: bool = False,
                         disp: Optional[Tuple[Array, Array]] = None,
                         disp_k: int = 0) -> Tuple[Array, Array]:
    """Drop-in for warp.warp_joint(images, masks, mats, disp=None).

    images (B,H,W,C) float; masks (B,H,W,K); mats (B,3,3) inverse affine.

    ``pad_frac`` sizes the intermediate canvas padding (fraction of H/W
    per side).  Shears are centered, so intermediate excursion is bounded
    by |s|·size/2; the default 0.5 is lossless for any residual |θ| ≤ 45°
    (|s| = tan θ ≤ 1), i.e. for every affine after rot90 extraction.
    """
    b, h, w, _ = images.shape
    img = images
    msk = masks
    if h == w:
        k, s1, e1, e2, tx, ty, s2 = _decompose(mats, h, w)
        img = _rot90_select(img, k)
        msk = _rot90_select(msk, k)
    else:
        # rot90 pre-pass assumes square frames; with k=0 the factorization
        # is still valid for residual |θ| < 90° (shape-preserving rot90s
        # of non-square frames are rare configs).
        k, s1, e1, e2, tx, ty, s2 = _decompose_nok(mats, h, w)

    # center the shears about the image midpoint (minimal excursion) and
    # fold the induced translations into the scale pass:
    #   H1c = [[1,s1,-s1·cy],[0,1,0]],  H3c = [[1,0,0],[s2,1,-s2·cx]]
    #   ⇒ tx += s1·cy ; ty += e2·s2·cx
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    tx = tx + s1 * cy
    ty = ty + e2 * s2 * cx

    # pad sizes rounded up so the kernel canvases stay lane(128)/sublane(8)
    # aligned: w + 2px ≡ 0 (mod 128) for 128-multiple widths, ≡ 0 (mod 8)
    # otherwise (Mosaic rolls on ragged minor dims are untested territory)
    def _round_pad(p: int, dim: int) -> int:
        q = 64 if dim % 128 == 0 and dim >= 256 else 4
        return max(q, ((p + q - 1) // q) * q)

    px = _round_pad(int(math.ceil(w * pad_frac)), w)
    py = _round_pad(int(math.ceil(h * pad_frac)), h)
    if disp is not None:
        # elastic-in-kernel-Y needs the y-band: py ≥ K+1
        py = max(py, _round_pad(disp_k + 1, h))

    use_fused = use_pallas("STP_PALLAS_WARP") if fused is None else fused
    if use_fused:
        # fully-fused x/y pipelines: 2 launches, zero transposes, padding
        # and tap matrices built in VMEM (pallas_warp.py) — semantically
        # identical to the 3 passes below (property-tested); an elastic
        # displacement field rides the y-launch (kernel YE)
        from .pallas_warp import warp_joint_fused

        dyx = {} if disp is None else dict(dy=disp[1], dx=disp[0],
                                           k=disp_k)
        return warp_joint_fused(img, msk, s1, e1, e2, tx, ty, s2,
                                px, py, fill, interpret=interpret, **dyx)
    if disp is not None:
        # unfused fallback: affine passes then the separate elastic kernel
        img, msk = warp_joint_multipass(images, masks, mats, fill=fill,
                                        pad_frac=pad_frac, fused=False,
                                        interpret=interpret)
        from .pallas_elastic import warp_elastic_joint

        return warp_elastic_joint(img, msk, disp[1], disp[0], disp_k,
                                  fill=fill, interpret=interpret)

    # pass 1: x-shear (src_x = x + s1·(y-cy)) on an x-padded canvas
    img = jnp.pad(img, ((0, 0), (0, 0), (px, px), (0, 0)),
                  constant_values=fill).astype(images.dtype)
    msk = jnp.pad(msk, ((0, 0), (0, 0), (px, px), (0, 0)),
                  constant_values=fill).astype(masks.dtype)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :] - cy
    img, msk = _shear_pass(img, msk, s1[:, None] * ys, axis=2, fill=fill,
                           src_shift=px, orig_n=w)
    # pass 2: scale + translate (separable matmul); consumes x-padded,
    # emits y-padded
    img, msk = _scale_pass(img, msk, e1, tx, e2, ty, fill,
                           orig_hw=(h, w), pad_in_x=px, pad_out_y=py)
    # pass 3: y-shear (src_y = y + s2·(x-cx)) on the y-padded canvas.
    # Reads intermediate content (validity = whole canvas; the original
    # y-frame test already ran in the scale pass's Ry).
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    img, msk = _shear_pass(img, msk, s2[:, None] * xs, axis=1, fill=fill,
                           src_shift=0, out_slice=(py, h))
    return img, msk


def _decompose_nok(mats: Array, h: int, w: int):
    """Decomposition with k forced to 0 (non-square fallback)."""
    a = mats[:, 0, 0]
    b = mats[:, 0, 1]
    c = mats[:, 1, 0]
    d = mats[:, 1, 1]
    tx = mats[:, 0, 2]
    ty = mats[:, 1, 2]
    eps = 1e-6
    d_ = jnp.where(jnp.abs(d) < eps, eps, d)
    e2 = d_
    s1 = b / d_
    s2 = c / d_
    e1 = a - b * c / d_
    tpx = tx - s1 * ty
    tpy = ty
    k = jnp.zeros(a.shape, jnp.int32)
    return k, s1, e1, e2, tpx, tpy, s2
