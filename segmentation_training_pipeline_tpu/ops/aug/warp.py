"""Fused inverse-warp: the core of the on-device augmentation engine.

TPU-native design (BASELINE north-star: "imgaug-style augmentation block
lowers to fused image kernels executed on-device inside the input
pipeline"): instead of running N sequential imgaug ops on the host (each a
full image pass — the reference's input bottleneck, SURVEY §3.5), every
geometric augmenter contributes to a single per-image 3×3 **inverse** affine
matrix; elastic deformation adds a smoothed displacement field; then ONE
sampling pass applies the whole chain:

    out[b, i, j] = img[b, A_b·(j, i, 1) + D_b[i, j]]

Bilinear samples for images, nearest for masks — from the *same*
coordinates, so the mask always receives exactly the image's transform
(imgaug's joint image+segmentation-map guarantee, by construction).

This module holds the EXACT single-pass sampler (footprint gather) — the
only path that supports elastic displacement fields (true 2-D gather).
Pure-affine batches route through fast_warp.warp_joint_multipass instead
(gather-free shear/scale decomposition; Pallas-fused shear kernel in
pallas_shear.py), which is ~5x faster on TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# affine matrix algebra (3x3 homogeneous, (x, y) convention: x = col, y = row)
# ---------------------------------------------------------------------------

def identity_mats(b: int) -> Array:
    return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))


def compose(m_new: Array, m_acc: Array) -> Array:
    """Apply ``m_new`` AFTER ``m_acc`` in forward order — for inverse
    matrices this means right-multiplying: inv(N·A) = inv(A)·inv(N).
    precision=HIGHEST: the composed coefficients feed coordinate
    rounding (nearest-tap masks) — bf16 MXU input rounding would flip
    near-.5 taps vs the CPU lowering, and 3x3 products are free in f32."""
    return jnp.einsum("bij,bjk->bik", m_acc, m_new,
                      precision=jax.lax.Precision.HIGHEST)


def translation(tx: Array, ty: Array) -> Array:
    b = tx.shape[0]
    m = identity_mats(b)
    m = m.at[:, 0, 2].set(tx)
    m = m.at[:, 1, 2].set(ty)
    return m


def scale_about(cx: float, cy: float, sx: Array, sy: Array) -> Array:
    """Inverse scale about (cx, cy): src = c + (dst - c) / s."""
    b = sx.shape[0]
    m = identity_mats(b)
    inv_sx, inv_sy = 1.0 / sx, 1.0 / sy
    m = m.at[:, 0, 0].set(inv_sx)
    m = m.at[:, 1, 1].set(inv_sy)
    m = m.at[:, 0, 2].set(cx * (1.0 - inv_sx))
    m = m.at[:, 1, 2].set(cy * (1.0 - inv_sy))
    return m


def rotation_about(cx: float, cy: float, theta: Array) -> Array:
    """Inverse of a rotation by ``theta`` (radians, CCW in image coords)
    about the center: rotate by -theta."""
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = identity_mats(b)
    m = m.at[:, 0, 0].set(c)
    m = m.at[:, 0, 1].set(s)
    m = m.at[:, 1, 0].set(-s)
    m = m.at[:, 1, 1].set(c)
    tx = cx - c * cx - s * cy
    ty = cy + s * cx - c * cy
    m = m.at[:, 0, 2].set(tx)
    m = m.at[:, 1, 2].set(ty)
    return m


def shear_about(cx: float, cy: float, shx: Array, shy: Array) -> Array:
    """Inverse shear (x-shear by shx rad, y-shear by shy rad) about center."""
    b = shx.shape[0]
    tx_ = jnp.tan(shx)
    ty_ = jnp.tan(shy)
    det = 1.0 - tx_ * ty_
    a00 = 1.0 / det
    a01 = -tx_ / det
    a10 = -ty_ / det
    a11 = 1.0 / det
    m = identity_mats(b)
    m = m.at[:, 0, 0].set(a00)
    m = m.at[:, 0, 1].set(a01)
    m = m.at[:, 1, 0].set(a10)
    m = m.at[:, 1, 1].set(a11)
    m = m.at[:, 0, 2].set(cx - a00 * cx - a01 * cy)
    m = m.at[:, 1, 2].set(cy - a10 * cx - a11 * cy)
    return m


def hflip(w: int, flip: Array) -> Array:
    """Conditional horizontal flip (x' = W-1-x); ``flip`` is (B,) {0,1}."""
    b = flip.shape[0]
    f = flip.astype(jnp.float32)
    m = identity_mats(b)
    m = m.at[:, 0, 0].set(1.0 - 2.0 * f)
    m = m.at[:, 0, 2].set(f * (w - 1.0))
    return m


def vflip(h: int, flip: Array) -> Array:
    b = flip.shape[0]
    f = flip.astype(jnp.float32)
    m = identity_mats(b)
    m = m.at[:, 1, 1].set(1.0 - 2.0 * f)
    m = m.at[:, 1, 2].set(f * (h - 1.0))
    return m


def rot90s(h: int, w: int, k: Array) -> Array:
    """Inverse of rot90 applied k∈{0,1,2,3} times, matching
    ``np.rot90(img, k)`` / imgaug's Rot90 direction (CCW in array axes) —
    same convention as the flips/rot90 fast path.  Non-square rot90 keeps
    the output shape, i.e. rot90 + resize (documented deviation from
    imgaug's shape-changing Rot90)."""
    b = k.shape[0]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    theta = -k.astype(jnp.float32) * (jnp.pi / 2.0)
    # scale correction for non-square: odd k swaps axes
    odd = (k % 2 == 1).astype(jnp.float32)
    sx = 1.0 + odd * ((w / h) - 1.0)
    sy = 1.0 + odd * ((h / w) - 1.0)
    m = rotation_about(cx, cy, theta)
    return compose(scale_about(cx, cy, sx, sy), m)


# ---------------------------------------------------------------------------
# elastic displacement field (Simard et al. 2003)
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(sigma: Array, radius: int) -> Array:
    """(B, 2r+1) normalized gaussian taps for per-image sigma (traced)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x[None, :] / jnp.maximum(sigma[:, None], 1e-3)) ** 2)
    return k / k.sum(axis=1, keepdims=True)


def smooth_field(field: Array, sigma: Array, radius: int = 8) -> Array:
    """Separable per-image gaussian blur of (B, H, W) via two depthwise
    convs — O(H·W·r) instead of a dense 2-D kernel."""
    b, h, w = field.shape
    k = _gaussian_kernel1d(sigma, radius)  # (B, K)
    K = 2 * radius + 1

    # horizontal pass: pad W, convolve along W (kernel on the W axis of
    # HWIO — pairing the pad and conv axes matters for reflect edges)
    def blur1(img, kern):
        # img (H, W); kern (K,)
        # "symmetric" = scipy gaussian_filter's mode="reflect"
        pad = jnp.pad(img, ((0, 0), (radius, radius)), mode="symmetric")
        out = jax.lax.conv_general_dilated(
            pad[None, :, :, None], kern[None, :, None, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]
        return out

    fx = jax.vmap(blur1)(field, k)                       # along W
    fy = jax.vmap(lambda im, kern: blur1(im.T, kern).T)(fx, k)  # along H
    return fy


def elastic_field(rng: Array, b: int, h: int, w: int, alpha: Array,
                  sigma: Array, radius: int = 8,
                  stride: int = 1) -> Tuple[Array, Array]:
    """→ (dx, dy) each (B, H, W): smoothed uniform noise scaled by alpha.

    ``stride`` > 1 generates the field at (h/stride, w/stride) and
    bilinearly upsamples — the field is a sigma-blurred low-pass signal,
    so for sigma ≥ stride/2 the result is visually identical while the
    smoothing convs + noise generation shrink by stride².  (The lowering
    picks stride=4 when the config's minimum sigma allows it.)"""
    kx, ky = jax.random.split(rng)
    if stride > 1 and min(h, w) // stride <= 2 * max(2, radius // stride):
        stride = 1  # too small for the low-res path (reflect pad needs room)
    hs, ws = max(1, h // stride), max(1, w // stride)
    raw_x = jax.random.uniform(kx, (b, hs, ws), minval=-1.0, maxval=1.0)
    raw_y = jax.random.uniform(ky, (b, hs, ws), minval=-1.0, maxval=1.0)
    sig = sigma / float(stride)
    rad = max(2, radius // stride)
    amp = alpha
    if stride > 1:
        # Smoothing iid noise with a normalized kernel k leaves the field
        # with std ∝ ||k||₂² (separable 2-D), so the narrower low-res
        # kernel yields a ~stride× HOTTER field for the same alpha.
        # Rescale by the exact norm ratio so displacement statistics
        # match the full-res path.
        k_full = _gaussian_kernel1d(sigma, radius)
        k_low = _gaussian_kernel1d(sig, rad)
        ratio = ((k_full ** 2).sum(axis=1) / (k_low ** 2).sum(axis=1))
        amp = alpha * ratio  # (B,)
    dx = smooth_field(raw_x, sig, rad) * amp[:, None, None]
    dy = smooth_field(raw_y, sig, rad) * amp[:, None, None]
    if stride > 1:
        dx = jax.image.resize(dx, (b, h, w), "bilinear")
        dy = jax.image.resize(dy, (b, h, w), "bilinear")
    return dx, dy


# ---------------------------------------------------------------------------
# the fused sampler
# ---------------------------------------------------------------------------

def _source_coords(mats: Array, h: int, w: int,
                   disp: Optional[Tuple[Array, Array]]) -> Tuple[Array, Array]:
    """Output grid → source (x, y) float coords per image: (B, H, W) each."""
    jj = jnp.arange(w, dtype=jnp.float32)[None, :]      # x (cols)
    ii = jnp.arange(h, dtype=jnp.float32)[:, None]      # y (rows)
    grid_x = jnp.broadcast_to(jj, (h, w))
    grid_y = jnp.broadcast_to(ii, (h, w))
    # x_src = a00 x + a01 y + a02 ; y_src = a10 x + a11 y + a12
    a = mats[:, None, None, :, :]  # (B,1,1,3,3)
    x_src = (a[..., 0, 0] * grid_x + a[..., 0, 1] * grid_y + a[..., 0, 2])
    y_src = (a[..., 1, 0] * grid_x + a[..., 1, 1] * grid_y + a[..., 1, 2])
    if disp is not None:
        dx, dy = disp
        x_src = x_src + dx
        y_src = y_src + dy
    return x_src, y_src


def _gather2d(img: Array, iy: Array, ix: Array) -> Array:
    """img (H, W, C), iy/ix (H, W) int32 → (H, W, C)."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h * w, -1)
    idx = (iy * w + ix).reshape(-1)
    return jnp.take(flat, idx, axis=0).reshape(h, w, -1)


def warp_joint(images: Array, masks: Array, mats: Array,
               disp: Optional[Tuple[Array, Array]] = None,
               fill: float = 0.0, gather_u8: bool = False) -> Tuple[Array, Array]:
    """One footprint gather for image AND mask channels together:
    bilinear interpolation for the image channels, exact nearest-neighbor
    for the mask channels (selected from the same (2,2) footprint by
    rounding the fractional offsets).  Saves a whole second gather pass
    and guarantees identical source coordinates by construction.

    ``gather_u8``: gather uint8 instead of float32 — 4x less random-access
    HBM traffic.  Lossless ONLY when image values are integers in [0, 255]
    and mask values are integers in [0, 255] (true inside the augmentation
    pipeline: images come straight from uint8 decode, masks are one-hot)."""
    b, h, w, c = images.shape
    k = masks.shape[-1]
    x_src, y_src = _source_coords(mats, h, w, disp)

    gdt = jnp.uint8 if gather_u8 else jnp.float32
    joint = jnp.concatenate([images.astype(gdt),
                             masks.astype(gdt)], axis=-1)
    x0 = jnp.clip(jnp.floor(x_src), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y_src), 0, h - 2)
    fx = jnp.clip(x_src - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y_src - y0, 0.0, 1.0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    ck = c + k

    def per_image(img, yy, xx):
        starts = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(img, starts, dn, slice_sizes=(2, 2, ck),
                              mode=jax.lax.GatherScatterMode.CLIP)

    pads = jax.vmap(per_image)(joint, y0i, x0i).reshape(b, h, w, 2, 2, ck)
    img_pads = pads[..., :c].astype(jnp.float32)
    out_img = ((1 - fy) * ((1 - fx) * img_pads[..., 0, 0, :]
                           + fx * img_pads[..., 0, 1, :])
               + fy * ((1 - fx) * img_pads[..., 1, 0, :]
                       + fx * img_pads[..., 1, 1, :]))
    # nearest for masks: pick the footprint corner by rounded offsets
    mask_pads = pads[..., c:]
    ry = (fy >= 0.5)
    rx = (fx >= 0.5)
    m00, m01 = mask_pads[..., 0, 0, :], mask_pads[..., 0, 1, :]
    m10, m11 = mask_pads[..., 1, 0, :], mask_pads[..., 1, 1, :]
    out_mask = jnp.where(ry, jnp.where(rx, m11, m10),
                         jnp.where(rx, m01, m00))
    oob = ((x_src < -0.5) | (x_src > w - 0.5)
           | (y_src < -0.5) | (y_src > h - 0.5))[..., None]
    out_img = jnp.where(oob, fill, out_img)
    out_mask = jnp.where(oob, jnp.asarray(fill, out_mask.dtype), out_mask)
    return out_img, out_mask.astype(masks.dtype)


def warp(images: Array, mats: Array,
         disp: Optional[Tuple[Array, Array]] = None,
         method: str = "bilinear", fill: float = 0.0) -> Array:
    """Apply the composed inverse transform.  images (B, H, W, C) any dtype;
    returns float32 (bilinear) or input dtype (nearest)."""
    b, h, w, c = images.shape
    x_src, y_src = _source_coords(mats, h, w, disp)

    if method == "nearest":
        ix = jnp.clip(jnp.round(x_src), 0, w - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.round(y_src), 0, h - 1).astype(jnp.int32)
        out = jax.vmap(_gather2d)(images, iy, ix)
        oob = ((x_src < -0.5) | (x_src > w - 0.5)
               | (y_src < -0.5) | (y_src > h - 0.5))
        return jnp.where(oob[..., None], jnp.asarray(fill, images.dtype), out)

    # Bilinear via ONE footprint gather: each index fetches its whole
    # (2, 2, C) neighborhood.  ~1.65x faster than 4 separate gathers on
    # TPU (109 ms vs 180 ms at B16 512² — measured; gathers are per-index
    # overhead-bound, not byte-bound).
    imgs = images.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor(x_src), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y_src), 0, h - 2)
    fx = jnp.clip(x_src - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y_src - y0, 0.0, 1.0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def per_image(img, yy, xx):
        starts = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(img, starts, dn, slice_sizes=(2, 2, c),
                              mode=jax.lax.GatherScatterMode.CLIP)

    pads = jax.vmap(per_image)(imgs, y0i, x0i)      # (B, H*W, 2, 2, C)
    pads = pads.reshape(b, h, w, 2, 2, c)
    out = ((1 - fy) * ((1 - fx) * pads[..., 0, 0, :] + fx * pads[..., 0, 1, :])
           + fy * ((1 - fx) * pads[..., 1, 0, :] + fx * pads[..., 1, 1, :]))
    oob = ((x_src < -0.5) | (x_src > w - 0.5)
           | (y_src < -0.5) | (y_src > h - 0.5))
    return jnp.where(oob[..., None], fill, out)
