"""Photometric (pixel-value) augmenters — image-only, mask untouched.

All run fused-elementwise on device after the geometric warp; each takes
per-image parameters shaped (B,) (or (B, 1) for per-channel variants) so
one XLA program covers the whole batch.  Value semantics follow imgaug's
uint8 conventions (operate in 0..255 space, clip at the end).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _bcast(param: Array) -> Array:
    """(B,) → (B,1,1,1) or (B,C) → (B,1,1,C) (imgaug per_channel=True)."""
    if param.ndim == 2:
        return param[:, None, None, :]
    return param[:, None, None, None]


def multiply(images: Array, factor: Array) -> Array:
    return images * _bcast(factor)


def add(images: Array, value: Array) -> Array:
    return images + _bcast(value)


# ---------------------------------------------------------------------------
# HSV color ops (imgaug AddToHueAndSaturation / MultiplyHueAndSaturation).
# OpenCV uint8 convention: H in [0, 180), S and V in [0, 255].
# ---------------------------------------------------------------------------

def _rgb_to_hsv(images: Array) -> Tuple[Array, Array, Array]:
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = mx - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    hr = jnp.mod((g - b) / safe_c, 6.0)
    hg = (b - r) / safe_c + 2.0
    hb = (r - g) / safe_c + 4.0
    hh = jnp.where(mx == r, hr, jnp.where(mx == g, hg, hb))
    h = jnp.where(c > 0, hh * 30.0, 0.0)          # [0, 180)
    s = jnp.where(mx > 0, c / jnp.where(mx > 0, mx, 1.0), 0.0) * 255.0
    return h, s, mx


def _hsv_to_rgb(h: Array, s: Array, v: Array) -> Array:
    hh = h / 30.0                                  # [0, 6)
    c = (s / 255.0) * v
    x = c * (1.0 - jnp.abs(jnp.mod(hh, 2.0) - 1.0))
    m = v - c
    zero = jnp.zeros_like(c)
    i = jnp.floor(hh).astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [c, x, zero, zero, x], c)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [x, c, c, x, zero], zero)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [zero, zero, x, c, c], x)
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def add_to_hue_and_saturation(images: Array, value_hue: Array,
                              value_sat: Array) -> Array:
    """imgaug AddToHueAndSaturation: value range (-255, 255); hue adds at
    half weight (H spans 0..180 in OpenCV space) with wraparound, saturation
    adds clipped."""
    if images.shape[-1] != 3:
        return images
    h, s, v = _rgb_to_hsv(images)
    h = jnp.mod(h + 0.5 * value_hue[:, None, None], 180.0)
    s = jnp.clip(s + value_sat[:, None, None], 0.0, 255.0)
    return _hsv_to_rgb(h, s, v)


def multiply_hue_and_saturation(images: Array, mul_hue: Array,
                                mul_sat: Array) -> Array:
    """imgaug MultiplyHueAndSaturation: hue scales about the 0-origin with
    wraparound, saturation scales clipped."""
    if images.shape[-1] != 3:
        return images
    h, s, v = _rgb_to_hsv(images)
    h = jnp.mod(h * mul_hue[:, None, None], 180.0)
    s = jnp.clip(s * mul_sat[:, None, None], 0.0, 255.0)
    return _hsv_to_rgb(h, s, v)


def linear_contrast(images: Array, alpha: Array) -> Array:
    # imgaug LinearContrast: 127 + alpha * (v - 127)
    a = alpha[:, None, None, None]
    return 127.0 + a * (images - 127.0)


def gamma_contrast(images: Array, gamma: Array) -> Array:
    """imgaug GammaContrast: v' = 255·(v/255)^gamma (per image, optional
    per-channel when gamma is (B, C))."""
    x = jnp.clip(images, 0.0, 255.0) / 255.0
    return jnp.power(x, _bcast(gamma)) * 255.0


def sigmoid_contrast(images: Array, gain: Array, cutoff: Array) -> Array:
    """imgaug SigmoidContrast: v' = 255/(1 + exp(gain·(cutoff − v/255)))."""
    x = jnp.clip(images, 0.0, 255.0) / 255.0
    return 255.0 / (1.0 + jnp.exp(_bcast(gain) * (_bcast(cutoff) - x)))


def log_contrast(images: Array, gain: Array) -> Array:
    """imgaug LogContrast: v' = 255·gain·log2(1 + v/255)."""
    x = jnp.clip(images, 0.0, 255.0) / 255.0
    return 255.0 * _bcast(gain) * jnp.log2(1.0 + x)


def gaussian_noise(rng: Array, images: Array, scale: Array) -> Array:
    noise = jax.random.normal(rng, images.shape, jnp.float32)
    return images + noise * scale[:, None, None, None]


def grayscale(images: Array, alpha: Array) -> Array:
    """Blend toward ITU-R 601 luminance by per-image alpha."""
    if images.shape[-1] != 3:
        return images
    lum = (0.299 * images[..., 0] + 0.587 * images[..., 1]
           + 0.114 * images[..., 2])[..., None]
    a = alpha[:, None, None, None]
    return (1.0 - a) * images + a * lum


def _separable_filter(images, kern, radius: int):
    """Apply a per-image separable 1-D kernel (B, K) along x then y with
    reflect padding (shared by gaussian_blur / average_blur)."""
    c = images.shape[-1]

    def one(img, kr):  # img (H, W, C), kr (K,)
        pad = jnp.pad(img, ((0, 0), (radius, radius), (0, 0)), mode="reflect")
        horiz = jax.lax.conv_general_dilated(
            pad[None], jnp.tile(kr[None, :, None, None], (1, 1, 1, c)),
            (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        pad2 = jnp.pad(horiz, ((radius, radius), (0, 0), (0, 0)),
                       mode="reflect")
        return jax.lax.conv_general_dilated(
            pad2[None], jnp.tile(kr[:, None, None, None], (1, 1, 1, c)),
            (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    return jax.vmap(one)(images, kern)


def gaussian_blur(images: Array, sigma: Array, radius: int = 3) -> Array:
    """Separable per-image gaussian blur; sigma (B,).  sigma≈0 degenerates
    to (numerically) the identity kernel, so 'no blur' costs only the fused
    conv — no data-dependent branch."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x[None, :] / jnp.maximum(sigma[:, None], 1e-3)) ** 2)
    k = k / k.sum(axis=1, keepdims=True)  # (B, K)
    return _separable_filter(images, k, radius)


def average_blur(images: Array, k: Array, radius: int = 3) -> Array:
    """imgaug AverageBlur: k×k box filter, k (B,) float rounded to the
    nearest odd ≤ 2·radius+1 (k ≤ 1 is the identity).  Separable — same
    structure as gaussian_blur, with a per-image 0/1-masked uniform
    kernel so no data-dependent branch exists."""
    half = jnp.clip(jnp.floor((k - 1.0) / 2.0 + 0.5), 0, radius)  # (B,)
    x = jnp.abs(jnp.arange(-radius, radius + 1, dtype=jnp.float32))
    kern = (x[None, :] <= half[:, None]).astype(jnp.float32)
    kern = kern / kern.sum(axis=1, keepdims=True)  # (B, K)
    return _separable_filter(images, kern, radius)


def additive_poisson_noise(rng: Array, images: Array, lam: Array) -> Array:
    """imgaug AdditivePoissonNoise: adds Poisson(lam) counts per pixel
    (always non-negative, per-pixel independent)."""
    noise = jax.random.poisson(
        rng, jnp.maximum(lam, 0.0)[:, None, None, None],
        shape=images.shape).astype(jnp.float32)
    return images + noise


def invert(rng: Array, images: Array, p: Array) -> Array:
    """imgaug Invert: per-image bernoulli(p) 255-v inversion."""
    b = images.shape[0]
    flip = jax.random.bernoulli(rng, p, (b,))[:, None, None, None]
    return jnp.where(flip, 255.0 - images, images)


def solarize(images: Array, threshold: Array) -> Array:
    """Invert only values above the per-image threshold (PIL semantics)."""
    t = threshold[:, None, None, None]
    return jnp.where(images >= t, 255.0 - images, images)


def _depthwise3x3(img: Array, k: Array) -> Array:
    """Reflect-padded depthwise 3x3 conv of one (H, W, C) image."""
    c = img.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        pad[None], kern, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]


def sharpen(images: Array, alpha: Array, lightness: Array) -> Array:
    """imgaug Sharpen: blend with the UNNORMALIZED 3x3 kernel
    [[-1,-1,-1],[-1, 8+l,-1],[-1,-1,-1]] (sums to l, so flat regions
    scale by lightness — imgaug's exact semantics)."""
    lap = jnp.array([[-1.0, -1.0, -1.0],
                     [-1.0, 8.0, -1.0],
                     [-1.0, -1.0, -1.0]], jnp.float32)

    def one(img, li):
        return _depthwise3x3(img, lap.at[1, 1].add(li))

    sharp = jax.vmap(one)(images, lightness)
    a = alpha[:, None, None, None]
    return (1.0 - a) * images + a * sharp


def emboss(images: Array, alpha: Array, strength: Array) -> Array:
    """imgaug Emboss: blend with an embossing 3x3 response."""

    def one(img, s):
        k = jnp.array([[-1.0 - s, -s, 0.0],
                       [-s, 1.0, s],
                       [0.0, s, 1.0 + s]], jnp.float32)
        return _depthwise3x3(img, k)

    emb = jax.vmap(one)(images, strength)
    a = alpha[:, None, None, None]
    return (1.0 - a) * images + a * emb


def pixel_dropout(rng: Array, images: Array, p: Array) -> Array:
    """imgaug Dropout: zero individual pixels with probability p (all
    channels together, like imgaug's default per_channel=False)."""
    b, h, w, _ = images.shape
    keep = (jax.random.uniform(rng, (b, h, w, 1))
            >= p[:, None, None, None]).astype(jnp.float32)
    return images * keep


def salt_and_pepper(rng: Array, images: Array, p: Array) -> Array:
    """imgaug SaltAndPepper: replace a fraction p of pixels with 0 or 255
    (half each)."""
    b, h, w, _ = images.shape
    u = jax.random.uniform(rng, (b, h, w, 1))
    pp = p[:, None, None, None]
    out = jnp.where(u < pp * 0.5, 0.0, images)
    return jnp.where((u >= pp * 0.5) & (u < pp), 255.0, out)


def coarse_dropout(rng: Array, images: Array, p: Array,
                   size_frac: float = 0.1) -> Array:
    """imgaug CoarseDropout: drop rectangles covering ~p of a coarse grid.
    A low-res bernoulli mask is nearest-upsampled over the image (all
    channels), giving blocky cutout regions."""
    b, h, w, c = images.shape
    gh = max(1, int(round(h * size_frac)))
    gw = max(1, int(round(w * size_frac)))
    keep = jax.random.uniform(rng, (b, gh, gw, 1)) >= p[:, None, None, None]
    mask = jax.image.resize(keep.astype(jnp.float32), (b, h, w, 1), "nearest")
    return images * mask


def _depthwise_kxk(img: Array, k2d: Array, radius: int) -> Array:
    """Reflect-padded depthwise (2r+1)² conv of one (H, W, C) image."""
    c = img.shape[-1]
    kern = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c))
    pad = jnp.pad(img, ((radius, radius), (radius, radius), (0, 0)),
                  mode="reflect")
    return jax.lax.conv_general_dilated(
        pad[None], kern, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]


def motion_blur(images: Array, k: Array, angle: Array,
                radius: int = 3) -> Array:
    """imgaug MotionBlur: k×k kernel with a 1-px anti-aliased line through
    the center at ``angle`` degrees (imgaug draws a vertical center column
    and rotates it — angle 0 blurs vertically, 90 horizontally),
    normalized to sum 1.  ``k``/``angle`` are (B,) per-image samples; the
    kernel canvas is static (2·radius+1)² with taps beyond the per-image
    half-length masked to zero — no data-dependent shapes."""
    coords = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(coords, coords, indexing="ij")  # (K, K)
    half = jnp.clip(jnp.floor((k - 1.0) / 2.0 + 0.5), 1, radius)  # (B,)
    a = angle * (jnp.pi / 180.0)
    # vertical baseline rotated by `angle` (x right, y down)
    dx, dy = jnp.sin(a), jnp.cos(a)  # (B,)
    proj = gx[None] * dx[:, None, None] + gy[None] * dy[:, None, None]
    perp = jnp.abs(gx[None] * dy[:, None, None] - gy[None] * dx[:, None, None])
    # integer taps with |proj| <= half carry full weight (cv2 draws the
    # line hard); the anti-aliasing lives in the perpendicular falloff
    w = jnp.clip(1.0 - perp, 0.0, 1.0) * \
        jnp.clip(half[:, None, None] + 1.0 - jnp.abs(proj), 0.0, 1.0)
    w = w / jnp.maximum(w.sum(axis=(1, 2), keepdims=True), 1e-8)  # (B, K, K)
    return jax.vmap(lambda img, ker: _depthwise_kxk(img, ker, radius))(
        images, w)


def _median9(taps):
    """Median of 9 via the classic 19-comparator network (Smith 1996 /
    Paeth's Graphics Gems median) — pure min/max, no generic sort.
    Measured 195 → ~30 ms vs ``jnp.sort`` at B128 512² on TPU
    (tools/photo_prof.py)."""
    t = list(taps)
    for i, j in [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7),
                 (1, 2), (4, 5), (7, 8), (0, 3), (5, 8), (4, 7),
                 (3, 6), (1, 4), (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)]:
        a, b = t[i], t[j]
        t[i] = jnp.minimum(a, b)
        t[j] = jnp.maximum(a, b)
    return t[4]


def median_blur(images: Array, ksize: int = 3) -> Array:
    """cv2/imgaug MedianBlur with STATIC odd ``ksize`` (replicate border):
    k² shifted copies reduce through a median network (k=3) or a small
    fixed-size sort (larger k) — no data-dependent control flow."""
    if ksize <= 1:
        return images
    r = ksize // 2
    pad = jnp.pad(images, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    h, w = images.shape[1], images.shape[2]
    taps = [pad[:, dy:dy + h, dx:dx + w, :]
            for dy in range(ksize) for dx in range(ksize)]
    if ksize == 3:
        return _median9(taps)
    stack = jnp.stack(taps, axis=-1)  # (B, H, W, C, k²)
    return jnp.sort(stack, axis=-1)[..., (ksize * ksize) // 2]


def _hist256(values: Array) -> Array:
    """(..., N) int32 → (..., 256) float32 histogram.

    Broadcast-compare + reduce instead of vmapped ``bincount``: XLA:TPU
    lowers the scatter-add behind bincount to a SERIAL loop (measured
    2.35 s for B128 512² — tools/photo_prof.py), while the compare
    masked-sum fuses into a vectorized VPU reduction with no materialized
    (..., N, 256) intermediate.  Counts ≤ 2²⁴ are exact in f32."""
    bins = jnp.arange(256, dtype=jnp.int32)
    return jnp.sum((values[..., None] == bins).astype(jnp.float32),
                   axis=-2)


def _apply_lut256(lut: Array, values: Array) -> Array:
    """LUT lookup ``lut[..., values]`` as a compare-masked reduction —
    gather-free for the same reason as :func:`_hist256` (XLA:TPU gathers
    of (..., 256) tables serialize).  lut (..., 256), values (..., N)."""
    bins = jnp.arange(256, dtype=jnp.int32)
    return jnp.sum(jnp.where(values[..., None] == bins,
                             lut[..., None, :], 0.0), axis=-1)


def clahe(images: Array, clip_limit: Array, tile_grid: int = 8) -> Array:
    """cv2 CLAHE per channel (imgaug AllChannelsCLAHE): per-tile clipped
    256-bin histogram → LUT, bilinearly interpolated between the four
    neighbouring tile LUTs at every pixel.  ``clip_limit`` is (B,) —
    cv2's ``clipLimit`` (counts are capped at
    ``max(clip_limit·tile_area/256, 1)``; ≤0 disables clipping).

    Deviations (docs/schema.md): ``tile_grid`` is a static grid COUNT like
    cv2's ``tileGridSize`` (imgaug samples per-image pixel tile sizes,
    which would be dynamic shapes); non-divisible frames pad with
    reflect-101 like cv2; the clipped-excess redistribution follows cv2's
    integer quotient + strided-residual scheme exactly."""
    b, h, w, c = images.shape
    g = int(tile_grid)
    th, tw = -(-h // g), -(-w // g)
    pad_h, pad_w = th * g - h, tw * g - w
    x = images
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    mode="reflect")
    big_h, big_w = th * g, tw * g
    area = th * tw
    v = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)
    v = v.transpose(0, 3, 1, 2)                     # (B, C, H, W)
    tiles = (v.reshape(b, c, g, th, g, tw)
              .transpose(0, 1, 2, 4, 3, 5)
              .reshape(b, c, g, g, area))
    hist = _hist256(tiles)                          # (B, C, g, g, 256)
    cl = jnp.maximum(jnp.floor(clip_limit * area / 256.0), 1.0)
    cl = jnp.where(clip_limit > 0.0, cl, float(area))  # ≤0 → no clipping
    cl = cl[:, None, None, None, None]
    excess = jnp.sum(jnp.maximum(hist - cl, 0.0), axis=-1, keepdims=True)
    # cv2's exact redistribution: integer quotient to every bin, then the
    # residual as +1 on bins 0, s, 2s, … with s = max(256//residual, 1)
    quot = jnp.floor(excess / 256.0)
    res = excess - 256.0 * quot
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(res, 1.0)), 1.0)
    idx = jnp.arange(256, dtype=jnp.float32)
    inc = ((jnp.mod(idx, step) == 0.0)
           & (jnp.floor(idx / step) < res)).astype(jnp.float32)
    hist = jnp.minimum(hist, cl) + quot + inc
    lut = jnp.clip(jnp.round(jnp.cumsum(hist, axis=-1) * (255.0 / area)),
                   0.0, 255.0)                      # (B, C, g, g, 256)

    if th % 2 == 0 and tw % 2 == 0:
        out = _clahe_apply_blocked(lut, v, g, th, tw)
    else:  # odd tiles only arise from non-divisible-frame padding
        out = _clahe_apply_gather(lut, v, g, th, tw)
    out = jnp.round(out).transpose(0, 2, 3, 1)      # back to NHWC
    return out[:, :h, :w, :]


def _clahe_apply_blocked(lut: Array, v: Array, g: int, th: int,
                         tw: int) -> Array:
    """Bilinear interpolation between tile-center LUTs, gather-free.

    Within each HALF-tile block the two neighbouring tile indices are
    constants, so the frame reshapes into a (2g, th/2, 2g, tw/2) block
    grid where each of the four taps is one :func:`_apply_lut256`
    compare-reduce against a statically-selected LUT — the fast path that
    took CLAHE from 7.4 s to VPU-bound at B128 512²
    (tools/photo_prof.py).  cv2's clamping at the outer half-tiles falls
    out of the index clipping (both neighbours become the border tile)."""
    b, c = v.shape[0], v.shape[1]
    th2, tw2 = th // 2, tw // 2
    p = np.arange(2 * g)
    iy0 = np.clip((p - 1) // 2, 0, g - 1)
    iy1 = np.clip((p + 1) // 2, 0, g - 1)

    def sel(a_idx, b_idx):                         # (B,C,2g,2g,256)
        return lut[:, :, a_idx][:, :, :, b_idx]

    # block-major pixel layout: (B, C, 2g, 2g, th2*tw2)
    v6 = (v.reshape(b, c, 2 * g, th2, 2 * g, tw2)
           .transpose(0, 1, 2, 4, 3, 5)
           .reshape(b, c, 2 * g, 2 * g, th2 * tw2))
    taps = [_apply_lut256(sel(ia, ib), v6)
            for ia in (iy0, iy1) for ib in (iy0, iy1)]
    # fractional weights: ya = 0.5 + yy/th on even half-rows, yy/th on odd
    yy = jnp.arange(th2, dtype=jnp.float32)
    half = (jnp.arange(2 * g) % 2 == 0).astype(jnp.float32)
    wy = half[:, None] * 0.5 + yy[None, :] / th     # (2g, th2)
    xx = jnp.arange(tw2, dtype=jnp.float32)
    wx = half[:, None] * 0.5 + xx[None, :] / tw     # (2g, tw2)
    wya = wy[None, None, :, None, :, None]          # (1,1,2g,1,th2,1)
    wxa = wx[None, None, None, :, None, :]          # (1,1,1,2g,1,tw2)
    shape6 = (b, c, 2 * g, 2 * g, th2, tw2)
    t00, t01, t10, t11 = (t.reshape(shape6) for t in taps)
    out = ((1.0 - wya) * (1.0 - wxa) * t00 + (1.0 - wya) * wxa * t01
           + wya * (1.0 - wxa) * t10 + wya * wxa * t11)
    return (out.transpose(0, 1, 2, 4, 3, 5)
               .reshape(b, c, 2 * g * th2, 2 * g * tw2))


def _clahe_apply_gather(lut: Array, v: Array, g: int, th: int,
                        tw: int) -> Array:
    """Per-pixel 4-tap LUT gather — exact same math as the blocked path,
    for odd (padded) tile sizes; slow on TPU (XLA serializes the gather),
    fine on CPU."""
    big_h, big_w = th * g, tw * g
    tyf = jnp.arange(big_h, dtype=jnp.float32) / th - 0.5
    txf = jnp.arange(big_w, dtype=jnp.float32) / tw - 0.5
    iy0 = jnp.floor(tyf)
    ix0 = jnp.floor(txf)
    wy1 = (tyf - iy0)[:, None]                      # (H, 1)
    wx1 = (txf - ix0)[None, :]                      # (1, W)
    iy0c = jnp.clip(iy0, 0, g - 1).astype(jnp.int32)
    iy1c = jnp.clip(iy0 + 1, 0, g - 1).astype(jnp.int32)
    ix0c = jnp.clip(ix0, 0, g - 1).astype(jnp.int32)
    ix1c = jnp.clip(ix0 + 1, 0, g - 1).astype(jnp.int32)

    def one(lut_bc: Array, v_bc: Array) -> Array:   # (g,g,256), (H,W)
        def tap(iy, ix):
            return lut_bc[iy[:, None], ix[None, :], v_bc]
        return ((1.0 - wy1) * (1.0 - wx1) * tap(iy0c, ix0c)
                + (1.0 - wy1) * wx1 * tap(iy0c, ix1c)
                + wy1 * (1.0 - wx1) * tap(iy1c, ix0c)
                + wy1 * wx1 * tap(iy1c, ix1c))

    return jax.vmap(jax.vmap(one))(lut, v)


# --- JPEG compression simulation (imgaug JpegCompression) ------------------
# Standard Annex-K quantization tables; quality scaling follows libjpeg's
# jpeg_quality_scaling (5000/q below 50, 200-2q above).

_JPEG_LUMA_Q = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61],
     [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56],
     [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77],
     [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101],
     [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)

_JPEG_CHROMA_Q = np.array(
    [[17, 18, 24, 47, 99, 99, 99, 99],
     [18, 21, 26, 66, 99, 99, 99, 99],
     [24, 26, 56, 99, 99, 99, 99, 99],
     [47, 66, 99, 99, 99, 99, 99, 99],
     [99, 99, 99, 99, 99, 99, 99, 99],
     [99, 99, 99, 99, 99, 99, 99, 99],
     [99, 99, 99, 99, 99, 99, 99, 99],
     [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


def _dct8() -> Array:
    """Orthonormal 8-point DCT-II matrix."""
    n = np.arange(8, dtype=np.float64)
    d = np.cos((2.0 * n[None, :] + 1.0) * n[:, None] * np.pi / 16.0)
    d[0] *= np.sqrt(0.5)
    return jnp.asarray(d * 0.5, jnp.float32)


def _jpeg_qtable(base: np.ndarray, quality: Array) -> Array:
    q = jnp.clip(quality, 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)  # (B,)
    t = jnp.floor((jnp.asarray(base)[None] * scale[:, None, None] + 50.0)
                  / 100.0)
    return jnp.clip(t, 1.0, 255.0)                  # (B, 8, 8)


def _dct_quant_plane(plane: Array, qt: Array) -> Array:
    """8×8 block DCT → quantize/dequantize → inverse, as batched einsums
    (MXU-shaped: every 8×8 transform is a pair of small matmuls XLA maps
    onto the systolic array).  plane (B, H, W) with H, W % 8 == 0."""
    b, h, w = plane.shape
    d = _dct8()
    blocks = plane.reshape(b, h // 8, 8, w // 8, 8)
    # HIGHEST precision: TPU default matmul truncates f32 to bf16, and a
    # ~0.3% coefficient error flips quantization bins outright at
    # high-quality tables (q as low as 1-2) — same trap fast_warp.py
    # documents for its tap-matrix dots
    hp = jax.lax.Precision.HIGHEST
    coef = jnp.einsum("ui,bhiwj,vj->bhuwv", d, blocks, d, precision=hp)
    qb = qt[:, None, :, None, :]                    # broadcast over blocks
    coef = jnp.round(coef / qb) * qb
    out = jnp.einsum("ui,bhuwv,vj->bhiwj", d, coef, d, precision=hp)
    return out.reshape(b, h, w)


def jpeg_compression(images: Array, quality: Array) -> Array:
    """imgaug JpegCompression simulated in-graph: RGB→YCbCr (BT.601
    full-range), 4:2:0 chroma subsampling (2×2 mean down, half-pixel
    bilinear up — exactly libjpeg's "fancy" triangle upsampling), 8×8
    block DCT quantization with the Annex-K tables at per-image
    ``quality`` (B,).  The entropy coding stage is lossless and therefore
    skipped; deviations from a real codec round-trip are ≤ a few gray
    levels (docs/schema.md)."""
    b, h, w, c = images.shape
    if c not in (1, 3):
        return images
    pad_h, pad_w = (-h) % 16, (-w) % 16
    x = jnp.clip(images, 0.0, 255.0)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    big_h, big_w = h + pad_h, w + pad_w
    q_luma = _jpeg_qtable(_JPEG_LUMA_Q, quality)
    if c == 1:
        out = _dct_quant_plane(x[..., 0] - 128.0, q_luma)[..., None] + 128.0
    else:
        r, g, bl = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        q_chroma = _jpeg_qtable(_JPEG_CHROMA_Q, quality)
        yq = _dct_quant_plane(y - 128.0, q_luma) + 128.0

        def chroma(p: Array) -> Array:
            ds = p.reshape(b, big_h // 2, 2, big_w // 2, 2).mean(axis=(2, 4))
            dq = _dct_quant_plane(ds - 128.0, q_chroma) + 128.0
            return jax.image.resize(dq, (b, big_h, big_w), "bilinear")

        cbq, crq = chroma(cb), chroma(cr)
        out = jnp.stack([yq + 1.402 * (crq - 128.0),
                         yq - 0.344136 * (cbq - 128.0)
                         - 0.714136 * (crq - 128.0),
                         yq + 1.772 * (cbq - 128.0)], axis=-1)
    return jnp.clip(jnp.round(out), 0.0, 255.0)[:, :h, :w, :]


def autocontrast(images: Array, cutoff: float = 0.0) -> Array:
    """PIL ``ImageOps.autocontrast`` per channel (imgaug
    pillike.Autocontrast): linearly stretch each channel so its
    [cutoff, 100−cutoff] range maps to 0..255; channels with no range
    pass through.  The cutoff removes ``cutoff·N/100`` COUNTS from each
    histogram end exactly like PIL (computed from a :func:`_hist256`
    histogram — the earlier ``jnp.quantile`` sort cost 346 ms at B128
    512² on TPU, tools/photo_prof.py).  ``cutoff`` is a STATIC percent
    here (imgaug can sample it per image — docs/schema.md deviation);
    output stays continuous float (no uint8 LUT rounding)."""
    b, h, w, c = images.shape
    x = jnp.clip(images, 0.0, 255.0)
    flat = x.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    if cutoff > 0.0:
        hist = _hist256(jnp.round(flat).astype(jnp.int32))  # (B, C, 256)
        cut = float(int(cutoff * h * w / 100.0))
        lo = jnp.argmax(jnp.cumsum(hist, -1) > cut, axis=-1)
        hi = 255 - jnp.argmax(jnp.cumsum(hist[..., ::-1], -1) > cut,
                              axis=-1)
        lo = lo[..., None].astype(jnp.float32)
        hi = hi[..., None].astype(jnp.float32)
    else:
        lo = flat.min(axis=-1, keepdims=True)
        hi = flat.max(axis=-1, keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = jnp.where(hi > lo, (flat - lo) * scale, flat)
    return jnp.clip(out, 0.0, 255.0).reshape(b, c, h, w).transpose(0, 2, 3, 1)


def posterize(images: Array, nb_bits: Array) -> Array:
    """PIL/imgaug Posterize: keep the top n bits of every value
    (``v & ~(2^(8-n)-1)`` == floor to the 2^(8-n) grid); n (B,) rounds to
    an integer in [1, 8]."""
    n = jnp.clip(jnp.round(nb_bits), 1.0, 8.0)[:, None, None, None]
    step = jnp.exp2(8.0 - n)
    return jnp.floor(jnp.clip(images, 0.0, 255.0) / step) * step


def channel_shuffle(rng: Array, images: Array, p: Array) -> Array:
    """imgaug ChannelShuffle: with per-image probability p, permute the
    channel order uniformly at random (no ``channels`` subset arg —
    docs/schema.md)."""
    b, _, _, c = images.shape
    k1, k2 = jax.random.split(rng)
    perm = jnp.argsort(jax.random.uniform(k1, (b, c)), axis=1)
    shuf = jnp.take_along_axis(images, perm[:, None, None, :], axis=-1)
    sel = jax.random.bernoulli(k2, p, (b,))[:, None, None, None]
    return jnp.where(sel, shuf, images)


# ---------------------------------------------------------------------------
# Weather + color-science augmenters (imgaug.augmenters.weather / color).
# The weather layers are PROCEDURAL APPROXIMATIONS of imgaug's
# frequency-noise constructions (docs/schema.md deviations): multi-octave
# value noise for clouds/fog, sparse-points + directional streak kernels
# for snow/rain.  All are image-only; masks pass through untouched.
# ---------------------------------------------------------------------------

def _value_noise(rng: Array, b: int, h: int, w: int,
                 octaves=(4, 8, 16), persistence: float = 0.5) -> Array:
    """(B, H, W) multi-octave bilinear value noise in [0, 1]."""
    total = jnp.zeros((b, h, w), jnp.float32)
    amp, norm = 1.0, 0.0
    for i, g in enumerate(octaves):
        k = jax.random.fold_in(rng, i)
        coarse = jax.random.uniform(k, (b, g, g))
        total = total + amp * jax.image.resize(coarse, (b, h, w), "bilinear")
        norm += amp
        amp *= persistence
    return total / norm


def clouds(rng: Array, images: Array, coverage: Array) -> Array:
    """imgaug Clouds (approximation): white overlay where smooth noise
    exceeds the per-image coverage threshold, soft-ramped, alpha ≤ 0.8."""
    b, h, w, _ = images.shape
    noise = _value_noise(rng, b, h, w)
    a = jnp.clip((noise - (1.0 - coverage[:, None, None])) / 0.25, 0.0, 1.0)
    a = (0.8 * a)[..., None]
    return images * (1.0 - a) + 255.0 * a


def fog(rng: Array, images: Array, density: Array) -> Array:
    """imgaug Fog (approximation): uniform haze modulated by low-frequency
    noise, blended toward white."""
    b, h, w, _ = images.shape
    noise = _value_noise(rng, b, h, w, octaves=(2, 4))
    a = (density[:, None, None] * (0.55 + 0.45 * noise))[..., None]
    a = jnp.clip(a, 0.0, 0.95)
    return images * (1.0 - a) + 255.0 * a


def _streak_kernels(length: Array, angle: Array, radius: int) -> Array:
    """(B, K, K) anti-aliased line kernels normalized to PEAK 1 (unlike
    motion_blur's sum-1) so convolving a sparse point layer keeps the
    streaks bright."""
    coords = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(coords, coords, indexing="ij")
    half = jnp.clip((length - 1.0) / 2.0, 0.0, radius)
    a = angle * (jnp.pi / 180.0)
    dx, dy = jnp.sin(a), jnp.cos(a)
    proj = gx[None] * dx[:, None, None] + gy[None] * dy[:, None, None]
    perp = jnp.abs(gx[None] * dy[:, None, None]
                   - gy[None] * dx[:, None, None])
    w = jnp.clip(1.0 - perp, 0.0, 1.0) * \
        jnp.clip(half[:, None, None] + 1.0 - jnp.abs(proj), 0.0, 1.0)
    return w / jnp.maximum(w.max(axis=(1, 2), keepdims=True), 1e-6)


def _particle_layer(rng: Array, images: Array, density: Array,
                    length: Array, angle: Array, radius: int,
                    brightness: float) -> Array:
    """Sparse bernoulli points smeared into directional streaks, screen-
    blended (max) over the image — shared by Snowflakes and Rain."""
    b, h, w, _ = images.shape
    pts = (jax.random.uniform(rng, (b, h, w, 1))
           < density[:, None, None, None]).astype(jnp.float32)
    kerns = _streak_kernels(length, angle, radius)
    layer = jax.vmap(lambda img, ker: _depthwise_kxk(img, ker, radius))(
        pts * brightness, kerns)
    return jnp.maximum(images, jnp.clip(layer, 0.0, brightness))


def snowflakes(rng: Array, images: Array, density: Array,
               speed: Array, radius: int = 8) -> Array:
    """imgaug Snowflakes (approximation): density ~ flake fraction,
    speed (0..1) ~ streak length fraction of the frame."""
    h = images.shape[1]
    k1, k2 = jax.random.split(rng)
    b = images.shape[0]
    length = jnp.clip(speed * h, 1.0, 2.0 * radius + 1.0)
    angle = jax.random.uniform(k1, (b,), minval=-30.0, maxval=30.0)
    return _particle_layer(k2, images, density, length, angle, radius,
                           brightness=255.0)


def rain(rng: Array, images: Array, density: Array, speed: Array,
         radius: int = 12) -> Array:
    """imgaug Rain (approximation): longer dimmer streaks, slight global
    darkening (heavy rain reads darker)."""
    h = images.shape[1]
    k1, k2 = jax.random.split(rng)
    b = images.shape[0]
    length = jnp.clip(speed * h, 3.0, 2.0 * radius + 1.0)
    angle = jax.random.uniform(k1, (b,), minval=-20.0, maxval=20.0)
    darkened = images * 0.92
    return _particle_layer(k2, darkened, density, length, angle, radius,
                           brightness=220.0)


def change_color_temperature(images: Array, kelvin: Array) -> Array:
    """imgaug ChangeColorTemperature: scale RGB by the blackbody color at
    ``kelvin`` (B,).  Uses Tanner Helland's analytic fit instead of
    imgaug's 1000–40000 K lookup table (≤2 gray levels apart over the
    1000–11000 K default range — docs/schema.md)."""
    if images.shape[-1] != 3:
        return images
    t = jnp.clip(kelvin, 1000.0, 40000.0) / 100.0
    red = jnp.where(t <= 66.0, 255.0,
                    329.698727446 * jnp.maximum(t - 60.0, 1e-6)
                    ** -0.1332047592)
    green = jnp.where(
        t <= 66.0,
        99.4708025861 * jnp.log(jnp.maximum(t, 1e-6)) - 161.1195681661,
        288.1221695283 * jnp.maximum(t - 60.0, 1e-6) ** -0.0755148492)
    blue = jnp.where(t >= 66.0, 255.0,
                     jnp.where(t <= 19.0, 0.0,
                               138.5177312231
                               * jnp.log(jnp.maximum(t - 10.0, 1e-6))
                               - 305.0447927307))
    rgb = jnp.stack([red, green, blue], axis=-1)          # (B, 3)
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return images * rgb[:, None, None, :]


def uniform_color_quantization(images: Array, n_colors: Array) -> Array:
    """imgaug UniformColorQuantization: quantize every channel to n
    uniform levels, mapping to BIN CENTERS; n (B,) rounds to ≥2."""
    n = jnp.maximum(jnp.round(n_colors), 2.0)[:, None, None, None]
    size = 256.0 / n
    v = jnp.clip(images, 0.0, 255.0)
    return jnp.clip(jnp.floor(v / size) * size + size / 2.0, 0.0, 255.0)


def histogram_equalization(images: Array) -> Array:
    """cv2.equalizeHist per channel (imgaug
    AllChannelsHistogramEqualization): 256-bin histogram → cdf →
    ``lut[v] = round((cdf[v] − cdf_min) / (N − cdf_min) · 255)``.
    Deviation (docs/schema.md): plain ``HistogramEqualization`` in imgaug
    equalizes the Lab L-channel; here every channel equalizes
    independently."""
    b, h, w, c = images.shape
    v = jnp.clip(jnp.round(images), 0, 255).astype(jnp.int32)
    flat = v.transpose(0, 3, 1, 2).reshape(b, c, h * w)  # (B, C, N)
    hist = _hist256(flat)                                # (B, C, 256)
    cdf = jnp.cumsum(hist, axis=-1)
    # cdf_min = cdf at the lowest OCCUPIED bin (cv2 skips empty bins)
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, h * w + 1),
                      axis=-1, keepdims=True)
    denom = jnp.maximum(h * w - cdf_min, 1)
    lut = jnp.clip(jnp.round((cdf - cdf_min) * 255.0 / denom), 0, 255)
    out = _apply_lut256(lut, flat)                       # (B, C, N)
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# round-4 breadth batch (VERDICT r3 item 9 cheap wins): Salt / Pepper /
# ImpulseNoise / coarse variants, AdditiveLaplaceNoise, EdgeDetect, and
# keep-size pooling (imgaug aug names a migrating config may carry).
# ---------------------------------------------------------------------------

def salt(rng: Array, images: Array, p: Array) -> Array:
    """imgaug Salt: replace a fraction p of pixels with 255 (bright only)."""
    b, h, w, _ = images.shape
    u = jax.random.uniform(rng, (b, h, w, 1))
    return jnp.where(u < p[:, None, None, None], 255.0, images)


def pepper(rng: Array, images: Array, p: Array) -> Array:
    """imgaug Pepper: replace a fraction p of pixels with 0 (dark only)."""
    b, h, w, _ = images.shape
    u = jax.random.uniform(rng, (b, h, w, 1))
    return jnp.where(u < p[:, None, None, None], 0.0, images)


def impulse_noise(rng: Array, images: Array, p: Array) -> Array:
    """imgaug ImpulseNoise == SaltAndPepper(per_channel=True): each
    CHANNEL draws independently (colored speckles)."""
    u = jax.random.uniform(rng, images.shape)
    pp = p[:, None, None, None]
    out = jnp.where(u < pp * 0.5, 0.0, images)
    return jnp.where((u >= pp * 0.5) & (u < pp), 255.0, out)


def coarse_salt_and_pepper(rng: Array, images: Array, p: Array,
                           size_frac: float = 0.1,
                           mode: str = "both") -> Array:
    """imgaug CoarseSaltAndPepper / CoarseSalt / CoarsePepper: the
    low-res bernoulli mask of CoarseDropout, filled with 255/0 instead of
    dropped."""
    b, h, w, _ = images.shape
    gh = max(1, int(round(h * size_frac)))
    gw = max(1, int(round(w * size_frac)))
    u = jax.random.uniform(rng, (b, gh, gw, 1))
    u = jax.image.resize(u, (b, h, w, 1), "nearest")
    pp = p[:, None, None, None]
    if mode == "salt":
        return jnp.where(u < pp, 255.0, images)
    if mode == "pepper":
        return jnp.where(u < pp, 0.0, images)
    out = jnp.where(u < pp * 0.5, 0.0, images)
    return jnp.where((u >= pp * 0.5) & (u < pp), 255.0, out)


def laplace_noise(rng: Array, images: Array, scale: Array) -> Array:
    """imgaug AdditiveLaplaceNoise: additive Laplace(0, scale) noise."""
    noise = jax.random.laplace(rng, images.shape, jnp.float32)
    return images + noise * scale[:, None, None, None]


def edge_detect(images: Array, alpha: Array) -> Array:
    """imgaug EdgeDetect: blend toward the 3x3 edge response
    [[0,1,0],[1,-4,1],[0,1,0]] (Laplacian magnitude-free variant —
    documented approximation in docs/schema.md)."""
    kern = jnp.array([[0.0, 1.0, 0.0],
                      [1.0, -4.0, 1.0],
                      [0.0, 1.0, 0.0]], jnp.float32)
    edge = jax.vmap(lambda im: _depthwise3x3(im, kern))(images)
    a = alpha[:, None, None, None]
    return (1.0 - a) * images + a * edge


def keep_size_pooling(images: Array, ksize: int, mode: str) -> Array:
    """imgaug {Average,Max,Min}Pooling with keep_size=True: pool with a
    static k×k window at stride k, then resize back to the input size.
    Deviation (docs/schema.md): upsampling is nearest (blocky), imgaug
    interpolates."""
    b, h, w, c = images.shape
    k = int(ksize)
    if k <= 1:
        return images
    init, op = {
        "avg": (0.0, jax.lax.add),
        "max": (-jnp.inf, jax.lax.max),
        "min": (jnp.inf, jax.lax.min),
    }[mode]
    red = jax.lax.reduce_window(images, init, op,
                                (1, k, k, 1), (1, k, k, 1), "SAME")
    if mode == "avg":
        ones = jnp.ones((1, h, w, 1), jnp.float32)
        counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                       (1, k, k, 1), (1, k, k, 1), "SAME")
        red = red / counts
    return jax.image.resize(red, (b, h, w, c), "nearest")


def dropout2d(rng: Array, images: Array, p: Array,
              nb_keep: int = 1) -> Array:
    """imgaug Dropout2d: zero ENTIRE channels with probability p per
    channel, keeping at least ``nb_keep`` channels.  Deviation
    (docs/schema.md): the protected channels are the ones with the
    largest keep-draws (uniform among channels) rather than a separate
    protection sample."""
    b, _, _, c = images.shape
    u = jax.random.uniform(rng, (b, c))
    keep = u >= p[:, None]
    if nb_keep > 0:
        # resurrect the nb_keep highest draws — uniformly random channels,
        # guaranteeing >= nb_keep survivors
        kth = jnp.sort(u, axis=1)[:, c - nb_keep][:, None]
        keep = keep | (u >= kth)
    return images * keep[:, None, None, :].astype(jnp.float32)


def total_dropout(rng: Array, images: Array, p: Array) -> Array:
    """imgaug TotalDropout: zero the ENTIRE image with probability p."""
    b = images.shape[0]
    keep = (jax.random.uniform(rng, (b,)) >= p).astype(jnp.float32)
    return images * keep[:, None, None, None]


def fast_snowy_landscape(images: Array, threshold: Array,
                         multiplier: Array) -> Array:
    """imgaug FastSnowyLandscape: convert to HLS, multiply the lightness
    of every pixel whose L < ``threshold`` by ``multiplier`` (clipped to
    255), convert back.  cv2 uint8 HLS scale: H in [0, 180), L/S in
    [0, 255].  Only L changes, so hue and HLS-saturation are computed
    once and the RGB is rebuilt from the standard sector formula —
    achromatic pixels (C = 0) stay gray at the new lightness.
    ``threshold``/``multiplier`` are (B,) samples (imgaug defaults
    uniform (100, 255) / (1.0, 4.0))."""
    h, light, s = _rgb_to_hls(images)
    hh = h / 30.0                       # back to sector units in [0, 6)
    thr = threshold[:, None, None]
    mul = multiplier[:, None, None]
    light = jnp.clip(jnp.where(light < thr, light * mul, light), 0.0, 255.0)
    cc = (1.0 - jnp.abs(2.0 * light / 255.0 - 1.0)) * s
    x = cc * (1.0 - jnp.abs(jnp.mod(hh, 2.0) - 1.0))
    m0 = light - 0.5 * cc
    zero = jnp.zeros_like(cc)
    i = jnp.floor(hh).astype(jnp.int32) % 6
    sect = [i == 0, i == 1, i == 2, i == 3, i == 4]
    rr = jnp.select(sect, [cc, x, zero, zero, x], cc)
    gg = jnp.select(sect, [x, cc, cc, x, zero], zero)
    bb = jnp.select(sect, [zero, zero, x, cc, cc], x)
    return jnp.stack([rr + m0, gg + m0, bb + m0], axis=-1)


def median_pooling(images: Array, ksize: int) -> Array:
    """imgaug MedianPooling with keep_size=True: median over k×k blocks
    at stride k (edge-padded to a multiple of k), nearest-resized back.
    Static ``ksize`` and blocky upsample — same deviations as
    :func:`keep_size_pooling`.  Even k² medians average the middle two,
    matching np.median under imgaug's block_reduce."""
    b, h, w, c = images.shape
    k = int(ksize)
    if k <= 1:
        return images
    pad_h, pad_w = (-h) % k, (-w) % k
    x = images
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    mode="edge")
    hb, wb = (h + pad_h) // k, (w + pad_w) // k
    x = (x.reshape(b, hb, k, wb, k, c)
          .transpose(0, 1, 3, 5, 2, 4)
          .reshape(b, hb, wb, c, k * k))
    srt = jnp.sort(x, axis=-1)
    k2 = k * k
    med = (srt[..., k2 // 2] if k2 % 2
           else 0.5 * (srt[..., k2 // 2 - 1] + srt[..., k2 // 2]))
    return jax.image.resize(med, (b, h, w, c), "nearest")


def bilateral_blur(images: Array, d: Array, sigma_color: Array,
                   sigma_space: Array, max_radius: int) -> Array:
    """cv2/imgaug BilateralBlur: edge-preserving blur where each tap
    weighs in as a spatial gaussian (``sigma_space``) times a range
    gaussian of the L1 color distance to the center pixel
    (``sigma_color`` — cv2's color_weight uses the summed per-channel
    abs diff).  Lowered at a STATIC ``max_radius`` so per-image sampled
    ``d`` stays jittable: taps with euclidean offset beyond the
    per-image d//2 get zero spatial weight (cv2 keeps a circular
    neighborhood).  The center tap always carries weight 1, so the
    normalizer never vanishes.  ``d``/``sigma_color``/``sigma_space``
    are (B,) samples."""
    b, h, w, c = images.shape
    radius = jnp.floor(jnp.floor(d) / 2.0)[:, None, None]          # (B,1,1)
    sc = jnp.maximum(sigma_color, 1e-3)[:, None, None, None]       # (B,1,1,1)
    ss = jnp.maximum(sigma_space, 1e-3)[:, None, None]             # (B,1,1)
    rr = int(max_radius)
    if rr <= 0:
        return images
    pad = jnp.pad(images, ((0, 0), (rr, rr), (rr, rr), (0, 0)), mode="edge")
    num = jnp.zeros_like(images)
    den = jnp.zeros((b, h, w, 1), jnp.float32)
    for dy in range(-rr, rr + 1):
        for dx in range(-rr, rr + 1):
            tap = pad[:, rr + dy:rr + dy + h, rr + dx:rr + dx + w, :]
            r2 = float(dy * dy + dx * dx)
            w_s = (jnp.exp(-0.5 * r2 / (ss * ss))
                   * (math.sqrt(r2) <= radius + 1e-6))             # (B,1,1)
            dcol = jnp.abs(tap - images).sum(-1, keepdims=True)    # (B,H,W,1)
            wgt = w_s[..., None] * jnp.exp(-0.5 * (dcol / sc) ** 2)
            num = num + wgt * tap
            den = den + wgt
    return num / den


def directed_edge_detect(images: Array, alpha: Array,
                         direction: Array) -> Array:
    """imgaug DirectedEdgeDetect: per-image 3x3 kernel whose 8 neighbor
    cells weigh in by angular similarity to the target direction
    (``direction`` in [0, 1] ~ [0, 360) deg, 0 pointing up), normalized,
    negated, center 1; blended with the identity kernel by ``alpha`` and
    convolved (reflect-101 border, cv2.filter2D's default).  Published
    imgaug algorithm (augmenters/convolutional.py): similarity per cell =
    (1 − angle(cell, dir)/180°)⁴.  NOT hysteresis-based (the do-not-lower
    justification it shipped under through r5 was wrong — SURVEY §2b
    imgaug row)."""
    # imgaug truncates to whole degrees: deg = int(direction·360) % 360
    deg = jnp.mod(jnp.floor(direction * 360.0), 360.0)
    rad = deg * (math.pi / 180.0) - 0.5 * math.pi
    dvec = jnp.stack([jnp.cos(rad), jnp.sin(rad)], axis=-1)        # (B, 2)
    cells = np.array([(x_, y_) for y_ in (-1, 0, 1) for x_ in (-1, 0, 1)
                      if (x_, y_) != (0, 0)], np.float32)          # (8, 2)
    cells_u = jnp.asarray(cells / np.linalg.norm(cells, axis=1,
                                                 keepdims=True))
    cosang = jnp.clip(cells_u @ dvec.T, -1.0, 1.0).T               # (B, 8)
    sim = (1.0 - jnp.arccos(cosang) / math.pi) ** 4
    sim = sim / jnp.sum(sim, axis=1, keepdims=True)
    # scatter the 8 similarities back into (B, 3, 3) around center 1
    flat = jnp.concatenate([-sim[:, :4],
                            jnp.ones((sim.shape[0], 1), jnp.float32),
                            -sim[:, 4:]], axis=1)                  # (B, 9)
    eff = flat.reshape(-1, 3, 3)
    ident = jnp.zeros((3, 3), jnp.float32).at[1, 1].set(1.0)
    a = alpha[:, None, None]
    kern = (1.0 - a) * ident[None] + a * eff

    def one(img, kk):
        return _depthwise3x3(img, kk)

    return jax.vmap(one)(images, kern)


def _rgb_to_hls(images: Array) -> Tuple[Array, Array, Array]:
    """cv2 uint8 HLS: H in [0, 180), L and S in [0, 255]."""
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = mx - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    hr = jnp.mod((g - b) / safe_c, 6.0)
    hg = (b - r) / safe_c + 2.0
    hb = (r - g) / safe_c + 4.0
    hh = jnp.where(c > 0, jnp.where(mx == r, hr,
                                    jnp.where(mx == g, hg, hb)), 0.0)
    h = hh * 30.0                                                   # [0, 180)
    lsum = mx + mn                                                  # = 2L
    light = 0.5 * lsum
    s = jnp.where(c > 0,
                  c / jnp.where(light <= 127.5,
                                jnp.maximum(lsum, 1.0),
                                jnp.maximum(510.0 - lsum, 1.0)),
                  0.0) * 255.0
    return h, light, s


def change_colorspace(images: Array, to_colorspace: str,
                      alpha: Array) -> Array:
    """imgaug ChangeColorspace: re-encode the image INTO ``to_colorspace``
    (the 3 channels then carry that space's components, cv2 uint8 scale:
    H in [0, 180), everything else 0..255) and alpha-blend with the
    original: ``alpha·converted + (1−alpha)·rgb``.  GRAY tiles the
    luminance to 3 channels like imgaug does.  Lab/Luv/CIE are rejected
    at parse (nonlinear reference-white pipelines, not lowered)."""
    cs = to_colorspace.upper()
    if cs == "RGB":
        return images
    if cs == "BGR":
        conv = images[..., ::-1]
    elif cs == "GRAY":
        lum = (0.299 * images[..., 0] + 0.587 * images[..., 1]
               + 0.114 * images[..., 2])[..., None]
        conv = jnp.broadcast_to(lum, images.shape)
    elif cs == "HSV":
        h, s, v = _rgb_to_hsv(images)
        conv = jnp.stack([h, s, v], axis=-1)
    elif cs == "HLS":
        h, li, s = _rgb_to_hls(images)
        conv = jnp.stack([h, li, s], axis=-1)
    elif cs == "YCRCB":
        y = (0.299 * images[..., 0] + 0.587 * images[..., 1]
             + 0.114 * images[..., 2])
        cr = (images[..., 0] - y) * 0.713 + 128.0
        cb = (images[..., 2] - y) * 0.564 + 128.0
        conv = jnp.stack([y, cr, cb], axis=-1)
    else:  # pragma: no cover — parse-time validation rejects first
        raise ValueError(f"ChangeColorspace: unsupported {to_colorspace!r}")
    a = alpha[:, None, None, None]
    return a * conv + (1.0 - a) * images


def _canny_edges(images: Array, lo: Array, hi: Array, sobel_k: int = 3,
                 hysteresis_iters: int = 16) -> Array:
    """The Canny chain on ITU-R 601 luminance → (B, H, W) bool edge map:
    sobel (static aperture 3/5/7), L1 gradient magnitude (cv2's default),
    4-sector non-maximum suppression, double threshold, and hysteresis
    lowered as ``hysteresis_iters`` static rounds of propagate-through-
    weak (3x3 dilation AND weak mask) — XLA cannot run cv2's unbounded
    flood fill, so very long weak chains (> iters px) stay unlinked.
    Deviations vs cv2 (docs/schema.md): luminance input (cv2 takes the
    max-magnitude channel), >=-tie NMS, bounded hysteresis.  Shared by
    :func:`canny` and :func:`cartoon`."""
    lum = (0.299 * images[..., 0] + 0.587 * images[..., 1]
           + 0.114 * images[..., 2])[..., None]                    # (B,H,W,1)
    if sobel_k == 3:
        d1 = np.array([-1.0, 0.0, 1.0], np.float32)
        sm = np.array([1.0, 2.0, 1.0], np.float32)
    elif sobel_k == 5:
        d1 = np.array([-1.0, -2.0, 0.0, 2.0, 1.0], np.float32)
        sm = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32)
    else:  # 7
        d1 = np.array([-1.0, -4.0, -5.0, 0.0, 5.0, 4.0, 1.0], np.float32)
        sm = np.array([1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0], np.float32)
    kx = jnp.asarray(np.outer(sm, d1))          # d/dx: smooth y, diff x
    ky = jnp.asarray(np.outer(d1, sm))          # d/dy: smooth x, diff y
    r = sobel_k // 2

    def conv2(img, k2):
        c = img.shape[-1]
        kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))
        pad = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
        # precision=HIGHEST: the MXU's default bf16 input rounding nudges
        # gradient magnitudes, near-tie NMS comparisons flip vs the f32
        # CPU lowering, and every flipped edge pixel recolors full-range
        # (caught by tpu_smoke --aug on-chip — same trap as segment.py)
        return jax.lax.conv_general_dilated(
            pad[None], kern, (1, 1), "VALID", feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    gx = jax.vmap(lambda im: conv2(im, kx))(lum)[..., 0]           # (B,H,W)
    gy = jax.vmap(lambda im: conv2(im, ky))(lum)[..., 0]
    mag = jnp.abs(gx) + jnp.abs(gy)                                # cv2 L1
    # 4-sector NMS: sector from the gradient angle, compare the two
    # neighbors along it (ties keep the pixel)
    ang = jnp.arctan2(gy, gx)                                      # (-pi, pi]
    sec = jnp.mod(jnp.round(ang / (math.pi / 4.0)), 4.0)           # 0..3
    pm = jnp.pad(mag, ((0, 0), (1, 1), (1, 1)))
    nb = {
        0: (pm[:, 1:-1, 2:], pm[:, 1:-1, :-2]),     # E/W
        1: (pm[:, 2:, 2:], pm[:, :-2, :-2]),        # SE/NW (y down)
        2: (pm[:, 2:, 1:-1], pm[:, :-2, 1:-1]),     # S/N
        3: (pm[:, 2:, :-2], pm[:, :-2, 2:]),        # SW/NE
    }
    keep = jnp.zeros_like(mag, dtype=bool)
    for s_, (n1, n2) in nb.items():
        keep = keep | ((sec == s_) & (mag >= n1) & (mag >= n2))
    nms = jnp.where(keep, mag, 0.0)
    lo_ = jnp.minimum(lo, hi)[:, None, None]
    hi_ = jnp.maximum(lo, hi)[:, None, None]
    strong = nms > hi_
    weak = nms > lo_

    def dilate(x):
        return jax.lax.reduce_window(
            x.astype(jnp.float32), 0.0, jax.lax.max,
            (1, 3, 3), (1, 1, 1), "SAME") > 0.5

    def body(_, e):
        return weak & dilate(e) | e

    return jax.lax.fori_loop(0, int(hysteresis_iters), body, strong)


def canny(rng: Array, images: Array, alpha: Array, lo: Array, hi: Array,
          sobel_k: int = 3, hysteresis_iters: int = 16) -> Array:
    """imgaug Canny: binary edge map (:func:`_canny_edges`), random-color
    colorized, alpha-blended over the image (imgaug's default
    RandomColorsBinaryImageColorizer draws one uniform color for edge
    pixels and one for the rest, per image)."""
    b = images.shape[0]
    edges = _canny_edges(images, lo, hi, sobel_k, hysteresis_iters)
    k1, k2 = jax.random.split(rng)
    col_t = jax.random.uniform(k1, (b, 1, 1, 3), minval=0.0, maxval=256.0)
    col_f = jax.random.uniform(k2, (b, 1, 1, 3), minval=0.0, maxval=256.0)
    colorized = jnp.where(edges[..., None], jnp.floor(col_t),
                          jnp.floor(col_f))
    a = alpha[:, None, None, None]
    return a * colorized + (1.0 - a) * images


def mean_shift_blur(images: Array, spatial_radius: Array,
                    color_radius: Array, max_radius: int,
                    iters: int = 5) -> Array:
    """imgaug MeanShiftBlur (cv2.pyrMeanShiftFiltering at the finest
    pyramid level): iterated local mode seeking — each round replaces a
    pixel's running color with the mean of the ORIGINAL neighborhood taps
    whose squared color distance to the running color is <= sr² and whose
    spatial offset is within the per-image radius (flat window).  cv2's
    default termination (5 iterations) becomes a static loop.  Deviations
    (docs/schema.md): the window stays centered on the pixel (cv2 shifts
    it toward the mode), and the static tap radius caps at ``max_radius``
    (cv2 allows 40+, offline-speed)."""
    b, h, w, c = images.shape
    rr = int(max_radius)
    if rr <= 0:
        return images
    radius = jnp.floor(spatial_radius)[:, None, None]              # (B,1,1)
    sr2 = jnp.square(jnp.maximum(color_radius, 1e-3))[:, None, None]
    pad = jnp.pad(images, ((0, 0), (rr, rr), (rr, rr), (0, 0)), mode="edge")

    def one_round(_, state):
        # lax.fori_loop so the (2r+1)² tap graph traces ONCE, not per
        # round — the unrolled 5×121-tap form compiled minutes-slow
        num = jnp.zeros_like(images)
        den = jnp.zeros((b, h, w, 1), jnp.float32)
        for dy in range(-rr, rr + 1):
            for dx in range(-rr, rr + 1):
                tap = pad[:, rr + dy:rr + dy + h, rr + dx:rr + dx + w, :]
                r2 = float(dy * dy + dx * dx)
                in_win = (math.sqrt(r2) <= radius + 1e-6)          # (B,1,1)
                d2 = jnp.square(tap - state).sum(-1)               # (B,H,W)
                wgt = (in_win & (d2 <= sr2)).astype(jnp.float32)[..., None]
                num = num + wgt * tap
                den = den + wgt
        # the color gate compares taps against the RUNNING color, so after
        # round 1 even the center tap can fail it — keep the previous
        # state where the window admits no tap (cv2 breaks its loop there)
        return jnp.where(den > 0.0, num / jnp.maximum(den, 1.0), state)

    return jax.lax.fori_loop(0, max(1, int(iters)), one_round, images)


def cartoon(images: Array, blur_ksize: int, segmentation_size: Array,
            saturation: Array, edge_prevalence: Array,
            max_radius: int = 4) -> Array:
    """imgaug Cartoon (upstream ``augmenters/artistic.py stylize_cartoon``,
    reached via the imgaug dependency — SURVEY §2b; mount empty, chain
    reconstructed from the published docs): median blur → mean-shift
    color flattening → saturation boost → dark edge lines drawn on top.

    Lowered as a composition of this module's own certified pieces
    ([LOW] confidence vs imgaug's exact cv2 parameterization,
    docs/schema.md):

    * ``median_blur`` with static odd ``blur_ksize`` (imgaug samples it);
    * :func:`mean_shift_blur` with spatial radius ``4·segmentation_size``
      (capped at ``max_radius``) and color radius ``20·segmentation_size``
      — larger segmentation_size flattens larger color regions, matching
      the knob's documented direction;
    * HSV saturation scaled by ``saturation`` (clipped);
    * edges from :func:`_canny_edges` on the flattened image with
      thresholds ``(60, 120) / edge_prevalence`` — higher prevalence
      lowers the bar and draws more lines — then stamped BLACK.
    """
    k = int(blur_ksize)
    if k > 1:
        out = median_blur(images, ksize=k if k % 2 else k + 1)
    else:
        out = images
    seg_sz = jnp.maximum(segmentation_size, 1e-3)
    sp = jnp.minimum(4.0 * seg_sz, float(max_radius))
    out = mean_shift_blur(out, sp, 20.0 * seg_sz, max_radius=max_radius)
    # edges come from the FLATTENED image, before the saturation boost
    # (imgaug's order — boosting S at fixed V can erase luminance steps)
    prev = jnp.maximum(edge_prevalence, 1e-3)
    edges = _canny_edges(out, 60.0 / prev, 120.0 / prev)
    h, s, v = _rgb_to_hsv(out)
    s = jnp.clip(s * saturation[:, None, None], 0.0, 255.0)
    out = _hsv_to_rgb(h, s, v)
    return jnp.where(edges[..., None], 0.0, out)
