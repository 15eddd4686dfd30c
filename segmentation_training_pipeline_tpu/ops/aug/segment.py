"""Segmentation-style color augmenters: Superpixels, the Voronoi family,
KMeansColorQuantization (imgaug ``augmenters/segmentation.py`` names —
upstream reached via the imgaug third-party dependency, SURVEY §2b; mount
empty, semantics reconstructed from the public imgaug docs).

These were on the do-not-lower list through round 4 ("cluster/seed counts
are data-dependent").  They lower after all with a TPU-first shape
discipline:

* **Static seed capacity**: every sampler has a compile-time maximum seed
  count P derived from the YAML spec's max (``n_points: [50, 500]`` → 500
  slots); per-image sampled counts mask the surplus seeds invalid
  (distance +inf), so XLA sees one static program.
* **MXU, not scatter**: pixel→seed assignment is a squared-distance
  argmin computed from ``|p|² − 2 p·sᵀ + |s|²`` — the cross term is a
  batched matmul — chunked over seed blocks to bound HBM; segment means
  are one-hot × pixels matmuls (the same trick as the RegularGrid blend
  masks), never segment_sum scatters.
* **imgaug's own downscale**: imgaug computes all of these at
  ``max_size=128`` (its default) and resizes back.  Here the SEGMENT MAPS
  (cell color + replace mask) are computed at that scale and
  nearest-upsampled, but compositing happens at FULL resolution:
  unreplaced pixels keep their exact values (imgaug round-trips the whole
  image through the downscale, degrading even untouched pixels — see
  docs/schema.md deviations; ours is strictly higher-fidelity and one
  resize cheaper).

Masks are untouched (color-only augmenters).  Inputs are f32 0..255
(photometric segment convention).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_SEED_CHUNK = 128  # seed-block size for the chunked argmin / one-hot means


def _downscale(images: Array, max_size) -> Tuple[Array, int, int]:
    """imgaug-style max_size downscale (bilinear).  ``max_size=None``
    disables it."""
    b, h, w, c = images.shape
    if max_size is None or max(h, w) <= int(max_size):
        return images, h, w
    f = float(max_size) / float(max(h, w))
    hs = max(2, int(round(h * f)))
    ws = max(2, int(round(w * f)))
    return jax.image.resize(images, (b, hs, ws, c), "linear"), hs, ws


def _coords(hs: int, ws: int) -> Array:
    """(hs*ws, 2) pixel-center (y, x) float32 coordinates."""
    yy, xx = jnp.meshgrid(jnp.arange(hs, dtype=jnp.float32),
                          jnp.arange(ws, dtype=jnp.float32), indexing="ij")
    return jnp.stack([yy.ravel(), xx.ravel()], axis=-1)


def _chunked_argmin(feats: Array, seeds: Array, valid: Array) -> Array:
    """Nearest valid seed per pixel.

    feats (B, N, F), seeds (B, P, F), valid (B, P) → (B, N) int32.
    Squared distance via |p|² − 2 p·sᵀ + |s|² (the cross term is a batched
    matmul on the MXU); seeds processed in static chunks so the (B, N, P)
    distance tensor never materializes whole — peak extra HBM is one
    (B, N, chunk) block.
    """
    b, n, _ = feats.shape
    p = seeds.shape[1]
    fn2 = jnp.sum(feats * feats, axis=-1)                       # (B, N)
    best_d = jnp.full((b, n), jnp.inf, jnp.float32)
    best_i = jnp.zeros((b, n), jnp.int32)
    for s in range(0, p, _SEED_CHUNK):
        sc = seeds[:, s:s + _SEED_CHUNK]                        # (B, p', F)
        vc = valid[:, s:s + _SEED_CHUNK]
        # precision=HIGHEST: the MXU's default bf16 input rounding is
        # catastrophic here — squared distances reach ~65k and near-tie
        # argmins flip vs the f32 CPU lowering, recoloring whole cells
        # (caught by tpu_smoke --aug on-chip; PERF.md matmul-precision trap).
        cross = jnp.einsum("bnf,bpf->bnp", feats, sc,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        d = (fn2[..., None] - 2.0 * cross
             + jnp.sum(sc * sc, axis=-1)[:, None, :])
        d = jnp.where(vc[:, None, :], d, jnp.inf)
        i = jnp.argmin(d, axis=-1)
        dm = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
        upd = dm < best_d
        best_d = jnp.where(upd, dm, best_d)
        best_i = jnp.where(upd, (i + s).astype(jnp.int32), best_i)
    return best_i


def _segment_means(assign: Array, values: Array,
                   p: int) -> Tuple[Array, Array]:
    """Per-segment value means via one-hot matmuls.

    assign (B, N) int32 in [0, p), values (B, N, C) →
    (means (B, p, C), counts (B, p)).  Empty segments get mean 0 and
    count 0 (callers keep the previous value where counts == 0).
    """
    sums, counts = [], []
    for s in range(0, p, _SEED_CHUNK):
        pc = min(_SEED_CHUNK, p - s)
        oh = (assign[..., None] == (jnp.arange(pc, dtype=jnp.int32) + s)
              ).astype(jnp.float32)                             # (B, N, pc)
        # precision=HIGHEST: bf16-rounded pixel values (~0.4% rel err at
        # 255) would shift segment means ~1/255 vs the CPU reference.
        sums.append(jnp.einsum("bnp,bnc->bpc", oh, values,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32))
        counts.append(jnp.sum(oh, axis=1))
    sums = jnp.concatenate(sums, axis=1)
    counts = jnp.concatenate(counts, axis=1)
    return sums / jnp.maximum(counts, 1.0)[..., None], counts


def _composite_full_res(images: Array, small_cell_color: Array,
                        small_replace: Array) -> Array:
    """Nearest-upsample the (cell color, replace) maps computed at the
    downscaled resolution and composite at FULL resolution — unreplaced
    pixels keep exact values (deviation vs imgaug's whole-image
    downscale round-trip, docs/schema.md)."""
    b, h, w, c = images.shape
    cell_up = jax.image.resize(small_cell_color, (b, h, w, c), "nearest")
    rep_up = jax.image.resize(small_replace.astype(jnp.float32),
                              (b, h, w, 1), "nearest")
    return jnp.where(rep_up > 0.5, cell_up, images)


def _voronoi_apply(rng: Array, images: Array, seeds_yx: Array, valid: Array,
                   p_replace: Array, max_size) -> Array:
    """Shared Voronoi tail: assign pixels of the downscaled image to their
    nearest valid seed, replace the pixels of Bernoulli(p_replace)-chosen
    cells with the cell mean color, composite at full resolution.

    seeds_yx (B, P, 2) are in DOWNSCALED pixel coordinates; valid (B, P);
    p_replace (B,).
    """
    b, h, w, c = images.shape
    small, hs, ws = _downscale(images, max_size)
    n = hs * ws
    p = seeds_yx.shape[1]
    feats = jnp.broadcast_to(_coords(hs, ws)[None], (b, n, 2))
    assign = _chunked_argmin(feats, seeds_yx, valid)
    flat = small.reshape(b, n, c)
    means, _ = _segment_means(assign, flat, p)
    rep_cell = (jax.random.uniform(rng, (b, p))
                < p_replace[:, None]) & valid
    cell_color = jnp.take_along_axis(means, assign[..., None], axis=1)
    rep_px = jnp.take_along_axis(rep_cell, assign, axis=1)
    return _composite_full_res(images,
                               cell_color.reshape(b, hs, ws, c),
                               rep_px.reshape(b, hs, ws, 1))


def _ensure_one_valid(valid: Array) -> Array:
    """Guarantee ≥ 1 valid seed per image (imgaug's point samplers keep at
    least one point); falls back to slot 0."""
    none = ~jnp.any(valid, axis=1, keepdims=True)               # (B, 1)
    first = jnp.arange(valid.shape[1]) == 0
    return valid | (none & first[None, :])


def regular_grid_voronoi(rng: Array, images: Array, rows: Array, cols: Array,
                         max_rows: int, max_cols: int, p_drop: Array,
                         p_replace: Array, max_size) -> Array:
    """imgaug RegularGridVoronoi: seeds on a per-image rows×cols grid
    (linspace cell anchors over the downscaled image), each dropped with
    probability ``p_drop`` (≥1 always kept), cells replaced by their mean
    color with probability ``p_replace``.

    rows/cols (B,) int32 with static maxima; seed slot p maps to grid cell
    (p // max_cols, p % max_cols), slots past the per-image grid masked
    invalid — one static program for any sampled grid size.
    """
    b = images.shape[0]
    _, hs, ws = _downscale(images, max_size)
    p = max_rows * max_cols
    idx = jnp.arange(p, dtype=jnp.int32)
    r = (idx // max_cols)[None, :].astype(jnp.float32)          # (1, P)
    c = (idx % max_cols)[None, :].astype(jnp.float32)
    rows_f = jnp.maximum(rows, 1).astype(jnp.float32)[:, None]  # (B, 1)
    cols_f = jnp.maximum(cols, 1).astype(jnp.float32)[:, None]
    y = r * (hs - 1) / jnp.maximum(rows_f - 1.0, 1.0)
    x = c * (ws - 1) / jnp.maximum(cols_f - 1.0, 1.0)
    seeds = jnp.stack([y, x], axis=-1)                          # (B, P, 2)
    k_drop, k_rep = jax.random.split(rng)
    valid = (r < rows_f) & (c < cols_f)
    valid &= jax.random.uniform(k_drop, (b, p)) >= p_drop[:, None]
    valid = _ensure_one_valid(valid)
    return _voronoi_apply(k_rep, images, seeds, valid, p_replace, max_size)


def uniform_voronoi(rng: Array, images: Array, n_points: Array,
                    max_points: int, p_replace: Array, max_size) -> Array:
    """imgaug UniformVoronoi: ``n_points`` seeds uniform over the image,
    cells replaced by their mean color with probability ``p_replace``.
    Static capacity ``max_points``; surplus slots masked invalid."""
    b = images.shape[0]
    _, hs, ws = _downscale(images, max_size)
    k_pos, k_rep = jax.random.split(rng)
    pos = jax.random.uniform(k_pos, (b, max_points, 2))
    seeds = pos * jnp.asarray([hs - 1, ws - 1], jnp.float32)
    valid = jnp.arange(max_points)[None, :] < jnp.maximum(n_points, 1)[:, None]
    return _voronoi_apply(k_rep, images, seeds, valid, p_replace, max_size)


def superpixels(rng: Array, images: Array, n_segments: Array,
                max_segments: int, p_replace: Array, max_size,
                compactness: float = 10.0, iters: int = 5) -> Array:
    """imgaug Superpixels via fixed-iteration SLIC.

    imgaug calls skimage.slic (iterative local k-means in (Lab, xy) space)
    then replaces Bernoulli(p_replace)-chosen segments with their mean
    color.  Lowered as ``iters`` static Lloyd rounds of a GLOBAL
    nearest-seed assignment in (RGB, compactness-scaled xy) space —
    distance ``d² = d_color² + (m/S)²·d_xy²`` with ``S = sqrt(N/n)`` the
    expected segment interval, matching skimage's compactness convention.
    Deviations (docs/schema.md): RGB not Lab, global assignment instead of
    the 2S-window restriction, fixed iteration count.

    Seeds start on a per-image ``rows×cols ≈ n_segments`` grid with the
    image color at the seed position; per-image sampled ``n_segments``
    masks surplus static slots invalid.
    """
    b, h, w, c = images.shape
    small, hs, ws = _downscale(images, max_size)
    n = hs * ws
    flat = small.reshape(b, n, c)
    nseg = jnp.clip(n_segments, 1, max_segments).astype(jnp.float32)
    # per-image grid: cols ≈ sqrt(n·ws/hs), rows = floor(n/cols) ≥ 1
    cols = jnp.maximum(jnp.round(jnp.sqrt(nseg * (ws / hs))), 1.0)
    rows = jnp.maximum(jnp.floor(nseg / cols), 1.0)
    p = max_segments
    idx = jnp.arange(p, dtype=jnp.float32)[None, :]             # (1, P)
    r = jnp.floor(idx / cols[:, None])                          # (B, P)
    cgrid = idx - r * cols[:, None]
    y = (r + 0.5) * hs / rows[:, None]
    x = (cgrid + 0.5) * ws / cols[:, None]
    valid = idx < (rows * cols)[:, None]
    y = jnp.clip(y, 0.0, hs - 1.0)
    x = jnp.clip(x, 0.0, ws - 1.0)
    # SLIC feature space: color as-is, xy scaled by m/S
    scale = (compactness
             / jnp.sqrt(float(n) / jnp.maximum(rows * cols, 1.0)))[:, None]
    flat_idx = (jnp.round(y) * ws + jnp.round(x)).astype(jnp.int32)
    seed_color = jnp.take_along_axis(flat, flat_idx[..., None], axis=1)
    seeds = jnp.concatenate(
        [seed_color, jnp.stack([y, x], -1) * scale[..., None]], axis=-1)
    feats = jnp.concatenate(
        [flat, jnp.broadcast_to(_coords(hs, ws)[None], (b, n, 2))
         * scale[:, :, None]], axis=-1)                         # (B, N, C+2)
    assign = None
    for _ in range(max(1, int(iters))):
        assign = _chunked_argmin(feats, seeds, valid)
        means, counts = _segment_means(assign, feats, p)
        seeds = jnp.where((counts > 0.0)[..., None], means, seeds)
    assign = _chunked_argmin(feats, seeds, valid)
    color_means, _ = _segment_means(assign, flat, p)
    rep_cell = (jax.random.uniform(rng, (b, p))
                < p_replace[:, None]) & valid
    cell_color = jnp.take_along_axis(color_means, assign[..., None], axis=1)
    rep_px = jnp.take_along_axis(rep_cell, assign, axis=1)
    return _composite_full_res(images,
                               cell_color.reshape(b, hs, ws, c),
                               rep_px.reshape(b, hs, ws, 1))


def kmeans_color_quantization(rng: Array, images: Array, n_colors: Array,
                              max_colors: int, max_size,
                              iters: int = 8) -> Array:
    """imgaug KMeansColorQuantization: cluster the image's colors with
    k-means, replace every pixel with its cluster center.

    Centers are fitted on the ``max_size``-downscaled image (imgaug does
    the same to bound cv2.kmeans cost): k-means++ seeding (static
    ``max_colors`` unrolled gumbel-categorical draws ∝ current squared
    distance) then ``iters`` static Lloyd rounds; empty clusters keep
    their previous center.  Per-image sampled ``n_colors`` masks surplus
    static center slots invalid.  Deviation (docs/schema.md): the fitted
    palette is applied at FULL resolution (each original pixel snaps to
    its nearest center) instead of imgaug's quantize-downscaled-then-
    resize-up, which blurs the palette back out.
    """
    b, h, w, c = images.shape
    small, hs, ws = _downscale(images, max_size)
    n = hs * ws
    flat = small.reshape(b, n, c)
    kk = max_colors
    keys = jax.random.split(rng, kk + 1)
    idx0 = jax.random.randint(keys[0], (b, 1), 0, n)
    center = jnp.take_along_axis(flat, idx0[..., None], axis=1)  # (B,1,C)
    centers = [center[:, 0]]
    best_d2 = jnp.sum((flat - center) ** 2, axis=-1)             # (B, N)
    for j in range(1, kk):
        g = jax.random.gumbel(keys[j], (b, n))
        pick = jnp.argmax(jnp.log(best_d2 + 1e-6) + g, axis=-1)  # (B,)
        cj = jnp.take_along_axis(flat, pick[:, None, None], axis=1)
        centers.append(cj[:, 0])
        best_d2 = jnp.minimum(best_d2,
                              jnp.sum((flat - cj) ** 2, axis=-1))
    centers = jnp.stack(centers, axis=1)                         # (B, K, C)
    valid = (jnp.arange(kk)[None, :]
             < jnp.clip(n_colors, 2, kk)[:, None])               # (B, K)
    for _ in range(max(1, int(iters))):
        assign = _chunked_argmin(flat, centers, valid)
        means, counts = _segment_means(assign, flat, kk)
        centers = jnp.where(((counts > 0.0) & valid)[..., None],
                            means, centers)
    # full-resolution palette mapping, chunked over pixels
    full = images.reshape(b, h * w, c)
    outs = []
    step = 65536
    for s in range(0, h * w, step):
        blk = full[:, s:s + step]
        a = _chunked_argmin(blk, centers, valid)
        outs.append(jnp.take_along_axis(centers, a[..., None], axis=1))
    return jnp.concatenate(outs, axis=1).reshape(b, h, w, c)
