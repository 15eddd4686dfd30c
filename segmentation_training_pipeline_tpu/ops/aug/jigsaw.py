"""imgaug Jigsaw: shuffle grid cells of the image (and mask) by a chain
of random adjacent-cell swaps (imgaug ``augmenters/geometric.py`` Jigsaw —
upstream reached via the imgaug dependency, SURVEY §2b; mount empty,
semantics reconstructed from the public imgaug docs).

TPU lowering: ``nb_rows``/``nb_cols`` must be STATIC ints (they set the
cell reshape shapes under XLA — a sampled grid would need data-dependent
shapes; rejected with a pointed error).  ``max_steps`` samples per image;
the swap chain unrolls to the spec's static maximum with surplus steps
masked to no-ops.  Each step picks a uniform cell and a uniform
4-neighbor direction and swaps the two cells' contents — steps that walk
off the grid no-op, [LOW] confidence vs imgaug's exact destination
generator (not installable here); the visual semantics (cells displaced
by a few adjacent hops, image and mask moved identically) match.

The image pads bottom/right (edge mode) to a cell multiple, permutes,
and crops back — masks use the same permutation, so this is an EXACT
joint geometric op (pure block moves, no resampling; binarity is
preserved bit-exactly).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _swap_chain(rng: Array, b: int, rows: int, cols: int,
                steps: Array, max_steps: int) -> Array:
    """(B, P) permutation from ``max_steps`` unrolled adjacent swaps;
    step s is live only where ``s < steps`` (per-image sample)."""
    p = rows * cols
    perm = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32), (b, p))
    dr = jnp.asarray([-1, 1, 0, 0], jnp.int32)
    dc = jnp.asarray([0, 0, -1, 1], jnp.int32)

    def one(perm_i, c, n, ok):
        vc, vn = perm_i[c], perm_i[n]
        return perm_i.at[c].set(jnp.where(ok, vn, vc)) \
                     .at[n].set(jnp.where(ok, vc, vn))

    vone = jax.vmap(one)
    for s in range(max_steps):
        kc, kd, rng = jax.random.split(rng, 3)
        cell = jax.random.randint(kc, (b,), 0, p)
        d = jax.random.randint(kd, (b,), 0, 4)
        r, cl = cell // cols, cell % cols
        nr, ncl = r + dr[d], cl + dc[d]
        ok = ((nr >= 0) & (nr < rows) & (ncl >= 0) & (ncl < cols)
              & (s < steps))
        n = jnp.clip(nr, 0, rows - 1) * cols + jnp.clip(ncl, 0, cols - 1)
        perm = vone(perm, cell, n, ok)
    return perm


def _permute_cells(x: Array, perm: Array, rows: int, cols: int,
                   pad_mode: str) -> Array:
    """Apply the (B, P) cell permutation to (B, H, W, C) with bottom/right
    padding to a cell multiple and a crop back."""
    b, h, w, c = x.shape
    hp = int(math.ceil(h / rows)) * rows
    wp = int(math.ceil(w / cols)) * cols
    if hp != h or wp != w:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                    mode=pad_mode)
    ch, cw = hp // rows, wp // cols
    cells = (x.reshape(b, rows, ch, cols, cw, c)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(b, rows * cols, ch, cw, c))
    cells = jnp.take_along_axis(
        cells, perm[:, :, None, None, None], axis=1)
    out = (cells.reshape(b, rows, cols, ch, cw, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, hp, wp, c))
    return out[:, :h, :w]


def jigsaw(rng: Array, images: Array, masks: Array, rows: int, cols: int,
           steps: Array, max_steps: int) -> Tuple[Array, Array]:
    """Joint image+mask jigsaw shuffle.  steps (B,) int32 with static
    ``max_steps``; rows/cols static."""
    b = images.shape[0]
    perm = _swap_chain(rng, b, int(rows), int(cols), steps, int(max_steps))
    imgs = _permute_cells(images, perm, int(rows), int(cols), "edge")
    # masks pad with 0 (the pipeline's segmentation-map fill rule)
    msks = _permute_cells(masks, perm, int(rows), int(cols), "constant")
    return imgs, msks
