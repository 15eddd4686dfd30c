"""YAML ``augmentation:`` block → one fused on-device aug function.

The reference resolves augmenter names to imgaug objects and runs them as
host multiprocess passes (SURVEY §2a 'Config loader', §3.5).  Here the
block *compiles*: geometric augmenters fold into a single per-image inverse
affine (+ optional elastic displacement field), executed as ONE warp for
images (bilinear) and masks (nearest); photometric augmenters fuse
elementwise after.  The whole thing runs inside the jitted train step.

Parameter semantics (imgaug-compatible where YAML can express it):
  * scalar           → deterministic value (probability for Fliplr/Flipud)
  * [lo, hi]         → uniform sample per image (imgaug tuple-range)
  * [a, b, c, ...]   → uniform choice per image (imgaug list)
  * {x: ..., y: ...} → independent per-axis parameters (Affine scale/translate)
Documented deviations: Rot90/CropToFixedSize keep the static output shape
(resize back) because XLA requires static shapes; 2-element YAML lists are
always ranges (YAML cannot distinguish imgaug's tuple vs list).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

import functools
import math
import os

import numpy as np

from . import fast_warp as FW
from . import jigsaw as jg
from . import pallas_elastic as PE
from . import photometric as ph
from . import segment as sg
from . import warp as W


def _use_pallas_elastic() -> bool:
    """Bounded-displacement Pallas elastic on real TPUs; exact footprint
    gather elsewhere.  Override with STP_PALLAS_ELASTIC=0/1."""
    return FW.use_pallas("STP_PALLAS_ELASTIC")

Array = jax.Array

_GEOMETRIC = {"fliplr", "horizontalflip", "flipud", "verticalflip", "rot90",
              "affine", "crop", "cropandpad", "pad",
              "croptofixedsize", "randomcrop",
              "padtofixedsize", "centercroptofixedsize",
              "elastictransformation", "elastictransform", "elastic",
              "piecewiseaffine", "perspectivetransform"}

# BlendAlpha family (imgaug blend combinators; pre-0.4 names Alpha /
# AlphaElementwise / SimplexNoiseAlpha / FrequencyNoiseAlpha are aliases).
# Lowered like meta-augmenters: child pipelines built recursively, the two
# branch outputs mixed by a per-image / per-pixel alpha map.
_BLEND = {"blendalpha", "alpha",
          "blendalphaelementwise", "alphaelementwise",
          "blendalphaverticallineargradient",
          "blendalphahorizontallineargradient",
          "blendalpharegulargrid", "blendalphacheckerboard",
          "blendalphasimplexnoise", "simplexnoisealpha",
          "blendalphafrequencynoise", "frequencynoisealpha",
          "blendalphasomecolors", "blendalphasegmapclassids"}

_META = {"sometimes", "someof", "oneof", "withchannels",
         "withhueandsaturation", "withbrightnesschannels",
         "withcolorspace"} | _BLEND

# photo-path names that move pixels and transform the MASK jointly —
# rejected as children of the channel/colorspace-scoping combinators,
# which splice only the child's IMAGE back (the child's mask is
# discarded there, so these would scramble scoped channels away from
# the segmentation mask)
_JOINT_PHOTO = {"jigsaw"}

# photometrics that hard-assume a 3-channel RGB image — rejected as
# children of the colorspace-scoping combinators whose children see
# 1 or 2 channels (H/S or a brightness plane)
_RGB_ONLY_PHOTO = {"grayscale", "addtohueandsaturation",
                   "multiplyhueandsaturation", "addtohue", "addtosaturation",
                   "multiplyhue", "multiplysaturation", "removesaturation",
                   "changecolortemperature", "fastsnowylandscape",
                   "jpegcompression", "bilateralblur",
                   "canny", "changecolorspace", "cartoon"}



def _percent_arg(args: Any, default: Any) -> Any:
    """Crop/CropAndPad/Pad percent spec: dict {percent: ...}, bare scalar,
    or bare range list all mean the per-side fraction distribution."""
    if isinstance(args, dict):
        return args.get("percent", default)
    return default if args is None else args


def _sample(rng: Array, spec: Any, b: int, default: float = 0.0) -> Array:
    """Lower one parameter spec to a (B,) float32 sample."""
    if spec is None:
        return jnp.full((b,), default, jnp.float32)
    if isinstance(spec, (int, float)):
        return jnp.full((b,), float(spec), jnp.float32)
    if isinstance(spec, (list, tuple)):
        vals = [float(v) for v in spec]
        if len(vals) == 2:
            return jax.random.uniform(rng, (b,), minval=vals[0], maxval=vals[1])
        arr = jnp.asarray(vals, jnp.float32)
        idx = jax.random.randint(rng, (b,), 0, len(vals))
        return arr[idx]
    raise ValueError(f"cannot lower augmentation parameter {spec!r}")


def _bare(args: Any, key: str) -> Dict[str, Any]:
    """Coerce an augmenter's YAML args to a dict: a dict passes through,
    a bare scalar/list means ``{key: args}``, and a bare ``Name:`` (YAML
    null) means "all defaults" — i.e. {} — so ``.get(key, imgaug_default)``
    sees its default instead of an explicit None (which ``_sample`` would
    otherwise lower to 0.0, a silent no-op; r5 review finding)."""
    if isinstance(args, dict):
        return args
    if args is None:
        return {}
    return {key: args}


def _sample_xy(rng: Array, spec: Any, b: int, default: float) -> Tuple[Array, Array]:
    if isinstance(spec, dict):
        kx, ky = jax.random.split(rng)
        return (_sample(kx, spec.get("x"), b, default),
                _sample(ky, spec.get("y"), b, default))
    v = _sample(rng, spec, b, default)
    return v, v


_CHEAP_GEO = {"fliplr", "horizontalflip", "flipud", "verticalflip", "rot90"}


def _flip_p(args) -> float:
    if isinstance(args, (int, float)):
        return float(args)
    return float((args or {}).get("p", 0.5))


def _apply_cheap_geo(specs, rng, images, masks):
    """Flips/rot90 as reverse+select — no gather.  At 512² the general warp
    gather costs ~2x a full fwd+bwd on TPU (measured); flips are the common
    case and must stay ~free."""
    b = images.shape[0]
    square = images.shape[1] == images.shape[2]
    keys = jax.random.split(rng, len(specs))
    for k, s in zip(keys, specs):
        name = s["name"].lower()
        args = s.get("args")
        if name in ("fliplr", "horizontalflip"):
            f = jax.random.bernoulli(k, _flip_p(args), (b,))[:, None, None, None]
            images = jnp.where(f, images[:, :, ::-1, :], images)
            masks = jnp.where(f, masks[:, :, ::-1, :], masks)
        elif name in ("flipud", "verticalflip"):
            f = jax.random.bernoulli(k, _flip_p(args), (b,))[:, None, None, None]
            images = jnp.where(f, images[:, ::-1, :, :], images)
            masks = jnp.where(f, masks[:, ::-1, :, :], masks)
        elif name == "rot90":
            kk = args if args is not None else [0, 3]
            spec_k = kk.get("k") if isinstance(kk, dict) else kk
            if isinstance(spec_k, (list, tuple)) and len(spec_k) == 2:
                ks = jax.random.randint(k, (b,), int(spec_k[0]),
                                        int(spec_k[1]) + 1)
            elif isinstance(spec_k, (list, tuple)):
                arr = jnp.asarray([int(v) for v in spec_k], jnp.int32)
                ks = arr[jax.random.randint(k, (b,), 0, len(spec_k))]
            else:
                ks = jnp.full((b,), int(spec_k), jnp.int32)

            def rotk(x, ks=ks):
                r1 = jnp.rot90(x, 1, axes=(1, 2))
                r2 = x[:, ::-1, ::-1, :]
                r3 = jnp.rot90(x, 3, axes=(1, 2))
                kb = ks[:, None, None, None]
                return jnp.where(kb == 1, r1,
                                 jnp.where(kb == 2, r2,
                                           jnp.where(kb == 3, r3, x)))

            images = rotk(images)
            masks = rotk(masks)
    return images, masks


def _coerce_block(spec) -> List[Dict[str, Any]]:
    """Accept raw YAML aug blocks ({Name: args} / list) or config-normalized
    [{"name","args"}] lists and return the normalized list form."""
    if spec is None:
        return []
    if isinstance(spec, dict):
        if "name" in spec and "args" in spec and len(spec) == 2:
            return [spec]
        return [{"name": n, "args": a} for n, a in spec.items()]
    out: List[Dict[str, Any]] = []
    for entry in spec:
        if isinstance(entry, str):
            out.append({"name": entry, "args": None})
        elif isinstance(entry, dict) and "name" in entry and "args" in entry:
            out.append(entry)
        elif isinstance(entry, dict) and len(entry) == 1:
            n, a = next(iter(entry.items()))
            out.append({"name": n, "args": a})
        elif isinstance(entry, list):
            raise ValueError(
                "nested augmenter lists are only valid inside meta-augmenter "
                f"children, got {entry!r}")
        else:
            raise ValueError(f"bad augmentation entry {entry!r}")
    # Rotate/TranslateX/Y/ScaleX/Y/ShearX/Y are pure sugar for Affine
    # (imgaug 0.4 defines them the same way) — rewriting here keeps them
    # fusable into geo warp runs and valid inside meta-augmenter children
    for e in out:
        nm = e["name"].lower()
        a = e["args"]
        if nm == "rotate":
            if isinstance(a, dict) and "rotate" in a:
                e["args"] = a          # already Affine-kwarg shaped
            else:
                if isinstance(a, dict):
                    a = a.get("value", [-30, 30])
                e["args"] = {"rotate": a if a is not None else [-30, 30]}
            e["name"] = "Affine"
        elif nm in ("translatex", "translatey"):
            ax = "x" if nm.endswith("x") else "y"
            if isinstance(a, dict):
                if "px" in a:
                    e["args"] = {"translate_px": {ax: a["px"]}}
                else:
                    e["args"] = {"translate_percent":
                                 {ax: a.get("percent", [-0.25, 0.25])}}
            else:
                e["args"] = {"translate_percent":
                             {ax: a if a is not None else [-0.25, 0.25]}}
            e["name"] = "Affine"
        elif nm in ("scalex", "scaley"):
            ax = "x" if nm.endswith("x") else "y"
            if isinstance(a, dict):
                a = a.get("scale", a.get("value"))
            e["name"] = "Affine"
            e["args"] = {"scale": {ax: a if a is not None else [0.75, 1.25]}}
        elif nm in ("shearx", "sheary"):
            ax = "x" if nm.endswith("x") else "y"
            if isinstance(a, dict):
                a = a.get("shear", a.get("value"))
            sh = a if a is not None else [-30, 30]
            e["name"] = "Affine"
            # the Affine shear dict form samples x and y independently;
            # pin the other axis to 0
            e["args"] = {"shear": ({"x": sh, "y": 0} if ax == "x"
                                   else {"x": 0, "y": sh})}
    return out


def build_augmentation(specs: List[Dict[str, Any]],
                       integer_input: bool = True) -> Callable:
    """specs: [{"name": ..., "args": ...}] (config-normalized) →
    ``aug_fn(rng, images_u8, masks) -> (images_f32_0..255, masks)``.

    ``integer_input=False`` marks a CHILD pipeline whose input may carry
    non-integer floats (a meta/blend combinator placed after another
    segment): its first geo segment must then skip the uint8-exact gather
    packing, whose float->u8 cast truncates fractional values and clamps
    anything outside 0..255.

    User block order is PRESERVED across the geometric/photometric boundary
    (imgaug applies augmenters sequentially; `{Add: 10, Affine: ...}` adds
    BEFORE warping so the warp fill stays 0 — round-1 silently reordered).
    Contiguous runs of geometric augmenters still fuse into one warp each;
    the common all-geo-then-photo block therefore still compiles to a
    single sampling pass.
    """
    specs = _coerce_block(specs)

    # order-preserving segmentation: geo runs fuse, photo/meta stay single
    segments: List[Tuple[str, Any]] = []
    for s in specs:
        nm = s["name"].lower()
        if nm in _GEOMETRIC:
            if segments and segments[-1][0] == "geo":
                segments[-1][1].append(s)
            else:
                segments.append(("geo", [s]))
        elif nm in _META:
            segments.append(("meta", s))
        else:
            segments.append(("photo", s))

    seg_fns: List[Callable] = []
    for i, (kind, item) in enumerate(segments):
        first = (i == 0 and integer_input)
        if kind == "geo":
            # uint8-exact gather only for the FIRST segment of an integer-
            # input pipeline (photometrics before a warp leave non-integer
            # values)
            seg_fns.append(_make_geo_run(item, integer_input=first))
        elif kind == "meta":
            seg_fns.append(_make_meta(item, integer_input=first))
        else:
            seg_fns.append(functools.partial(_apply_photo, item))

    def aug_fn(rng: Array, images: Array, masks: Array):
        # images stay uint8 as long as possible (flip/rot90 runs are
        # dtype-agnostic reverse+selects): at 512² B192 the eager f32 cast
        # plus flip temporaries cost >1 GB HBM for nothing.  Consumers that
        # need float (warps, photometrics) cast at their entry; the single
        # output cast below fuses into the clip.
        imgs = images
        keys = jax.random.split(rng, max(len(seg_fns), 1))
        for fn, k in zip(seg_fns, keys):
            imgs, masks = fn(k, imgs, masks)
        return jnp.clip(imgs.astype(jnp.float32), 0.0, 255.0), masks

    return aug_fn


def _solve_homography(dst: Array, src: Array) -> Array:
    """DLT: per-image 3×3 H with H·(dst, 1) ∝ (src, 1) from 4 point pairs.
    dst/src: (B, 4, 2) as (x, y).  Returns (B, 3, 3) with H[2,2]=1."""
    b = dst.shape[0]
    xd, yd = dst[..., 0], dst[..., 1]          # (B, 4)
    xs, ys = src[..., 0], src[..., 1]
    zeros = jnp.zeros_like(xd)
    ones = jnp.ones_like(xd)
    # rows for x': [xd, yd, 1, 0, 0, 0, -xd*xs, -yd*xs] · h = xs
    rx = jnp.stack([xd, yd, ones, zeros, zeros, zeros, -xd * xs, -yd * xs],
                   axis=-1)                     # (B, 4, 8)
    ry = jnp.stack([zeros, zeros, zeros, xd, yd, ones, -xd * ys, -yd * ys],
                   axis=-1)
    A = jnp.concatenate([rx, ry], axis=1)       # (B, 8, 8)
    rhs = jnp.concatenate([xs, ys], axis=1)     # (B, 8)
    hvec = jnp.linalg.solve(A, rhs[..., None])[..., 0]  # (B, 8)
    H = jnp.concatenate([hvec, jnp.ones((b, 1), hvec.dtype)], axis=1)
    return H.reshape(b, 3, 3)


def _perspective_field(k: Array, b: int, h: int, w: int,
                       scale: Array) -> Tuple[Array, Array]:
    """imgaug PerspectiveTransform as a residual displacement field:
    corners move INWARD by |N(0, scale)|·dim (imgaug takes absolute values
    of the sampled offsets), the jittered quad is mapped from the full
    frame by a homography, and ``src - dst`` rides the existing
    displacement machinery (no new sampler).  Deviation: imgaug crops to
    the quad's bbox then resizes (keep_size) — equivalent up to its bbox
    rounding."""
    offs = jnp.abs(jax.random.normal(k, (b, 4, 2))) * scale[:, None, None]
    offs = offs * jnp.asarray([w, h], jnp.float32)
    # corner order: tl, tr, br, bl ; inward signs per corner
    signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    dst = jnp.asarray([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                      jnp.float32)
    src = dst[None] + offs * signs[None]
    Hm = _solve_homography(jnp.broadcast_to(dst, (b, 4, 2)), src)
    jj = jnp.arange(w, dtype=jnp.float32)[None, :]
    ii = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.broadcast_to(jj, (h, w))
    gy = jnp.broadcast_to(ii, (h, w))
    Hm = Hm[:, None, None]                       # (B,1,1,3,3)
    denom = Hm[..., 2, 0] * gx + Hm[..., 2, 1] * gy + Hm[..., 2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    xs = (Hm[..., 0, 0] * gx + Hm[..., 0, 1] * gy + Hm[..., 0, 2]) / denom
    ys = (Hm[..., 1, 0] * gx + Hm[..., 1, 1] * gy + Hm[..., 1, 2]) / denom
    return xs - gx, ys - gy


def _piecewise_field(k: Array, b: int, h: int, w: int, scale: Array,
                     nb_rows: int, nb_cols: int) -> Tuple[Array, Array]:
    """imgaug PiecewiseAffine approximated as a bilinearly-upsampled grid
    displacement field: each of the nb_rows×nb_cols control points moves
    by N(0, scale·dim) px (imgaug's jitter distribution), interpolated
    smoothly instead of Delaunay piecewise-affine patches (documented
    deviation; fields agree to first order away from triangle edges)."""
    coarse = jax.random.normal(k, (b, 2, nb_rows, nb_cols))
    dx_c = coarse[:, 0] * (scale * w)[:, None, None]
    dy_c = coarse[:, 1] * (scale * h)[:, None, None]
    dx = jax.image.resize(dx_c, (b, h, w), "bilinear")
    dy = jax.image.resize(dy_c, (b, h, w), "bilinear")
    return dx, dy


def _make_geo_run(geo: List[Dict[str, Any]], integer_input: bool) -> Callable:
    """One contiguous run of geometric augmenters → ONE fused warp."""

    # imgaug fill-value support: Affine/Crop-family `cval` (CropAndPad/Pad
    # also accept imgaug's `pad_cval`).  The fused warp fills with 0 by
    # construction, so a non-zero cval is applied as warp(img − cval) + cval
    # — exact for constant fill, including the bilinear edge blend (imgaug
    # blends content with cval at partial-coverage border pixels the same
    # way).  One fused warp has ONE fill region, so with several cval
    # specs in a run the LAST wins (documented in schema.md).  Only
    # mode='constant' is supported; imgaug's edge/reflect/wrap modes would
    # need per-mode samplers in every warp path.
    _cval_spec = None
    for _s in geo:
        _a = _s.get("args")
        if (_s["name"].lower() in ("croptofixedsize", "randomcrop",
                                   "centercroptofixedsize",
                                   "padtofixedsize")
                and not (isinstance(_a, dict)
                         and (_a.get("width") is not None
                              or _a.get("height") is not None))):
            raise ValueError(
                f"{_s['name']} needs {{width: ..., height: ...}} (imgaug "
                "requires them; omit one to leave that axis unchanged) — "
                "without them it would be a silent no-op")
        if isinstance(_a, dict):
            for _mk in ("mode", "pad_mode"):
                _md = _a.get(_mk)
                if _md not in (None, "constant"):
                    raise ValueError(
                        f"{_s['name']}: only {_mk}='constant' fill is "
                        f"supported (got {_md!r}); imgaug's edge/reflect/"
                        "wrap border modes are not lowered — see "
                        "docs/schema.md")
            for _pk in ("px", "percent"):
                _pv = _a.get(_pk)
                if (isinstance(_pv, (list, tuple)) and len(_pv) == 4
                        and _s["name"].lower() in ("crop", "cropandpad",
                                                   "pad")):
                    raise ValueError(
                        f"{_s['name']}: the imgaug 4-tuple per-side {_pk} "
                        "form (top, right, bottom, left) is not lowered — "
                        "each side samples independently from a scalar or "
                        "[lo, hi] range here; see docs/schema.md")
            _cv = _a.get("cval", _a.get("pad_cval"))
            if _cv is not None:
                _cval_spec = _cv

    # fast path: flips/rot90 only → no warp gather at all (rot90 on
    # non-square images still needs the resizing warp, so square-only)
    def _cheap_ok(shape_square: bool) -> bool:
        if not geo:
            return True
        names = {s["name"].lower() for s in geo}
        if not names <= _CHEAP_GEO:
            return False
        return shape_square or "rot90" not in names

    def _multipass_ok(h: int, w: int) -> bool:
        """The 3-pass warp extracts rot90s only on square frames; on
        non-square frames its shear/scale factorization degenerates as
        the rotation approaches 90 deg.  Decide from the STATIC spec:
        square is always fine; non-square is fine iff there is no rot90
        and the affine rotation range stays well below 90 deg.  Either
        way, a static shear bound whose excursion + interpolation margin
        exceeds the maximum (full-dim) canvas pad means the multipass
        would clip content — use the exact footprint gather instead."""
        shape_square = h == w
        # pad cap is 1.0 = t/2 + 12/dim at t == 2 − 24/dim (see _pad_frac)
        if _shear_tan_for(shape_square) > 2.0 - 24.0 / max(min(h, w), 13):
            return False
        if shape_square:
            return True
        for s in geo:
            name = s["name"].lower()
            if name == "rot90":
                return False
            if name == "affine":
                rot = (s.get("args") or {}).get("rotate")
                if rot is None:
                    continue
                vals = rot if isinstance(rot, (list, tuple)) else [rot]
                try:
                    if max(abs(float(v)) for v in vals) >= 60.0:
                        return False
                except (TypeError, ValueError):
                    return False
        return True

    _ELASTIC_NAMES = ("elastictransformation", "elastictransform", "elastic")
    # ops that contribute a displacement FIELD (not an affine factor)
    _DISP_NAMES = _ELASTIC_NAMES + ("piecewiseaffine", "perspectivetransform")
    geo_nonelastic = [s for s in geo
                      if s["name"].lower() not in _DISP_NAMES]

    def _static_magnification() -> float:
        """Static upper bound on how much the forward affine can magnify
        the elastic displacement (D' = A₂ₓ₂⁻¹·D): zoom from scale/crop
        specs + a shear allowance.  Drives the Pallas kernel's K bound."""
        mag = 1.0
        for s in geo_nonelastic:
            name = s["name"].lower()
            a = s.get("args") or {}
            try:
                if name == "affine":
                    sc = a.get("scale")
                    if sc is not None:
                        vals = (list(sc.values()) if isinstance(sc, dict)
                                else sc if isinstance(sc, (list, tuple))
                                else [sc])
                        flat = []
                        for v in vals:
                            flat += (list(v) if isinstance(v, (list, tuple))
                                     else [v])
                        mag *= max(max(abs(float(v)) for v in flat), 1.0)
                    sh = a.get("shear")
                    if sh is not None:
                        vals = (list(sh.values()) if isinstance(sh, dict)
                                else sh if isinstance(sh, (list, tuple))
                                else [sh])
                        flat = []
                        for v in vals:
                            flat += (list(v) if isinstance(v, (list, tuple))
                                     else [v])
                        smax = max(abs(float(v)) for v in flat)
                        mag *= 1.0 + math.tan(math.radians(min(smax, 80.0)))
                elif name == "crop":
                    if isinstance(a, dict) and "px" in a:
                        mag *= 4.0  # px/dim unknown statically: conservative
                    else:
                        pct = _percent_arg(a, [0, 0.1])
                        vals = (pct if isinstance(pct, (list, tuple))
                                else [pct])
                        pmax = max(float(v) for v in vals)
                        mag *= 1.0 / max(1.0 - 2.0 * pmax, 0.1)
                elif name in ("cropandpad", "pad"):
                    if isinstance(a, dict) and "px" in a:
                        mag *= 4.0
                    else:
                        # negative percent crops (zoom-in magnifies disp)
                        pct = _percent_arg(a, [0, 0.1])
                        vals = (pct if isinstance(pct, (list, tuple))
                                else [pct])
                        pmin = min(float(v) for v in vals)
                        if pmin < 0:
                            mag *= 1.0 / max(1.0 + 2.0 * pmin, 0.1)
                elif name in ("croptofixedsize", "randomcrop",
                              "centercroptofixedsize"):
                    # zoom factor known only relative to the input shape;
                    # bounded inside aug_fn where h/w are known — use a
                    # generous static cap here (PadToFixedSize zooms OUT,
                    # shrinking displacement: no contribution)
                    mag *= 4.0
            except (TypeError, ValueError):
                mag *= 4.0  # unparseable spec: be conservative
        return mag

    _mag_bound = _static_magnification()

    def _static_shear_tan() -> float:
        """Static bound on |tan| of the multipass shear factors — the
        shears' per-line displacement is |s|·(dim/2), so this sizes the
        canvas padding.  The factorization gives s1 = tan(θ)·(sy/sx)
        (anisotropy MULTIPLIES the shear, it does not divide out), so the
        bound is tan(rot+shear) · aniso where aniso covers every op that
        can scale x and y differently: Affine {x:…, y:…} scale dicts and
        independently-sampled per-side Crop/CropAndPad fractions.
        Translate/flips contribute nothing; rot90s are extracted before
        the shears (square frames — _shear_tan_for caps the residual at
        45°/60° per frame shape).  Returns (rot+shear degrees, aniso
        factor); unparseable specs fall back to a conservative (90°,
        2.0)."""
        rot = 0.0
        shear = 0.0
        aniso = 1.0
        try:
            for s in geo_nonelastic:
                name = s["name"].lower()
                a = s.get("args") or {}
                if name == "affine":
                    # STACKED Affine ops compose: rotations/shears ADD
                    r = a.get("rotate")
                    if r is not None:
                        rot += max(abs(v) for v in _static_bounds(r, 0.0))
                    sh = a.get("shear")
                    if sh is not None:
                        spec = (list(sh.values()) if isinstance(sh, dict)
                                else sh)
                        shear += max(abs(v)
                                     for v in _static_bounds(spec, 0.0))
                    sc = a.get("scale")
                    if isinstance(sc, dict):
                        # only the dict form samples x and y independently;
                        # a MISSING axis defaults to 1.0 at runtime
                        # (_sample_xy), so 1.0 joins the range
                        los, his = zip(*(_static_bounds(sc.get(ax), 1.0)
                                         for ax in ("x", "y")))
                        lo, hi = min(los), max(his)
                        if lo <= 0:
                            # degenerate zoom: sy/sx is unbounded — force
                            # the exact-gather path via the multipass gate
                            aniso = math.inf
                        else:
                            aniso *= hi / lo
                elif name in ("crop", "cropandpad", "pad"):
                    if isinstance(a, dict) and "px" in a:
                        # px/dim unknown at build time — conservative
                        # anisotropy allowance (harmless when tan == 0)
                        aniso *= 4.0
                        continue
                    # per-side fractions sample independently → the x/y
                    # scale factors differ within the percent range
                    pct = _percent_arg(a, [0, 0.1])
                    lo, hi = _static_bounds(pct, 0.0)
                    if name == "crop":
                        lo, hi = -hi, -lo  # crop percent p shrinks by 2p
                    if name == "pad":
                        lo = max(lo, 0.0)
                    f_lo = max(1.0 + 2.0 * lo, 0.1)
                    f_hi = max(1.0 + 2.0 * hi, 0.1)
                    aniso *= f_hi / f_lo
                elif name in ("croptofixedsize", "randomcrop",
                              "centercroptofixedsize", "padtofixedsize"):
                    # fixed-size windows scale x by width/w and y by
                    # height/h → anisotropy (width/height)·(h/w): exact
                    # on square frames; non-square frames keep the 0.5
                    # pad floor in _pad_frac
                    wd = a.get("width")
                    ht = a.get("height")
                    if wd is not None or ht is not None:
                        r = (float(wd if wd is not None else ht)
                             / float(ht if ht is not None else wd))
                        aniso *= max(r, 1.0 / r)
        except (TypeError, ValueError, ZeroDivisionError):
            return 90.0, 2.0
        return rot + shear, aniso

    _shear_deg, _shear_aniso = _static_shear_tan()

    def _shear_tan_for(square: bool) -> float:
        # rot90 extraction caps the residual at 45° on square frames
        # only; non-square multipass admits rotations up to the 60° gate.
        # tan == 0 (no rotation/shear anywhere) means s1 == s2 == 0 for
        # ANY anisotropy (diagonal matrices compose diagonally) — also
        # sidesteps 0·inf for degenerate scale specs.
        cap = 45.0 if square else 60.0
        t = math.tan(math.radians(min(_shear_deg, cap)))
        return t * _shear_aniso if t > 0.0 else 0.0

    def _pad_frac(h: int, w: int) -> float:
        """Canvas pad fraction: content excursion |s|·(dim/2) + margin,
        capped at 1.0 (a full-dim pad; |s| beyond 2 disables the
        multipass — see _multipass_ok).  Square frames only (non-square
        skips rot90 extraction, keep the lossless-for-isotropic default).
        A Fliplr+Affine(rotate ±15°) config drops the canvas from 2·dim
        to ~1.35·dim — the shear rolls and scale dots shrink
        proportionally."""
        t = _shear_tan_for(h == w)
        base = 0.5 if h != w else 0.0  # non-square keeps the old floor
        return min(1.0, max(base, t / 2.0 + 12.0 / max(min(h, w), 1)))

    def run(rng: Array, images: Array, masks: Array):
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        keys = list(jax.random.split(rng, len(geo) + 1))

        if _cheap_ok(h == w):
            return _apply_cheap_geo(geo, keys[-1], images, masks)

        images = images.astype(jnp.float32)  # warps need float math
        mats = W.identity_mats(b)
        disp: Optional[Tuple[Array, Array]] = None
        disp_bound = 0.0  # static 6-sigma bound on |disp| (Pallas K)

        for i, s in enumerate(geo):
            name = s["name"].lower()
            args = s.get("args")
            k = keys[i]
            if name in ("fliplr", "horizontalflip"):
                p = float(args) if isinstance(args, (int, float)) else \
                    float((args or {}).get("p", 0.5))
                flips = jax.random.bernoulli(k, p, (b,))
                mats = W.compose(W.hflip(w, flips), mats)
            elif name in ("flipud", "verticalflip"):
                p = float(args) if isinstance(args, (int, float)) else \
                    float((args or {}).get("p", 0.5))
                flips = jax.random.bernoulli(k, p, (b,))
                mats = W.compose(W.vflip(h, flips), mats)
            elif name == "rot90":
                kk = args if args is not None else [0, 3]
                spec_k = kk.get("k") if isinstance(kk, dict) else kk
                if isinstance(spec_k, (list, tuple)) and len(spec_k) == 2:
                    ks = jax.random.randint(k, (b,), int(spec_k[0]),
                                            int(spec_k[1]) + 1)
                elif isinstance(spec_k, (list, tuple)):
                    arr = jnp.asarray([int(v) for v in spec_k], jnp.int32)
                    ks = arr[jax.random.randint(k, (b,), 0, len(spec_k))]
                else:
                    ks = jnp.full((b,), int(spec_k), jnp.int32)
                mats = W.compose(W.rot90s(h, w, ks), mats)
            elif name == "affine":
                a = args or {}
                k1, k2, k3, k4 = jax.random.split(k, 4)
                sx, sy = _sample_xy(k1, a.get("scale"), b, 1.0)
                mats = W.compose(W.scale_about(cx, cy, sx, sy), mats)
                if "translate_percent" in a:
                    tx, ty = _sample_xy(k2, a["translate_percent"], b, 0.0)
                    tx, ty = tx * w, ty * h
                else:
                    tx, ty = _sample_xy(k2, a.get("translate_px"), b, 0.0)
                # inverse translation: src = dst - t
                mats = W.compose(W.translation(-tx, -ty), mats)
                rot = _sample(k3, a.get("rotate"), b, 0.0) * (jnp.pi / 180.0)
                mats = W.compose(W.rotation_about(cx, cy, rot), mats)
                shear = a.get("shear")
                shx, shy = _sample_xy(k4, shear, b, 0.0)
                shx = shx * (jnp.pi / 180.0)
                shy = shy * (jnp.pi / 180.0) if isinstance(shear, dict) else \
                    jnp.zeros_like(shy)
                mats = W.compose(W.shear_about(cx, cy, shx, shy), mats)
            elif name in ("crop",):
                k1, k2, k3, k4 = jax.random.split(k, 4)
                if isinstance(args, dict) and "px" in args:
                    # imgaug px form: absolute per-side pixels → fractions
                    px = args["px"]
                    left = _sample(k1, px, b, 0.0) / w
                    right = _sample(k2, px, b, 0.0) / w
                    top = _sample(k3, px, b, 0.0) / h
                    bot = _sample(k4, px, b, 0.0) / h
                else:
                    pct = _percent_arg(args, [0, 0.1])
                    left = _sample(k1, pct, b, 0.0)
                    right = _sample(k2, pct, b, 0.0)
                    top = _sample(k3, pct, b, 0.0)
                    bot = _sample(k4, pct, b, 0.0)
                m = W.identity_mats(b)
                m = m.at[:, 0, 0].set(1.0 - left - right)
                m = m.at[:, 1, 1].set(1.0 - top - bot)
                m = m.at[:, 0, 2].set(left * w)
                m = m.at[:, 1, 2].set(top * h)
                mats = W.compose(m, mats)
            elif name in ("cropandpad", "pad"):
                # imgaug CropAndPad (keep_size=True): per-side signed
                # fraction — POSITIVE pads (source window grows beyond
                # the frame, fill outside), NEGATIVE crops; Pad is the
                # non-negative variant.  src = (1+pl+pr)·x − pl·w.
                k1, k2, k3, k4 = jax.random.split(k, 4)
                if isinstance(args, dict) and "px" in args:
                    px = args["px"]
                    left = _sample(k1, px, b, 0.0) / w
                    right = _sample(k2, px, b, 0.0) / w
                    top = _sample(k3, px, b, 0.0) / h
                    bot = _sample(k4, px, b, 0.0) / h
                else:
                    pct = _percent_arg(args, [0, 0.1])
                    left = _sample(k1, pct, b, 0.0)
                    right = _sample(k2, pct, b, 0.0)
                    top = _sample(k3, pct, b, 0.0)
                    bot = _sample(k4, pct, b, 0.0)
                if name == "pad":
                    left = jnp.maximum(left, 0.0)
                    right = jnp.maximum(right, 0.0)
                    top = jnp.maximum(top, 0.0)
                    bot = jnp.maximum(bot, 0.0)
                m = W.identity_mats(b)
                m = m.at[:, 0, 0].set(1.0 + left + right)
                m = m.at[:, 1, 1].set(1.0 + top + bot)
                m = m.at[:, 0, 2].set(-left * w)
                m = m.at[:, 1, 2].set(-top * h)
                mats = W.compose(m, mats)
            elif name in ("croptofixedsize", "randomcrop"):
                a = args or {}
                # imgaug never crops beyond the image: target > input no-ops
                ch = min(float(a.get("height", h)) / h, 1.0)
                cw = min(float(a.get("width", w)) / w, 1.0)
                k1, k2 = jax.random.split(k)
                if a.get("position") == "center":
                    offx = jnp.full((b,), (1.0 - cw) / 2.0)
                    offy = jnp.full((b,), (1.0 - ch) / 2.0)
                else:
                    offx = jax.random.uniform(k1, (b,)) * (1.0 - cw)
                    offy = jax.random.uniform(k2, (b,)) * (1.0 - ch)
                m = W.identity_mats(b)
                m = m.at[:, 0, 0].set(cw)
                m = m.at[:, 1, 1].set(ch)
                m = m.at[:, 0, 2].set(offx * w)
                m = m.at[:, 1, 2].set(offy * h)
                mats = W.compose(m, mats)
            elif name == "centercroptofixedsize":
                # deterministic centered CropToFixedSize (+ resize back,
                # the same static-shape deviation as CropToFixedSize)
                a = args or {}
                ch = min(float(a.get("height", h)) / h, 1.0)
                cw = min(float(a.get("width", w)) / w, 1.0)
                if cw < 1.0 or ch < 1.0:
                    m = W.identity_mats(b)
                    m = m.at[:, 0, 0].set(cw)
                    m = m.at[:, 1, 1].set(ch)
                    m = m.at[:, 0, 2].set((1.0 - cw) / 2.0 * w)
                    m = m.at[:, 1, 2].set((1.0 - ch) / 2.0 * h)
                    mats = W.compose(m, mats)
            elif name == "padtofixedsize":
                # imgaug PadToFixedSize pads to AT LEAST (height, width),
                # image placed at a random (default) or center position on
                # the padded canvas; lowered as the canvas-window affine
                # src = f·dst − off (resize-back deviation, like
                # CropToFixedSize).  Fill honors cval/pad_cval via the
                # run-level shift trick; masks fill 0.
                a = args or {}
                fh = max(float(a.get("height", h)) / h, 1.0)
                fw2 = max(float(a.get("width", w)) / w, 1.0)
                if fw2 > 1.0 or fh > 1.0:
                    k1, k2 = jax.random.split(k)
                    if a.get("position") == "center":
                        offx = jnp.full((b,), (fw2 - 1.0) / 2.0)
                        offy = jnp.full((b,), (fh - 1.0) / 2.0)
                    else:
                        offx = jax.random.uniform(k1, (b,)) * (fw2 - 1.0)
                        offy = jax.random.uniform(k2, (b,)) * (fh - 1.0)
                    m = W.identity_mats(b)
                    m = m.at[:, 0, 0].set(fw2)
                    m = m.at[:, 1, 1].set(fh)
                    m = m.at[:, 0, 2].set(-offx * w)
                    m = m.at[:, 1, 2].set(-offy * h)
                    mats = W.compose(m, mats)
            elif name in ("elastictransformation", "elastictransform", "elastic"):
                a = args or {}
                k1, k2, k3 = jax.random.split(k, 3)
                alpha = _sample(k1, a.get("alpha", 20.0), b)
                sigma = _sample(k2, a.get("sigma", 5.0), b)
                # static (host) reductions of the YAML ranges — these run
                # under jit tracing, so plain Python only (no jnp)
                _, a_max = _static_bounds(a.get("alpha"), 20.0)
                sig_min, sig_max = _static_bounds(a.get("sigma"), 5.0)
                radius = int(max(4, 2 * sig_max))
                # static 6-sigma displacement bound for the Pallas kernel:
                # smoothed-noise std ≈ alpha / (2·sqrt(pi)·sigma)
                disp_bound += (6.0 * a_max / (2.0 * math.sqrt(math.pi)
                                              * max(sig_min, 0.5)) + 1.0)
                # quarter-res field when the blur makes it lossless-ish
                stride = 4 if sig_min >= 2.0 else 1
                dx, dy = W.elastic_field(k3, b, h, w, alpha, sigma, radius,
                                         stride=stride)
                if disp is None:
                    disp = (dx, dy)
                else:
                    disp = (disp[0] + dx, disp[1] + dy)
            elif name == "piecewiseaffine":
                a = _bare(args, "scale")
                k1, k2 = jax.random.split(k)
                scale = _sample(k1, a.get("scale", [0.01, 0.05]), b)
                _, sc_max = _static_bounds(a.get("scale"), 0.05)
                nb_rows = int(a.get("nb_rows", 4))
                nb_cols = int(a.get("nb_cols", 4))
                dx, dy = _piecewise_field(k2, b, h, w, scale, nb_rows, nb_cols)
                disp_bound += 6.0 * sc_max * max(h, w) + 1.0
                disp = ((dx, dy) if disp is None
                        else (disp[0] + dx, disp[1] + dy))
            elif name == "perspectivetransform":
                a = _bare(args, "scale")
                k1, k2 = jax.random.split(k)
                scale = _sample(k1, a.get("scale", [0.0, 0.06]), b)
                _, sc_max = _static_bounds(a.get("scale"), 0.06)
                dx, dy = _perspective_field(k2, b, h, w, scale)
                disp_bound += 6.0 * sc_max * max(h, w) + 1.0
                disp = ((dx, dy) if disp is None
                        else (disp[0] + dx, disp[1] + dy))

        cv = None
        if _cval_spec is not None and geo:
            # keys[-1] is unused on the warp path (the cheap path consumed
            # it above and returned)
            cv = _sample(keys[-1], _cval_spec, b, 0.0)[:, None, None, None]
            images = images - cv

        imgs = images
        if geo:
            # K bound for the Pallas elastic kernel: static 6-sigma field
            # bound scaled by the forward affine's static magnification
            # (D' = A₂ₓ₂⁻¹·D grows with zoom-in) + a safety margin
            kbound = int(math.ceil(disp_bound * _mag_bound * 1.15)) + 2
            if disp is None and _multipass_ok(h, w):
                # pure affine: gather-free multi-pass warp (rolls + MXU
                # matmuls) — ~10x cheaper than the HBM footprint gather
                imgs, masks = FW.warp_joint_multipass(
                    imgs, masks, mats, pad_frac=_pad_frac(h, w))
            elif (disp is not None and _multipass_ok(h, w)
                  and kbound <= 64 and _use_pallas_elastic()):
                # affine + bounded elastic: the residual displacement
                # after the affine pass is D' = A₂ₓ₂⁻¹ · D
                if geo_nonelastic:
                    a00, a01 = mats[:, 0, 0], mats[:, 0, 1]
                    a10, a11 = mats[:, 1, 0], mats[:, 1, 1]
                    det = a00 * a11 - a01 * a10
                    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
                    dxf, dyf = disp
                    dxp = (a11[:, None, None] * dxf
                           - a01[:, None, None] * dyf) / det[:, None, None]
                    dyp = (-a10[:, None, None] * dxf
                           + a00[:, None, None] * dyf) / det[:, None, None]
                    dxp = jnp.clip(dxp, -kbound, kbound)
                    dyp = jnp.clip(dyp, -kbound, kbound)
                    if os.environ.get("STP_FUSE_ELASTIC", "0") not in (
                            "0", "false"):
                        # kernel YE (elastic inside the y-launch): measured
                        # NET-NEGATIVE at B128 512² (492 vs 485 ms — the
                        # row-tiled separate kernel pipelines better than a
                        # whole-plane tail; PERF.md round 2).  Kept behind
                        # this flag for other shapes/future Mosaic.
                        imgs, masks = FW.warp_joint_multipass(
                            imgs, masks, mats, pad_frac=_pad_frac(h, w),
                            disp=(dxp, dyp), disp_k=kbound)
                    else:
                        imgs, masks = FW.warp_joint_multipass(
                            imgs, masks, mats, pad_frac=_pad_frac(h, w))
                        imgs, masks = PE.warp_elastic_joint(
                            imgs, masks, dyp, dxp, kbound)
                else:
                    # elastic-only: the affine is the identity — skip the
                    # multipass no-op and use the raw field on the
                    # dedicated range-select kernel
                    dxp = jnp.clip(disp[0], -kbound, kbound)
                    dyp = jnp.clip(disp[1], -kbound, kbound)
                    imgs, masks = PE.warp_elastic_joint(imgs, masks, dyp,
                                                        dxp, kbound)
            else:
                # exact footprint gather: large/unbounded displacement,
                # non-square frames with >=90-deg rotations, or CPU; u8
                # taps are lossless only for integer-valued inputs (the
                # first segment — later runs may follow photometrics)
                # the cval shift makes values non-integer/negative — the
                # u8 tap packing is only valid without it
                imgs, masks = W.warp_joint(
                    imgs, masks, mats, disp,
                    gather_u8=integer_input and cv is None)
        if cv is not None:
            imgs = imgs + cv
        return imgs, masks

    return run


def _static_bounds(spec, default) -> Tuple[float, float]:
    """Static (host-side) min/max of a YAML parameter range — safe under
    jit tracing (plain Python only).  Handles ragged nesting (e.g. the
    ShearX sugar's ``[[-30, 30], 0]`` axis spec)."""
    if spec is None:
        spec = default
    if isinstance(spec, (int, float)):
        return float(spec), float(spec)

    def flat(v):
        if isinstance(v, (list, tuple)):
            return [x for e in v for x in flat(e)]
        return [float(v)]

    vals = flat(spec)
    return min(vals), max(vals)


def _sample_shape(rng: Array, spec: Any, shape: Tuple[int, ...],
                  default: float = 0.0) -> Array:
    """`_sample` generalized to an arbitrary static sample shape (used for
    per-pixel / per-cell alpha maps)."""
    if spec is None:
        return jnp.full(shape, default, jnp.float32)
    if isinstance(spec, (int, float)):
        return jnp.full(shape, float(spec), jnp.float32)
    if isinstance(spec, (list, tuple)):
        vals = [float(v) for v in spec]
        if len(vals) == 2:
            return jax.random.uniform(rng, shape, minval=vals[0],
                                      maxval=vals[1])
        arr = jnp.asarray(vals, jnp.float32)
        idx = jax.random.randint(rng, shape, 0, len(vals))
        return arr[idx]
    raise ValueError(f"cannot lower augmentation parameter {spec!r}")


def _static_max_size(v: Any, disp: str):
    """The Superpixels/Voronoi/KMeans ``max_size`` (imgaug default 128)
    must be a STATIC int — it sets the downscaled compute shape.  ``null``
    disables the downscale (imgaug max_size=None)."""
    if v is None:
        return None
    if isinstance(v, bool) or not isinstance(v, int) or v < 2:
        raise ValueError(
            f"{disp}: max_size must be a static integer >= 2 or null "
            f"(it sets a compile-time compute shape under XLA), got {v!r}")
    return v


def _sample_int(rng: Array, spec: Any, b: int,
                default: int) -> Tuple[Array, int]:
    """Integer spec → ((B,) int32 samples, static max).  int = fixed,
    [lo, hi] = inclusive uniform range (imgaug tuple), longer list =
    choice."""
    if spec is None:
        spec = default
    if isinstance(spec, (int, float)):
        v = int(spec)
        return jnp.full((b,), v, jnp.int32), v
    vals = [int(v) for v in spec]
    if len(vals) == 2:
        lo, hi = min(vals), max(vals)
        return jax.random.randint(rng, (b,), lo, hi + 1), hi
    arr = jnp.asarray(vals, jnp.int32)
    idx = jax.random.randint(rng, (b,), 0, len(vals))
    return arr[idx], max(vals)


_BLEND_CANON = {"alpha": "blendalpha",
                "alphaelementwise": "blendalphaelementwise",
                "simplexnoisealpha": "blendalphasimplexnoise",
                "frequencynoisealpha": "blendalphafrequencynoise"}


def _blend_alpha_map(name: str, a: Dict[str, Any], k: Array, b: int, h: int,
                     w: int, c: int, per_ch: bool,
                     base_img: Optional[Array] = None,
                     masks: Optional[Array] = None) -> Array:
    """The per-variant alpha map in [0, 1], broadcastable to (B, H, W, C).

    imgaug mask-generator semantics (docs/schema.md lists deviations):
      * BlendAlpha: one factor per image (per_channel → per channel).
      * BlendAlphaElementwise: factor sampled per pixel.
      * *LinearGradient: min_value→max_value between start_at/end_at
        (fractions of the axis), clipped outside.
      * RegularGrid: nb_rows×nb_cols cells, per-cell alpha (default a fair
        0/1 coin, imgaug's `alpha=[0.0, 1.0]` choice); lowered gather-free
        as two one-hot matmuls against the (B, R, C) cell grid.
      * Checkerboard: same grid, alpha alternates 1/0 from the top-left.
      * SimplexNoise: blob masks from 4 fixed octaves (2..16 px) of
        bilinearly-upsampled uniform value noise, max-aggregated +
        sigmoid-sharpened (documented deviation: value noise approximates
        the reference's simplex noise; same blob statistics).
      * FrequencyNoise: white noise shaped by f^exponent in the Fourier
        domain (XLA FFT), min-max normalized per image.
      * SomeColors: per-HUE-BIN binary alphas, circularly smoothed,
        looked up per pixel from the INPUT image's hue (``base_img``).
      * SegMapClassIds: alpha = 1 where the pipeline's own segmentation
        MASK carries one of ``class_ids`` (id 0 = background/no channel,
        id i>=1 = mask channel i−1 — docs/schema.md).
    """
    if name == "blendalpha":
        spec = a.get("factor", a.get("alpha"))
        if spec is None:
            spec = [0.0, 1.0]
        if per_ch:
            return _sample_shape(k, spec, (b, 1, 1, c))
        return _sample_shape(k, spec, (b,))[:, None, None, None]
    if name == "blendalphaelementwise":
        spec = a.get("factor", a.get("alpha"))
        if spec is None:
            spec = [0.0, 1.0]
        shape = (b, h, w, c) if per_ch else (b, h, w, 1)
        return _sample_shape(k, spec, shape)
    if name in ("blendalphaverticallineargradient",
                "blendalphahorizontallineargradient"):
        vertical = "vertical" in name
        k1, k2 = jax.random.split(k)
        mn = float(a.get("min_value", 0.0))
        mx = float(a.get("max_value", 1.0))
        n = h if vertical else w
        s0 = _sample(k1, a.get("start_at", [0.0, 1.0]), b)
        e0 = _sample(k2, a.get("end_at", [0.0, 1.0]), b)
        pos = jnp.linspace(0.0, 1.0, n)[None, :]
        d = e0 - s0
        d = jnp.where(jnp.abs(d) < 1e-6, jnp.where(d < 0, -1e-6, 1e-6), d)
        t = jnp.clip((pos - s0[:, None]) / d[:, None], 0.0, 1.0)
        al = mn + (mx - mn) * t                       # (B, n)
        return al[:, :, None, None] if vertical else al[:, None, :, None]
    if name in ("blendalpharegulargrid", "blendalphacheckerboard"):
        kr, kc, kg = jax.random.split(k, 3)
        rs, rmax = _sample_int(kr, a.get("nb_rows"), b, 4)
        cs, cmax = _sample_int(kc, a.get("nb_cols"), b, 4)
        iy = (jnp.arange(h)[None, :] * rs[:, None]) // h      # (B, H) cell row
        ix = (jnp.arange(w)[None, :] * cs[:, None]) // w      # (B, W) cell col
        if name == "blendalphacheckerboard":
            al = ((iy[:, :, None] + ix[:, None, :]) % 2 == 0)
            return al.astype(jnp.float32)[..., None]
        spec = a.get("alpha")
        if spec is None:
            grid = jax.random.bernoulli(kg, 0.5,
                                        (b, rmax, cmax)).astype(jnp.float32)
        else:
            grid = _sample_shape(kg, spec, (b, rmax, cmax))
        ohy = (iy[:, :, None] == jnp.arange(rmax)[None, None, :])
        ohx = (ix[:, :, None] == jnp.arange(cmax)[None, None, :])
        # HIGHEST: the alpha map feeds the mask's >= 0.5 routing compare;
        # bf16 input rounding of sampled grid alphas could flip it at ties
        al = jnp.einsum("bhr,brc,bwc->bhw", ohy.astype(jnp.float32), grid,
                        ohx.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
        return al[..., None]
    if name == "blendalphasimplexnoise":
        ks = jax.random.split(k, 5)
        octs = []
        for kk, s0 in zip(ks[:4], (2, 4, 8, 16)):
            g = jax.random.uniform(kk, (b, s0, s0))
            octs.append(jax.image.resize(g, (b, h, w), "linear"))
        noise = jnp.stack(octs).max(axis=0)
        if a.get("sigmoid", True):
            th = _sample(ks[4], a.get("sigmoid_thresh", [0.4, 0.6]), b)
            noise = jax.nn.sigmoid(10.0 * (noise - th[:, None, None]))
        return noise[..., None]
    if name == "blendalphafrequencynoise":
        ke, kn, kt = jax.random.split(k, 3)
        exp = _sample(ke, a.get("exponent", [-4.0, 4.0]), b)
        white = jax.random.normal(kn, (b, h, w))
        spec2 = jnp.fft.rfft2(white)
        fy = jnp.fft.fftfreq(h)[:, None]
        fx = jnp.fft.rfftfreq(w)[None, :]
        f = jnp.sqrt(fy * fy + fx * fx)
        f = jnp.where(f == 0, 1.0 / max(h, w), f)
        scale = f[None, :, :] ** exp[:, None, None]
        noise = jnp.fft.irfft2(spec2 * scale, s=(h, w))
        lo = noise.min(axis=(1, 2), keepdims=True)
        hi = noise.max(axis=(1, 2), keepdims=True)
        al = (noise - lo) / jnp.maximum(hi - lo, 1e-6)
        if a.get("sigmoid", True):
            th = _sample(kt, a.get("sigmoid_thresh", [0.4, 0.6]), b)
            al = jax.nn.sigmoid(10.0 * (al - th[:, None, None]))
        return al[..., None]
    if name == "blendalphasomecolors":
        # imgaug SomeColorsMaskGen: quantize the image's hue into nb_bins
        # bins (after a random hue rotation), draw one alpha per bin
        # (default a fair 0/1 coin), smooth the bin table circularly by
        # ``smoothness``, then look each pixel's alpha up from its bin.
        # Gaussian bin smoothing with sigma = smoothness·nb_bins/3 is a
        # documented approximation of imgaug's kernel (docs/schema.md).
        kr, kn, ka_, ks_ = jax.random.split(k, 4)
        nb, nbmax = _sample_int(kn, a.get("nb_bins", [5, 15]), b, 10)
        nbmax = min(max(nbmax, 1), 256)
        nbf = jnp.clip(nb, 1, nbmax).astype(jnp.float32)[:, None]  # (B,1)
        rot = _sample(kr, a.get("rotation_deg", [0, 360]), b) * 0.5
        hue, _, _ = ph._rgb_to_hsv(jnp.clip(base_img, 0.0, 255.0))
        hb = jnp.mod(hue + rot[:, None, None], 180.0)
        bins = jnp.minimum(jnp.floor(hb / 180.0 * nbf[..., None]),
                           nbf[..., None] - 1.0).astype(jnp.int32)
        spec = a.get("alpha")
        if spec is None:
            table = jax.random.bernoulli(ka_, 0.5,
                                         (b, nbmax)).astype(jnp.float32)
        else:
            table = _sample_shape(ka_, spec, (b, nbmax))
        smooth = _sample(ks_, a.get("smoothness", [0.1, 0.3]), b)
        ii = jnp.arange(nbmax, dtype=jnp.float32)
        d = jnp.abs(ii[None, :, None] - ii[None, None, :])          # (1,N,N)
        d = jnp.minimum(d, nbf[..., None] - d)                      # circular
        sig = jnp.maximum(smooth[:, None, None] * nbf[..., None] / 3.0,
                          1e-3)
        wgt = jnp.exp(-0.5 * jnp.square(d / sig))
        valid = ((ii[None, :, None] < nbf[..., None])
                 & (ii[None, None, :] < nbf[..., None]))
        wgt = jnp.where(valid, wgt, 0.0)
        wgt = wgt / jnp.maximum(wgt.sum(axis=2, keepdims=True), 1e-6)
        # HIGHEST: smoothed alphas feed the mask's >= 0.5 routing compare
        table = jnp.einsum("bij,bj->bi", wgt, table,
                           precision=jax.lax.Precision.HIGHEST)
        al = jnp.take_along_axis(table, bins.reshape(b, -1), axis=1)
        return al.reshape(b, h, w, 1)
    if name == "blendalphasegmapclassids":
        ids = a.get("class_ids")
        if ids is None:
            raise ValueError(
                "BlendAlphaSegMapClassIds needs {class_ids: int | [ints]}")
        ids = [int(i) for i in (ids if isinstance(ids, (list, tuple))
                                else [ids])]
        mc = masks.shape[-1]
        m = masks.astype(jnp.float32)
        sel = jnp.zeros((b, h, w, 1), jnp.float32)
        for i in ids:
            if i == 0:   # background: no channel set
                sel = jnp.maximum(sel, 1.0 - jnp.minimum(
                    m.sum(axis=-1, keepdims=True), 1.0))
            elif 1 <= i <= mc:
                sel = jnp.maximum(sel, m[..., i - 1:i])
            else:
                raise ValueError(
                    f"BlendAlphaSegMapClassIds: class id {i} out of range "
                    f"for a {mc}-channel mask (0 = background, 1..{mc} = "
                    "mask channels)")
        return sel
    raise KeyError(f"blend augmenter {name!r} has no lowering")


def _make_blend(s: Dict[str, Any], integer_input: bool = True) -> Callable:
    """BlendAlpha* lowering: ``alpha·foreground(x) + (1−alpha)·background(x)``
    for images; masks take whichever branch's alpha is ≥ 0.5 (imgaug's
    segmentation-map blend rule — per image for BlendAlpha, per pixel for
    the spatial mask generators)."""
    name = _BLEND_CANON.get(s["name"].lower(), s["name"].lower())
    raw = s.get("args")
    a = dict(raw) if isinstance(raw, dict) else {}
    fg_spec = a.get("foreground") or a.get("first")
    bg_spec = a.get("background") or a.get("second")
    fg = (build_augmentation(_coerce_block(fg_spec),
                             integer_input=integer_input)
          if fg_spec else None)
    bg = (build_augmentation(_coerce_block(bg_spec),
                             integer_input=integer_input)
          if bg_spec else None)
    if fg is None and bg is None:
        raise ValueError(
            f"{s['name']} needs a foreground (or background) child "
            "augmenter block")
    per_ch = bool(a.get("per_channel", False))

    def fn(k: Array, imgs: Array, masks: Array):
        b, h, w, c = imgs.shape
        kf, kb, ka = jax.random.split(k, 3)
        base_i = jnp.clip(imgs.astype(jnp.float32), 0.0, 255.0)
        fi, fm = fg(kf, imgs, masks) if fg else (base_i, masks)
        bi, bm = bg(kb, imgs, masks) if bg else (base_i, masks)
        al = _blend_alpha_map(name, a, ka, b, h, w, c, per_ch,
                              base_img=base_i, masks=masks)
        out_i = al * fi + (1.0 - al) * bi
        am = al.mean(axis=-1, keepdims=True) if al.shape[-1] != 1 else al
        out_m = jnp.where(am >= 0.5, fm, bm)
        return out_i, out_m

    return fn


def _make_meta(s: Dict[str, Any], integer_input: bool = True) -> Callable:
    """Sometimes / OneOf / SomeOf meta-augmenters (imgaug semantics):
    child pipelines are built recursively; per-image selection is a
    branch-free ``where`` between the child output and the input (children
    are applied IN ORDER to the running batch, like imgaug with
    random_order=False).  ``integer_input`` reflects this combinator's
    position in the parent pipeline and gates the children's uint8-exact
    gather packing (values after a photometric may leave 0..255)."""
    name = s["name"].lower()
    args = s.get("args")

    if name in _BLEND:
        return _make_blend(s, integer_input=integer_input)

    if name in ("withhueandsaturation", "withbrightnesschannels",
                "withcolorspace"):
        # imgaug colorspace-scoping combinators.  Children run on an
        # UNCLIPPED photometric chain (build_augmentation's final
        # 0..255 clip would break hue wrap-around: H−50 at H=20 must
        # reach −30 before the mod-180), then the wrapper re-encodes:
        # hue wraps mod 180, saturation/value clip to 0..255 — imgaug's
        # int16 intermediate semantics in float.  Deviations
        # (docs/schema.md): WithBrightnessChannels always scopes HSV-V
        # (imgaug samples a colorspace per image); WithColorspace lowers
        # to_colorspace: HSV only.
        a = args if isinstance(args, dict) else {}
        n_ch = {"withhueandsaturation": 2, "withbrightnesschannels": 1,
                "withcolorspace": 3}[name]
        if name == "withcolorspace":
            cs = str(a.get("to_colorspace", "")).upper()
            if cs != "HSV":
                raise ValueError(
                    "WithColorspace lowers only {to_colorspace: HSV} here "
                    f"(got {a.get('to_colorspace')!r}) — other colorspaces "
                    "are not implemented; see docs/schema.md")
        child_spec = _coerce_block(a.get("children") or a.get("then"))
        if not child_spec:
            raise ValueError(
                f"{s['name']} needs a {{children: {{...}}}} block")
        for e in child_spec:
            nm = e["name"].lower()
            if nm in _GEOMETRIC or nm in _META or nm in _JOINT_PHOTO:
                raise ValueError(
                    f"{s['name']} child {e['name']!r}: only photometric "
                    "children are supported (geometric ones would warp "
                    "the scoped channels away from the mask)")
            if n_ch != 3 and nm in _RGB_ONLY_PHOTO:
                raise ValueError(
                    f"{s['name']} child {e['name']!r} assumes an RGB "
                    f"image, but {s['name']} children see {n_ch} "
                    "channel(s)")

        def child(k: Array, imgs: Array, masks: Array):
            keys = jax.random.split(k, len(child_spec))
            for cs_, kk in zip(child_spec, keys):
                imgs, masks = _apply_photo(cs_, kk, imgs, masks)
            return imgs, masks

        if name == "withhueandsaturation":
            def fn(k: Array, imgs: Array, masks: Array):
                base = jnp.clip(imgs.astype(jnp.float32), 0.0, 255.0)
                h, s_, v = ph._rgb_to_hsv(base)
                out, _ = child(k, jnp.stack([h, s_], axis=-1), masks)
                return ph._hsv_to_rgb(jnp.mod(out[..., 0], 180.0),
                                      jnp.clip(out[..., 1], 0.0, 255.0),
                                      v), masks
        elif name == "withbrightnesschannels":
            def fn(k: Array, imgs: Array, masks: Array):
                base = jnp.clip(imgs.astype(jnp.float32), 0.0, 255.0)
                v = base.max(axis=-1, keepdims=True)
                out, _ = child(k, v, masks)
                out = jnp.clip(out, 0.0, 255.0)
                # scaling V scales all channels (H and S_hsv invariant);
                # achromatic black (V=0) brightens to gray
                return jnp.where(v > 0, base * (out / jnp.maximum(v, 1e-6)),
                                 jnp.broadcast_to(out, base.shape)), masks
        else:
            def fn(k: Array, imgs: Array, masks: Array):
                base = jnp.clip(imgs.astype(jnp.float32), 0.0, 255.0)
                h, s_, v = ph._rgb_to_hsv(base)
                out, _ = child(k, jnp.stack([h, s_, v], axis=-1), masks)
                return ph._hsv_to_rgb(jnp.mod(out[..., 0], 180.0),
                                      jnp.clip(out[..., 1], 0.0, 255.0),
                                      jnp.clip(out[..., 2], 0.0, 255.0)
                                      ), masks

        return fn

    if name == "withchannels":
        # imgaug WithChannels(channels, children): children see only the
        # selected channels.  Lowered as run-children-on-the-full-image
        # then splice the selected channels back — identical for
        # channelwise photometrics (the sane use).  Geometric /
        # displacement children are rejected (they would desynchronize
        # the spliced channels spatially AND the segmentation mask);
        # channel-MIXING photometrics (Grayscale, HSV ops, ChannelShuffle)
        # see all channels here where imgaug's would see the subset —
        # documented in schema.md.
        a = args if isinstance(args, dict) else {}
        chans = a.get("channels")
        if chans is None:
            raise ValueError("WithChannels needs {channels: [...], "
                             "children: {...}}")
        idx = [int(c) for c in (chans if isinstance(chans, (list, tuple))
                                else [chans])]
        child_spec = _coerce_block(a.get("children") or a.get("then"))
        for e in child_spec:
            nm = e["name"].lower()
            if nm in _GEOMETRIC or nm in _META or nm in _JOINT_PHOTO:
                raise ValueError(
                    f"WithChannels child {e['name']!r}: only photometric "
                    "children are supported (geometric ones would warp "
                    "the selected channels away from the mask)")
        child = build_augmentation(child_spec)

        def fn(k: Array, imgs: Array, masks: Array):
            out_i, _ = child(k, imgs, masks)
            base = jnp.clip(imgs.astype(jnp.float32), 0.0, 255.0)
            sel = np.zeros((imgs.shape[-1],), bool)
            sel[idx] = True
            return jnp.where(jnp.asarray(sel)[None, None, None, :], out_i,
                             base), masks

        return fn

    if name == "sometimes":
        a = args if isinstance(args, dict) else {}
        p = float(a.get("p", 0.5))
        then_spec = a.get("then") or a.get("then_list") or a.get("children")
        if not then_spec and not (a.get("else") or a.get("else_list")
                                  or a.get("otherwise")):
            raise ValueError(
                "Sometimes needs a {then: {...}} (and/or else:) child "
                "block — without one it would be a silent no-op")
        child = build_augmentation(_coerce_block(then_spec),
                                   integer_input=integer_input)
        else_spec = (a.get("else") or a.get("else_list")
                     or a.get("otherwise"))
        child_else = (build_augmentation(_coerce_block(else_spec),
                                         integer_input=integer_input)
                      if else_spec else None)

        def fn(k: Array, imgs: Array, masks: Array):
            k1, k2, k3 = jax.random.split(k, 3)
            out_i, out_m = child(k2, imgs, masks)
            if child_else is not None:
                imgs, masks = child_else(k3, imgs, masks)
            sel = jax.random.bernoulli(k1, p, (imgs.shape[0],))
            sel4 = sel[:, None, None, None]
            return (jnp.where(sel4, out_i, imgs),
                    jnp.where(sel4, out_m, masks))

        return fn

    if name == "oneof":
        entries = args if isinstance(args, list) else [args]
        children = [build_augmentation(_coerce_block(
            e if isinstance(e, list) else [e]),
            integer_input=integer_input) for e in entries]

        def fn(k: Array, imgs: Array, masks: Array):
            kc, *kks = jax.random.split(k, len(children) + 1)
            choice = jax.random.randint(kc, (imgs.shape[0],), 0,
                                        len(children))
            for c, (child, kk) in enumerate(zip(children, kks)):
                out_i, out_m = child(kk, imgs, masks)
                sel4 = (choice == c)[:, None, None, None]
                imgs = jnp.where(sel4, out_i, imgs)
                masks = jnp.where(sel4, out_m, masks)
            return imgs, masks

        return fn

    if name == "someof":
        if isinstance(args, dict):
            n_spec = args.get("n", 1)
            entries = args.get("children") or args.get("then") or []
        else:
            raise ValueError(
                "SomeOf expects {n: ..., children: [...]}, got "
                f"{args!r}")
        entries = entries if isinstance(entries, list) else [entries]
        children = [build_augmentation(_coerce_block(
            e if isinstance(e, list) else [e]),
            integer_input=integer_input) for e in entries]
        kc_n = len(children)
        if isinstance(n_spec, (list, tuple)):
            n_lo, n_hi = int(n_spec[0]), int(n_spec[1])
        else:
            n_lo = n_hi = int(n_spec)
        n_hi = min(n_hi, kc_n)

        def fn(k: Array, imgs: Array, masks: Array):
            b = imgs.shape[0]
            kn, ks, *kks = jax.random.split(k, len(children) + 2)
            ns = (jnp.full((b,), n_lo, jnp.int32) if n_lo == n_hi
                  else jax.random.randint(kn, (b,), n_lo, n_hi + 1))
            # exactly-n per-image subset: rank uniform scores, keep top-n
            scores = jax.random.uniform(ks, (b, kc_n))
            order = jnp.argsort(-scores, axis=1)
            ranks = jnp.argsort(order, axis=1)
            include = ranks < ns[:, None]
            for c, (child, kk) in enumerate(zip(children, kks)):
                out_i, out_m = child(kk, imgs, masks)
                sel4 = include[:, c][:, None, None, None]
                imgs = jnp.where(sel4, out_i, imgs)
                masks = jnp.where(sel4, out_m, masks)
            return imgs, masks

        return fn

    raise KeyError(f"meta augmenter {s['name']!r} has no lowering")


def build_transform_fn(transforms: List[Dict[str, Any]],
                       augmentation: List[Dict[str, Any]]):
    """→ (train_aug_fn, eval_transform_fn) for the stage runner.

    ``transforms`` run with a FIXED key (deterministic, every split,
    applied first); ``augmentation`` runs with the per-step key at train
    time only.  Either function is None when its spec list is empty.
    """
    t_fn = build_augmentation(transforms) if transforms else None
    a_fn = build_augmentation(augmentation) if augmentation else None

    def transform_fn(images, masks):
        return t_fn(jax.random.PRNGKey(0), images, masks)

    if t_fn is None:
        return a_fn, None
    if a_fn is None:
        def train_fn(rng, images, masks):
            return transform_fn(images, masks)

        return train_fn, transform_fn

    def train_fn(rng, images, masks):
        images, masks = transform_fn(images, masks)
        return a_fn(rng, images, masks)

    return train_fn, transform_fn


def _sample_maybe_per_channel(k: Array, spec: Any, b: int, c: int,
                              per_channel: bool, default: float) -> Array:
    """(B,) sample, or (B, C) when imgaug's per_channel=True is requested."""
    if not per_channel:
        return _sample(k, spec, b, default)
    return _sample(k, spec, b * c, default).reshape(b, c)


def _sample_elementwise(rng: Array, spec: Any, shape, per_channel: bool,
                        default) -> Array:
    """PER-PIXEL sample for imgaug's *Elementwise augmenters: (B,H,W,1)
    (all channels together, imgaug's per_channel=False default) or
    (B,H,W,C)."""
    b, h, w, c = shape
    out_shape = (b, h, w, c if per_channel else 1)
    if spec is None:
        spec = default
    if isinstance(spec, (int, float)):
        return jnp.full(out_shape, float(spec), jnp.float32)
    vals = [float(v) for v in spec]
    if len(vals) == 2:
        return jax.random.uniform(rng, out_shape, minval=vals[0],
                                  maxval=vals[1])
    arr = jnp.asarray(vals, jnp.float32)
    return arr[jax.random.randint(rng, out_shape, 0, len(vals))]


def _apply_photo(s: Dict[str, Any], k: Array, imgs: Array,
                 masks: Array) -> Tuple[Array, Array]:
    name = s["name"].lower()
    args = s.get("args")
    imgs = imgs.astype(jnp.float32)  # photometrics run in 0..255 float
    b, c = imgs.shape[0], imgs.shape[-1]
    per_ch = bool(isinstance(args, dict) and args.get("per_channel"))
    # bare `Name:` (YAML null) and `Name: {}` both mean the imgaug 0.4
    # default distribution (its "sensible defaults" release) — NOT the
    # identity, which would be the silent-no-op class the arg-schema work
    # exists to kill (r5 review finding; mirrors a bare iaa.Add() etc.)
    if name == "multiply":
        a = _bare(args, "mul").get("mul", [0.8, 1.2])
        imgs = ph.multiply(imgs, _sample_maybe_per_channel(k, a, b, c,
                                                           per_ch, 1.0))
    elif name == "add":
        a = _bare(args, "value").get("value", [-20, 20])
        imgs = ph.add(imgs, _sample_maybe_per_channel(k, a, b, c,
                                                      per_ch, 0.0))
    elif name == "addtohueandsaturation":
        a = _bare(args, "value")
        k1, k2 = jax.random.split(k)
        vh = _sample(k1, a.get("value_hue", a.get("value", [-30, 30])), b)
        vs = _sample(k2, a.get("value_saturation", a.get("value", [-30, 30])),
                     b)
        imgs = ph.add_to_hue_and_saturation(imgs, vh, vs)
    elif name == "multiplyhueandsaturation":
        a = _bare(args, "mul")
        k1, k2 = jax.random.split(k)
        mh = _sample(k1, a.get("mul_hue", a.get("mul", [0.8, 1.2])), b)
        ms = _sample(k2, a.get("mul_saturation", a.get("mul", [0.8, 1.2])), b)
        imgs = ph.multiply_hue_and_saturation(imgs, mh, ms)
    elif name == "addtohue":
        a = _bare(args, "value").get("value", [-255, 255])
        imgs = ph.add_to_hue_and_saturation(imgs, _sample(k, a, b),
                                            jnp.zeros((b,), jnp.float32))
    elif name == "addtosaturation":
        a = _bare(args, "value").get("value", [-75, 75])
        imgs = ph.add_to_hue_and_saturation(imgs,
                                            jnp.zeros((b,), jnp.float32),
                                            _sample(k, a, b))
    elif name == "multiplyhue":
        a = _bare(args, "mul").get("mul", [-3.0, 3.0])
        imgs = ph.multiply_hue_and_saturation(imgs, _sample(k, a, b),
                                              jnp.ones((b,), jnp.float32))
    elif name == "multiplysaturation":
        a = _bare(args, "mul").get("mul", [0.0, 3.0])
        imgs = ph.multiply_hue_and_saturation(imgs,
                                              jnp.ones((b,), jnp.float32),
                                              _sample(k, a, b))
    elif name == "removesaturation":
        # imgaug RemoveSaturation(mul) == MultiplySaturation(1 - mul)
        a = args if not isinstance(args, dict) else args.get("mul", 1.0)
        imgs = ph.multiply_hue_and_saturation(
            imgs, jnp.ones((b,), jnp.float32), 1.0 - _sample(k, a, b, 1.0))
    elif name in ("linearcontrast", "contrastnormalization"):
        a = _bare(args, "alpha").get("alpha", [0.6, 1.4])
        imgs = ph.linear_contrast(imgs, _sample(k, a, b, 1.0))
    elif name == "gammacontrast":
        a = _bare(args, "gamma").get("gamma", [0.7, 1.7])
        imgs = ph.gamma_contrast(
            imgs, _sample_maybe_per_channel(k, a, b, c, per_ch, 1.0))
    elif name == "sigmoidcontrast":
        a = _bare(args, "gain")
        k1, k2 = jax.random.split(k)
        gain = _sample(k1, a.get("gain", 10.0), b, 10.0)
        cutoff = _sample(k2, a.get("cutoff", 0.5), b, 0.5)
        imgs = ph.sigmoid_contrast(imgs, gain, cutoff)
    elif name == "logcontrast":
        a = _bare(args, "gain").get("gain", [0.4, 1.6])
        imgs = ph.log_contrast(
            imgs, _sample_maybe_per_channel(k, a, b, c, per_ch, 1.0))
    elif name == "additivegaussiannoise":
        a = _bare(args, "scale").get("scale", [0, 15])
        k1, k2 = jax.random.split(k)
        imgs = ph.gaussian_noise(k2, imgs, _sample(k1, a, b, 0.0))
    elif name == "averageblur":
        a = _bare(args, "k").get("k", [1, 7])
        try:
            k_max = (float(a) if isinstance(a, (int, float))
                     else max(float(v) for v in a))
        except (TypeError, ValueError):
            k_max = 7.0
        radius = int(min(max(1, math.ceil((k_max - 1) / 2)), 64))
        imgs = ph.average_blur(imgs, _sample(k, a, b, 3.0), radius=radius)
    elif name == "additivepoissonnoise":
        a = _bare(args, "lam").get("lam", [0, 15])
        k1, k2 = jax.random.split(k)
        imgs = ph.additive_poisson_noise(k2, imgs, _sample(k1, a, b, 1.0))
    elif name == "gaussianblur":
        a = _bare(args, "sigma").get("sigma", [0.0, 3.0])
        # static kernel support from the YAML sigma range (imgaug sizes its
        # kernel ~2.5*sigma); a fixed radius silently under-blurs large sigmas
        try:
            sig_max = (float(a) if isinstance(a, (int, float))
                       else max(float(v) for v in a))
        except (TypeError, ValueError):
            sig_max = 3.0
        radius = int(min(max(3, math.ceil(2.5 * sig_max)), 64))
        imgs = ph.gaussian_blur(imgs, _sample(k, a, b, 0.0), radius=radius)
    elif name == "coarsedropout":
        a = args or {}
        if isinstance(a, (int, float, list, tuple)):
            p_spec, size = a, 0.1
        else:
            p_spec = a.get("p", 0.05)
            size = float(a.get("size_percent", 0.1))
        k1, k2 = jax.random.split(k)
        imgs = ph.coarse_dropout(k2, imgs, _sample(k1, p_spec, b),
                                 size_frac=size)
    elif name == "cutout":
        # imgaug Cutout(nb_iterations, size, cval): nb_iterations squares,
        # each `size` fraction of the image side, filled with cval (128).
        # Lowered onto a static size-cell grid with per-cell Bernoulli
        # probability nb/(cells) — expected cutout COUNT matches imgaug
        # but is Binomial, and positions snap to the grid (documented
        # deviation; fill_mode='gaussian' / squared=false are rejected at
        # parse time, see ops/aug/arg_schema.py).
        a = args or {}
        if isinstance(a, (int, float, list, tuple)):
            a = {"nb_iterations": a}
        size = float(a.get("size", 0.2))
        size = min(max(size, 1e-3), 1.0)
        gh = max(1, int(round(1.0 / size)))
        k1, k2, k3 = jax.random.split(k, 3)
        nb = _sample(k1, a.get("nb_iterations", 1), b, 1.0)
        p_cell = jnp.clip(nb / float(gh * gh), 0.0, 1.0)
        drop = (jax.random.uniform(k2, (b, gh, gh, 1))
                < p_cell[:, None, None, None])
        bsz, hh, ww = imgs.shape[0], imgs.shape[1], imgs.shape[2]
        mask = jax.image.resize(drop.astype(jnp.float32),
                                (bsz, hh, ww, 1), "nearest")
        cv = _sample(k3, a.get("cval", 128), b, 128.0)[:, None, None, None]
        imgs = imgs * (1.0 - mask) + cv * mask
    elif name == "grayscale":
        a = args if not isinstance(args, dict) else args.get("alpha", 1.0)
        imgs = ph.grayscale(imgs, _sample(k, a, b, 1.0))
    elif name == "invert":
        # imgaug Invert(p=1): bare/omitted p inverts every image
        a = _bare(args, "p").get("p", 1.0)
        k1, k2 = jax.random.split(k)
        imgs = ph.invert(k2, imgs, _sample(k1, a, b, 1.0))
    elif name == "solarize":
        # imgaug Solarize(p=1, threshold=128): the bare-scalar form is the
        # application PROBABILITY (not the threshold — that was a round-4
        # divergence); dict form takes both
        a = _bare(args, "p")
        k1, k2, k3 = jax.random.split(k, 3)
        th = _sample(k2, a.get("threshold", 128), b, 128.0)
        sol = ph.solarize(imgs, th)
        p = float(a.get("p", 1.0)) if not isinstance(a.get("p"), (list, tuple)) \
            else None
        if p is None:
            apply = (jax.random.uniform(k3, (b,))
                     < _sample(k1, a.get("p"), b, 1.0))
        elif p >= 1.0:
            apply = None
        else:
            apply = jax.random.bernoulli(k1, p, (b,))
        imgs = sol if apply is None else \
            jnp.where(apply[:, None, None, None], sol, imgs)
    elif name == "sharpen":
        a = args or {}
        k1, k2 = jax.random.split(k)
        alpha = _sample(k1, a.get("alpha", [0.0, 1.0])
                        if isinstance(a, dict) else a, b)
        light = _sample(k2, a.get("lightness", [0.75, 1.5])
                        if isinstance(a, dict) else [0.75, 1.5], b)
        imgs = ph.sharpen(imgs, alpha, light)
    elif name == "emboss":
        a = args or {}
        k1, k2 = jax.random.split(k)
        alpha = _sample(k1, a.get("alpha", [0.0, 1.0])
                        if isinstance(a, dict) else a, b)
        strength = _sample(k2, a.get("strength", [0.5, 1.5])
                           if isinstance(a, dict) else [0.5, 1.5], b)
        imgs = ph.emboss(imgs, alpha, strength)
    elif name in ("dropout2d", "channeldropout"):
        a = args or {}
        if isinstance(a, (int, float, list, tuple)):
            p_spec, nb_keep = a, 1
        else:
            p_spec = a.get("p", 0.1)
            nb_keep = int(a.get("nb_keep_channels", 1))
        k1, k2 = jax.random.split(k)
        imgs = ph.dropout2d(k2, imgs, _sample(k1, p_spec, b, 0.1),
                            nb_keep=nb_keep)
    elif name == "totaldropout":
        a = args if not isinstance(args, dict) else args.get("p", 1.0)
        k1, k2 = jax.random.split(k)
        imgs = ph.total_dropout(k2, imgs, _sample(k1, a, b, 1.0))
    elif name in ("noop", "identity"):
        pass
    elif name == "dropout":
        a = args if not isinstance(args, dict) else args.get("p", 0.05)
        k1, k2 = jax.random.split(k)
        imgs = ph.pixel_dropout(k2, imgs, _sample(k1, a, b, 0.05))
    elif name in ("saltandpepper", "saltpepper"):
        a = args if not isinstance(args, dict) else args.get("p", 0.05)
        k1, k2 = jax.random.split(k)
        imgs = ph.salt_and_pepper(k2, imgs, _sample(k1, a, b, 0.05))
    elif name in ("salt", "pepper"):
        a = args if not isinstance(args, dict) else args.get("p", 0.05)
        k1, k2 = jax.random.split(k)
        fn = ph.salt if name == "salt" else ph.pepper
        imgs = fn(k2, imgs, _sample(k1, a, b, 0.05))
    elif name == "replaceelementwise":
        # imgaug ReplaceElementwise(mask, replacement): `mask` is the
        # per-pixel Bernoulli probability (sampled per image from the
        # spec), `replacement` the value drawn per replaced pixel.
        # Salt/Pepper/SaltAndPepper are its fixed-value special cases.
        a = _bare(args, "mask")
        k1, k2, k3 = jax.random.split(k, 3)
        p = _sample(k1, a.get("mask", 0.05), b)
        shape = imgs.shape if per_ch else imgs.shape[:3] + (1,)
        sel = jax.random.uniform(k2, shape) < p[:, None, None, None]
        rep = _sample_shape(k3, a.get("replacement", [0.0, 255.0]), shape)
        imgs = jnp.where(sel, rep, imgs)
    elif name == "impulsenoise":
        a = args if not isinstance(args, dict) else args.get("p", 0.05)
        k1, k2 = jax.random.split(k)
        imgs = ph.impulse_noise(k2, imgs, _sample(k1, a, b, 0.05))
    elif name in ("coarsesaltandpepper", "coarsesalt", "coarsepepper"):
        a = args or {}
        if isinstance(a, (int, float, list, tuple)):
            p_spec, size = a, 0.1
        else:
            p_spec = a.get("p", 0.05)
            size = float(a.get("size_percent", 0.1))
        mode = {"coarsesalt": "salt", "coarsepepper": "pepper"}.get(
            name, "both")
        k1, k2 = jax.random.split(k)
        imgs = ph.coarse_salt_and_pepper(k2, imgs, _sample(k1, p_spec, b),
                                         size_frac=size, mode=mode)
    elif name == "additivelaplacenoise":
        a = _bare(args, "scale").get("scale", [0, 15])
        k1, k2 = jax.random.split(k)
        imgs = ph.laplace_noise(k2, imgs, _sample(k1, a, b, 0.0))
    elif name == "edgedetect":
        a = _bare(args, "alpha").get("alpha", [0.0, 0.75])
        imgs = ph.edge_detect(imgs, _sample(k, a, b))
    elif name == "directededgedetect":
        a = _bare(args, "alpha")
        k1, k2 = jax.random.split(k)
        imgs = ph.directed_edge_detect(
            imgs, _sample(k1, a.get("alpha", [0.0, 0.75]), b),
            _sample(k2, a.get("direction", [0.0, 1.0]), b))
    elif name == "changecolorspace":
        a = _bare(args, "to_colorspace")
        cs = a.get("to_colorspace")
        if not isinstance(cs, str) or cs.upper() not in (
                "RGB", "BGR", "GRAY", "HSV", "HLS", "YCRCB"):
            raise ValueError(
                "ChangeColorspace to_colorspace must be one static name of "
                f"RGB/BGR/GRAY/HSV/HLS/YCrCb here (got {cs!r}); imgaug's "
                "per-image colorspace lists and Lab/Luv/CIE are not "
                "lowered — see docs/schema.md")
        imgs = ph.change_colorspace(imgs, cs,
                                    _sample(k, a.get("alpha", 1.0), b, 1.0))
    elif name == "canny":
        a = _bare(args, "alpha")
        sk = a.get("sobel_kernel_size", 3)
        if isinstance(sk, bool) or sk not in (3, 5, 7):
            raise ValueError(
                "Canny sobel_kernel_size must be a static 3, 5 or 7 here "
                f"(conv kernels are compile-time shapes; imgaug's sampled "
                f"sizes can't lower), got {sk!r} — see docs/schema.md")
        it = a.get("hysteresis_iters", 16)
        if isinstance(it, bool) or not isinstance(it, int) or it < 1:
            raise ValueError(
                f"Canny hysteresis_iters must be a static integer >= 1 "
                f"(bounded edge propagation rounds), got {it!r}")
        ht = a.get("hysteresis_thresholds")
        if ht is None:
            lo_spec, hi_spec = [60, 140], [160, 240]
        elif (isinstance(ht, (list, tuple)) and len(ht) == 2
              and all(isinstance(e, (list, tuple)) for e in ht)):
            lo_spec, hi_spec = ht[0], ht[1]
        else:
            lo_spec = hi_spec = ht   # one spec, both draws (sorted inside)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        imgs = ph.canny(k4, imgs, _sample(k1, a.get("alpha", [0.0, 1.0]), b),
                        _sample(k2, lo_spec, b), _sample(k3, hi_spec, b),
                        sobel_k=int(sk), hysteresis_iters=it)
    elif name == "cartoon":
        a = args if isinstance(args, dict) else {}
        bk = a.get("blur_ksize", 3)
        if isinstance(bk, bool) or not isinstance(bk, int) or bk < 1:
            raise ValueError(
                "Cartoon blur_ksize must be a static integer >= 1 here "
                "(median windows are compile-time shapes; imgaug samples "
                f"it per image), got {bk!r} — see docs/schema.md")
        k1, k2, k3 = jax.random.split(k, 3)
        imgs = ph.cartoon(
            imgs, bk,
            _sample(k1, a.get("segmentation_size", [0.8, 1.2]), b, 1.0),
            _sample(k2, a.get("saturation", [1.5, 2.5]), b, 2.0),
            _sample(k3, a.get("edge_prevalence", [0.9, 1.1]), b, 1.0))
    elif name == "meanshiftblur":
        a = _bare(args, "spatial_radius")
        srspec = a.get("spatial_radius", [5.0, 40.0])
        # static tap window like BilateralBlur: cap the radius at 5
        # (121 taps x 5 rounds); cv2's 40 px windows are offline-speed
        try:
            sr_max = (float(srspec) if isinstance(srspec, (int, float))
                      else max(float(v) for v in srspec))
        except (TypeError, ValueError):
            sr_max = 5.0
        max_r = int(min(max(1, int(sr_max)), 5))
        k1, k2 = jax.random.split(k)
        imgs = ph.mean_shift_blur(
            imgs, jnp.minimum(_sample(k1, srspec, b, 5.0), float(max_r)),
            _sample(k2, a.get("color_radius", [5.0, 40.0]), b, 10.0),
            max_radius=max_r)
    elif name in ("averagepooling", "maxpooling", "minpooling"):
        a = args if not isinstance(args, dict) else args.get("k", 2)
        ok = (isinstance(a, (int, float)) and not isinstance(a, bool)
              and float(a) == int(a) and int(a) >= 1)
        if not ok:
            raise ValueError(
                f"{name} k must be a static integer >= 1 here (pooling "
                "windows are compile-time shapes); got "
                f"{a!r} — see docs/schema.md deviations")
        mode = {"averagepooling": "avg", "maxpooling": "max",
                "minpooling": "min"}[name]
        imgs = ph.keep_size_pooling(imgs, int(a), mode)
    elif name == "motionblur":
        a = _bare(args, "k")
        k1, k2 = jax.random.split(k)
        kspec = a.get("k", 5)
        try:
            k_max = (float(kspec) if isinstance(kspec, (int, float))
                     else max(float(v) for v in kspec))
        except (TypeError, ValueError):
            k_max = 7.0
        radius = int(min(max(1, math.ceil((k_max - 1) / 2)), 64))
        imgs = ph.motion_blur(imgs, _sample(k1, kspec, b, 5.0),
                              _sample(k2, a.get("angle", [0, 360]), b),
                              radius=radius)
    elif name == "medianpooling":
        a = args if not isinstance(args, dict) else args.get("k", 2)
        ok = (isinstance(a, (int, float)) and not isinstance(a, bool)
              and float(a) == int(a) and int(a) >= 1)
        if not ok:
            raise ValueError(
                f"MedianPooling k must be a static integer >= 1 here "
                "(pooling windows are compile-time shapes); got "
                f"{a!r} — see docs/schema.md deviations")
        imgs = ph.median_pooling(imgs, int(a))
    elif name == "bilateralblur":
        a = _bare(args, "d")
        dspec = a.get("d", 3)
        try:
            d_max = (float(dspec) if isinstance(dspec, (int, float))
                     else max(float(v) for v in dspec))
        except (TypeError, ValueError):
            d_max = 9.0
        # static tap window from the spec's max d; cap the radius at 5
        # (121 taps) — cv2 itself warns d > 9 is offline-speed
        max_r = int(min(max(0, int(d_max) // 2), 5))
        k1, k2, k3 = jax.random.split(k, 3)
        imgs = ph.bilateral_blur(
            imgs, _sample(k1, dspec, b, 3.0),
            _sample(k2, a.get("sigma_color", [10, 250]), b, 75.0),
            _sample(k3, a.get("sigma_space", [10, 250]), b, 75.0),
            max_radius=max_r)
    elif name == "fastsnowylandscape":
        a = args if isinstance(args, dict) else {}
        k1, k2 = jax.random.split(k)
        imgs = ph.fast_snowy_landscape(
            imgs,
            _sample(k1, a.get("lightness_threshold", [100, 255]), b, 140.0),
            _sample(k2, a.get("lightness_multiplier", [1.0, 4.0]), b, 2.5))
    elif name == "medianblur":
        a = args if not isinstance(args, dict) else args.get("k", 3)
        if a is None:
            a = 3  # bare `MedianBlur: ~` → cv2's default window
        ok = (isinstance(a, (int, float)) and not isinstance(a, bool)
              and math.isfinite(float(a)) and float(a) == int(a)
              and int(a) >= 1 and int(a) % 2 == 1)
        if not ok:
            raise ValueError(
                "MedianBlur k must be a static ODD integer >= 1 here "
                "(even windows are off-center; per-image sampled widths "
                "would need data-dependent sort extents); "
                f"got {a!r} — see docs/schema.md deviations")
        imgs = ph.median_blur(imgs, ksize=int(a))
    elif name in ("histogramequalization",
                  "allchannelshistogramequalization"):
        imgs = ph.histogram_equalization(imgs)
    elif name in ("clahe", "allchannelsclahe"):
        a = _bare(args, "clip_limit")
        # imgaug's kwarg is tile_grid_size_px; accept both spellings
        grid = int(a.get("tile_grid_size", a.get("tile_grid_size_px", 8)))
        imgs = ph.clahe(imgs, _sample(k, a.get("clip_limit", [1, 10]),
                                      b, 40.0), tile_grid=grid)
    elif name == "jpegcompression":
        a = _bare(args, "compression")
        comp = _sample(k, a.get("compression", [0, 100]), b, 50.0)
        # imgaug maps compression c → codec quality 100 − c
        imgs = ph.jpeg_compression(imgs, 100.0 - comp)
    elif name == "posterize":
        a = args if not isinstance(args, dict) else args.get("nb_bits",
                                                             [1, 8])
        imgs = ph.posterize(imgs, _sample(k, a, b, 4.0))
    elif name == "channelshuffle":
        a = args if not isinstance(args, dict) else args.get("p", 1.0)
        k1, k2 = jax.random.split(k)
        imgs = ph.channel_shuffle(k2, imgs, _sample(k1, a, b, 1.0))
    elif name == "addelementwise":
        a = args if not isinstance(args, dict) else args.get("value")
        imgs = imgs + _sample_elementwise(k, a, imgs.shape, per_ch,
                                          [-20, 20])
    elif name == "multiplyelementwise":
        a = args if not isinstance(args, dict) else args.get("mul")
        imgs = imgs * _sample_elementwise(k, a, imgs.shape, per_ch,
                                          [0.8, 1.2])
    elif name in ("autocontrast", "auto_contrast"):
        a = args if not isinstance(args, dict) else args.get("cutoff", 0)
        imgs = ph.autocontrast(imgs, float(a or 0))
    elif name == "clouds":
        a = _bare(args, "coverage")
        k1, k2 = jax.random.split(k)
        imgs = ph.clouds(k2, imgs,
                         _sample(k1, a.get("coverage", [0.2, 0.5]), b))
    elif name == "fog":
        a = _bare(args, "density")
        k1, k2 = jax.random.split(k)
        imgs = ph.fog(k2, imgs,
                      _sample(k1, a.get("density", [0.1, 0.4]), b))
    elif name == "snowflakes":
        a = args if isinstance(args, dict) else {}
        k1, k2, k3 = jax.random.split(k, 3)
        imgs = ph.snowflakes(
            k3, imgs, _sample(k1, a.get("density", [0.005, 0.05]), b),
            _sample(k2, a.get("speed", [0.007, 0.03]), b))
    elif name == "rain":
        a = args if isinstance(args, dict) else {}
        k1, k2, k3 = jax.random.split(k, 3)
        imgs = ph.rain(
            k3, imgs, _sample(k1, a.get("density", [0.01, 0.06]), b),
            _sample(k2, a.get("speed", [0.04, 0.1]), b))
    elif name == "changecolortemperature":
        a = args if not isinstance(args, dict) else args.get("kelvin")
        imgs = ph.change_color_temperature(
            imgs, _sample(k, a if a is not None else [1000, 11000], b,
                          6600.0))
    elif name == "uniformcolorquantization":
        a = args if not isinstance(args, dict) else args.get("n_colors")
        imgs = ph.uniform_color_quantization(
            imgs, _sample(k, a if a is not None else [2, 16], b, 8.0))
    elif name == "superpixels":
        a = _bare(args, "p_replace")
        ms = _static_max_size(a.get("max_size", 128), s["name"])
        k1, k2, k3 = jax.random.split(k, 3)
        nseg, nmax = _sample_int(k1, a.get("n_segments", 100), b, 100)
        imgs = sg.superpixels(
            k3, imgs, nseg, max(1, nmax),
            _sample(k2, a.get("p_replace", [0.5, 1.0]), b, 1.0), ms)
    elif name == "uniformvoronoi":
        a = _bare(args, "n_points")
        ms = _static_max_size(a.get("max_size", 128), s["name"])
        k1, k2, k3 = jax.random.split(k, 3)
        npts, nmax = _sample_int(k1, a.get("n_points", [50, 500]), b, 100)
        imgs = sg.uniform_voronoi(
            k3, imgs, npts, max(1, nmax),
            _sample(k2, a.get("p_replace", [0.5, 1.0]), b, 1.0), ms)
    elif name in ("regulargridvoronoi", "relativeregulargridvoronoi"):
        a = args if isinstance(args, dict) else \
            {"n_rows": args, "n_cols": args}
        ms = _static_max_size(a.get("max_size", 128), s["name"])
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        if name == "regulargridvoronoi":
            rows, rmax = _sample_int(k1, a.get("n_rows", [10, 30]), b, 20)
            cols, cmax = _sample_int(k2, a.get("n_cols", [10, 30]), b, 20)
        else:
            # fractions of the DOWNSCALED dims (static), so the seed
            # capacity stays compile-time bounded — docs/schema.md
            _, hs_, ws_ = sg._downscale(imgs, ms)
            rf = a.get("n_rows_frac", [0.05, 0.15])
            cf = a.get("n_cols_frac", [0.05, 0.15])
            rows = jnp.maximum(jnp.round(
                _sample(k1, rf, b, 0.1) * hs_), 1.0).astype(jnp.int32)
            cols = jnp.maximum(jnp.round(
                _sample(k2, cf, b, 0.1) * ws_), 1.0).astype(jnp.int32)
            rmax = max(1, int(math.ceil(_static_bounds(rf, 0.1)[1] * hs_)))
            cmax = max(1, int(math.ceil(_static_bounds(cf, 0.1)[1] * ws_)))
        imgs = sg.regular_grid_voronoi(
            k5, imgs, rows, cols, max(1, rmax), max(1, cmax),
            _sample(k3, a.get("p_drop_points", 0.4), b, 0.4),
            _sample(k4, a.get("p_replace", [0.5, 1.0]), b, 1.0), ms)
    elif name == "kmeanscolorquantization":
        a = _bare(args, "n_colors")
        ms = _static_max_size(a.get("max_size", 128), s["name"])
        k1, k2 = jax.random.split(k)
        ncol, cmax = _sample_int(k1, a.get("n_colors", [2, 16]), b, 8)
        imgs = sg.kmeans_color_quantization(k2, imgs, ncol,
                                            max(2, cmax), ms)
    elif name == "jigsaw":
        a = args if isinstance(args, dict) else {}
        rows, cols = a.get("nb_rows", 5), a.get("nb_cols", 5)
        for label, v in (("nb_rows", rows), ("nb_cols", cols)):
            if isinstance(v, bool) or not isinstance(v, int) or v < 1:
                raise ValueError(
                    f"Jigsaw {label} must be a static integer >= 1 here "
                    "(the cell grid sets compile-time reshape shapes under "
                    f"XLA; imgaug's sampled grids can't lower), got {v!r} "
                    "— see docs/schema.md deviations")
        k1, k2 = jax.random.split(k)
        steps, smax = _sample_int(k1, a.get("max_steps", [1, 5]), b, 2)
        if smax > 64:
            raise ValueError(
                f"Jigsaw max_steps caps at 64 here (the swap chain unrolls "
                f"statically), got max {smax}")
        imgs, masks = jg.jigsaw(k2, imgs, masks, rows, cols, steps,
                                max(1, smax))
    elif name in ("resize", "scale"):
        a = args if not isinstance(args, dict) else \
            args.get("size", args.get("percent", 1.0))
        if not isinstance(a, (int, float)) or isinstance(a, bool):
            raise ValueError(
                "Resize/Scale takes a static scalar here (XLA shapes are "
                "static; stochastic sizes can't lower) — use Affine "
                "{scale: ...} for zoom jitter; see docs/schema.md")
        bsz, h, w, c = imgs.shape
        if isinstance(a, int):
            # imgaug int semantics: ABSOLUTE pixels.  The static output
            # shape can't change, so this lowers to resize-to-(a,a)
            # then back (resolution change only); a float is a factor
            if a < 1:
                raise ValueError(
                    f"Resize/Scale int means absolute pixels; got {a}")
            f = None
            nh = nw = int(a)
        else:
            f = float(a)
            if f <= 0.0:
                raise ValueError(f"Resize/Scale factor must be > 0, got {f}")
            nh, nw = max(1, int(round(h * f))), max(1, int(round(w * f)))
        if f != 1.0:
            # down (or up) then back to the static shape: content keeps
            # its position; f<1 is the classic resolution-degradation aug
            imgs = jax.image.resize(imgs, (bsz, nh, nw, c), "bilinear")
            imgs = jax.image.resize(imgs, (bsz, h, w, c), "bilinear")
            mshape = masks.shape
            m = jax.image.resize(masks.astype(jnp.float32),
                                 (mshape[0], nh, nw, mshape[3]), "nearest")
            masks = jax.image.resize(m, mshape, "nearest").astype(masks.dtype)
    else:
        raise KeyError(f"augmenter {s['name']!r} has no lowering")
    return imgs, masks
