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

import math
import os

import numpy as np

from . import fast_warp as FW
from . import pallas_elastic as PE
from . import photometric as ph
from . import warp as W


def _use_pallas_elastic() -> bool:
    """Bounded-displacement Pallas elastic on real TPUs; exact footprint
    gather elsewhere.  Override with STP_PALLAS_ELASTIC=0/1."""
    return FW.use_pallas("STP_PALLAS_ELASTIC")

Array = jax.Array

_GEOMETRIC = {"fliplr", "horizontalflip", "flipud", "verticalflip", "rot90",
              "affine", "crop", "croptofixedsize", "randomcrop",
              "elastictransformation", "elastictransform", "elastic"}


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


def build_augmentation(specs: List[Dict[str, Any]]) -> Callable:
    """specs: [{"name": ..., "args": ...}] (config-normalized) →
    ``aug_fn(rng, images_u8, masks) -> (images_f32_0..255, masks)``."""
    geo = [s for s in specs if s["name"].lower() in _GEOMETRIC]
    photo = [s for s in specs if s["name"].lower() not in _GEOMETRIC]

    # fast path: flips/rot90 only → no warp gather at all (rot90 on
    # non-square images still needs the resizing warp, so square-only)
    def _cheap_ok(shape_square: bool) -> bool:
        if not geo:
            return True
        names = {s["name"].lower() for s in geo}
        if not names <= _CHEAP_GEO:
            return False
        return shape_square or "rot90" not in names

    def _multipass_ok(shape_square: bool) -> bool:
        """The 3-pass warp extracts rot90s only on square frames; on
        non-square frames its shear/scale factorization degenerates as
        the rotation approaches 90 deg.  Decide from the STATIC spec:
        square is always fine; non-square is fine iff there is no rot90
        and the affine rotation range stays well below 90 deg."""
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
    geo_nonelastic = [s for s in geo
                      if s["name"].lower() not in _ELASTIC_NAMES]

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
                    pct = a.get("percent", a if not isinstance(a, dict)
                                 else [0, 0.1])
                    vals = pct if isinstance(pct, (list, tuple)) else [pct]
                    pmax = max(float(v) for v in vals)
                    mag *= 1.0 / max(1.0 - 2.0 * pmax, 0.1)
                elif name in ("croptofixedsize", "randomcrop"):
                    # zoom factor known only relative to the input shape;
                    # bounded inside aug_fn where h/w are known — use a
                    # generous static cap here
                    mag *= 4.0
            except (TypeError, ValueError):
                mag *= 4.0  # unparseable spec: be conservative
        return mag

    _mag_bound = _static_magnification()

    def aug_fn(rng: Array, images: Array, masks: Array):
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        keys = list(jax.random.split(rng, len(specs) + 2))

        if _cheap_ok(h == w):
            imgs = images.astype(jnp.float32)
            if geo:
                imgs, masks = _apply_cheap_geo(geo, keys[-1], imgs, masks)
            for j, s in enumerate(photo):
                imgs, masks = _apply_photo(s, keys[len(geo) + j], imgs, masks)
            return jnp.clip(imgs, 0.0, 255.0), masks

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
                a = args or {}
                pct = a.get("percent", a if not isinstance(a, dict) else [0, 0.1])
                k1, k2, k3, k4 = jax.random.split(k, 4)
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
            elif name in ("croptofixedsize", "randomcrop"):
                a = args or {}
                ch = float(a.get("height", h)) / h
                cw = float(a.get("width", w)) / w
                k1, k2 = jax.random.split(k)
                offx = jax.random.uniform(k1, (b,)) * (1.0 - cw)
                offy = jax.random.uniform(k2, (b,)) * (1.0 - ch)
                m = W.identity_mats(b)
                m = m.at[:, 0, 0].set(cw)
                m = m.at[:, 1, 1].set(ch)
                m = m.at[:, 0, 2].set(offx * w)
                m = m.at[:, 1, 2].set(offy * h)
                mats = W.compose(m, mats)
            elif name in ("elastictransformation", "elastictransform", "elastic"):
                a = args or {}
                k1, k2, k3 = jax.random.split(k, 3)
                alpha = _sample(k1, a.get("alpha", 20.0), b)
                sigma = _sample(k2, a.get("sigma", 5.0), b)
                # static (host) reductions of the YAML ranges — these run
                # under jit tracing, so plain Python only (no jnp)
                def _bounds(spec, default):
                    if spec is None:
                        spec = default
                    if isinstance(spec, (int, float)):
                        return float(spec), float(spec)
                    vals = [float(v) for v in np.asarray(spec).ravel()]
                    return min(vals), max(vals)

                _, a_max = _bounds(a.get("alpha"), 20.0)
                sig_min, sig_max = _bounds(a.get("sigma"), 5.0)
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

        imgs = images.astype(jnp.float32)
        if geo:
            # K bound for the Pallas elastic kernel: static 6-sigma field
            # bound scaled by the forward affine's static magnification
            # (D' = A₂ₓ₂⁻¹·D grows with zoom-in) + a safety margin
            kbound = int(math.ceil(disp_bound * _mag_bound * 1.15)) + 2
            if disp is None and _multipass_ok(h == w):
                # pure affine: gather-free multi-pass warp (rolls + MXU
                # matmuls) — ~10x cheaper than the HBM footprint gather
                imgs, masks = FW.warp_joint_multipass(imgs, masks, mats)
            elif (disp is not None and _multipass_ok(h == w)
                  and kbound <= 64 and _use_pallas_elastic()):
                # affine via multipass, then the bounded elastic via the
                # Pallas range-select kernel: the residual displacement
                # after the affine pass is D' = A₂ₓ₂⁻¹ · D.  (Round-2
                # lead: fold image+mask into ONE kernel sweep with a
                # per-channel kinds vector like pallas_shear.)
                if geo_nonelastic:
                    imgs, masks = FW.warp_joint_multipass(imgs, masks, mats)
                    a00, a01 = mats[:, 0, 0], mats[:, 0, 1]
                    a10, a11 = mats[:, 1, 0], mats[:, 1, 1]
                    det = a00 * a11 - a01 * a10
                    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
                    dxf, dyf = disp
                    dxp = (a11[:, None, None] * dxf
                           - a01[:, None, None] * dyf) / det[:, None, None]
                    dyp = (-a10[:, None, None] * dxf
                           + a00[:, None, None] * dyf) / det[:, None, None]
                else:
                    # elastic-only: the affine is the identity — skip the
                    # multipass no-op and use the raw field
                    dxp, dyp = disp
                dxp = jnp.clip(dxp, -kbound, kbound)
                dyp = jnp.clip(dyp, -kbound, kbound)
                imgs, masks = PE.warp_elastic_joint(imgs, masks, dyp, dxp,
                                                    kbound)
            else:
                # exact footprint gather: large/unbounded displacement,
                # non-square frames with >=90-deg rotations, or CPU; u8
                # taps are lossless (pre-photometric integer channels)
                imgs, masks = W.warp_joint(imgs, masks, mats, disp,
                                           gather_u8=True)

        for j, s in enumerate(photo):
            imgs, masks = _apply_photo(s, keys[len(geo) + j], imgs, masks)

        imgs = jnp.clip(imgs, 0.0, 255.0)
        return imgs, masks

    return aug_fn


def _apply_photo(s: Dict[str, Any], k: Array, imgs: Array,
                 masks: Array) -> Tuple[Array, Array]:
    name = s["name"].lower()
    args = s.get("args")
    b = imgs.shape[0]
    if name == "multiply":
        a = args if not isinstance(args, dict) else args.get("mul", 1.0)
        imgs = ph.multiply(imgs, _sample(k, a, b, 1.0))
    elif name == "add":
        a = args if not isinstance(args, dict) else args.get("value", 0.0)
        imgs = ph.add(imgs, _sample(k, a, b, 0.0))
    elif name in ("linearcontrast", "contrastnormalization"):
        a = args if not isinstance(args, dict) else args.get("alpha", 1.0)
        imgs = ph.linear_contrast(imgs, _sample(k, a, b, 1.0))
    elif name == "additivegaussiannoise":
        a = args if not isinstance(args, dict) else args.get("scale", 0.0)
        k1, k2 = jax.random.split(k)
        imgs = ph.gaussian_noise(k2, imgs, _sample(k1, a, b, 0.0))
    elif name == "gaussianblur":
        a = args if not isinstance(args, dict) else args.get("sigma", 0.0)
        # static kernel support from the YAML sigma range (imgaug sizes its
        # kernel ~2.5*sigma); a fixed radius silently under-blurs large sigmas
        try:
            sig_max = (float(a) if isinstance(a, (int, float))
                       else max(float(v) for v in a))
        except (TypeError, ValueError):
            sig_max = 3.0
        radius = int(min(max(3, math.ceil(2.5 * sig_max)), 64))
        imgs = ph.gaussian_blur(imgs, _sample(k, a, b, 0.0), radius=radius)
    elif name in ("coarsedropout", "cutout"):
        a = args or {}
        if isinstance(a, (int, float, list, tuple)):
            p_spec, size = a, 0.1
        else:
            p_spec = a.get("p", 0.05)
            size = float(a.get("size_percent", 0.1))
        k1, k2 = jax.random.split(k)
        imgs = ph.coarse_dropout(k2, imgs, _sample(k1, p_spec, b),
                                 size_frac=size)
    elif name == "grayscale":
        a = args if not isinstance(args, dict) else args.get("alpha", 1.0)
        imgs = ph.grayscale(imgs, _sample(k, a, b, 1.0))
    elif name == "invert":
        a = args if not isinstance(args, dict) else args.get("p", 0.5)
        k1, k2 = jax.random.split(k)
        imgs = ph.invert(k2, imgs, _sample(k1, a, b, 0.5))
    elif name == "solarize":
        a = args if not isinstance(args, dict) else args.get("threshold", 128)
        imgs = ph.solarize(imgs, _sample(k, a, b, 128.0))
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
    elif name == "dropout":
        a = args if not isinstance(args, dict) else args.get("p", 0.05)
        k1, k2 = jax.random.split(k)
        imgs = ph.pixel_dropout(k2, imgs, _sample(k1, a, b, 0.05))
    elif name in ("saltandpepper", "saltpepper"):
        a = args if not isinstance(args, dict) else args.get("p", 0.05)
        k1, k2 = jax.random.split(k)
        imgs = ph.salt_and_pepper(k2, imgs, _sample(k1, a, b, 0.05))
    else:
        raise KeyError(f"augmenter {s['name']!r} has no lowering")
    return imgs, masks
