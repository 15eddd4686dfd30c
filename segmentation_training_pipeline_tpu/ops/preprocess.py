"""On-device input preprocessing (uint8 → network dtype).

The reference applies backbone-specific Keras ``preprocess_input`` on the
host inside the generator (SURVEY.md §3.5).  Here it is a fused on-device
op — uint8 batches cross the host↔HBM wire, the scale/mean-std math rides
the same XLA program as the model, costing ~nothing after fusion.

Modes (Keras-compatible names):
  * ``tf``     : x/127.5 - 1          (default; most segmentation_models backbones)
  * ``scale``  : x/255
  * ``torch``  : x/255 then ImageNet mean/std
  * ``caffe``  : RGB→BGR, subtract ImageNet BGR means (no scaling)
"""

from __future__ import annotations

import jax.numpy as jnp

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)
_CAFFE_BGR_MEAN = (103.939, 116.779, 123.68)


def preprocess(x, mode: str = "tf", dtype=jnp.bfloat16):
    x = x.astype(jnp.float32)
    if mode in ("tf", None, "default"):
        y = x / 127.5 - 1.0
    elif mode == "scale":
        y = x / 255.0
    elif mode == "torch":
        y = x / 255.0
        mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(_IMAGENET_STD, jnp.float32)
        if y.shape[-1] == mean.shape[0]:
            y = (y - mean) / std
        else:
            y = (y - 0.449) / 0.226  # grayscale fallback
    elif mode == "caffe":
        y = x[..., ::-1] if x.shape[-1] == 3 else x
        mean = jnp.asarray(_CAFFE_BGR_MEAN[: y.shape[-1]], jnp.float32)
        y = y - mean
    else:
        raise KeyError(f"unknown preprocessing mode {mode!r}")
    return y.astype(dtype)
