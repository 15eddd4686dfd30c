"""Pallas fused shear kernel vs the XLA roll+select oracle (interpret
mode on the CPU test mesh; the compiled path runs on real TPUs via
fast_warp's backend dispatch and bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from segmentation_training_pipeline_tpu.ops.aug.fast_warp import _shear_pass
from segmentation_training_pipeline_tpu.ops.aug.pallas_shear import (
    shear_pass_tpu,
)


def _run_both(offs_range, src_shift, norig, seed=0):
    rng = np.random.RandomState(seed)
    B, H, W, C, K = 2, 16, 64, 3, 2
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    msk = jnp.asarray((rng.rand(B, H, W, K) > 0.5).astype(np.float32))
    offs = jnp.asarray(
        rng.uniform(*offs_range, (B, H)).astype(np.float32))
    oi, om = _shear_pass(img, msk, offs, axis=2, fill=0.0,
                         src_shift=src_shift, orig_n=norig)
    joint = jnp.concatenate([img, msk], -1).transpose(0, 3, 1, 2)
    kinds = jnp.asarray([0] * C + [1] * K, jnp.int32)
    out = shear_pass_tpu(joint, offs, kinds, norig=norig,
                         src_shift=src_shift, fill=0.0,
                         interpret=True).transpose(0, 2, 3, 1)
    return oi, om, out[..., :C], out[..., C:]


@pytest.mark.parametrize("offs_range,shift,norig", [
    ((-20, 20), 5, 50),
    ((-5, 5), 0, 64),
    ((-60, 60), 16, 32),   # mostly OOB: fill correctness
    ((0, 0), 0, 64),       # identity
])
def test_matches_xla_oracle(offs_range, shift, norig):
    oi, om, pi, pm = _run_both(offs_range, shift, norig)
    assert float(jnp.abs(oi - pi).max()) < 1e-6
    assert float(jnp.abs(om - pm).max()) == 0.0


def test_integer_offsets_exact():
    rng = np.random.RandomState(1)
    B, H, W = 1, 8, 32
    img = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    msk = img
    offs = jnp.asarray(rng.randint(-8, 8, (B, H)).astype(np.float32))
    o_img, _ = _shear_pass(img, msk, offs, axis=2, fill=0.0)
    joint = img.transpose(0, 3, 1, 2)
    out = shear_pass_tpu(joint, offs, jnp.zeros((1,), jnp.int32),
                         norig=W, src_shift=0, fill=0.0,
                         interpret=True).transpose(0, 2, 3, 1)
    assert float(jnp.abs(o_img - out).max()) < 1e-6
