"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

SURVEY §4: "distributed without a cluster" — all sharding tests run against
``--xla_force_host_platform_device_count=8`` on CPU; the real-TPU path is
exercised by bench.py / the driver.

Note: this environment's sitecustomize registers an `axon` TPU PJRT plugin
and sets ``jax_platforms="axon,cpu"`` in jax's config directly, so the
``JAX_PLATFORMS`` env var alone does NOT select CPU — we must override the
config after importing jax (before any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def toy_ds():
    """16 items, 64x64 RGB, circle masks; items 3, 7, 11, 15 are negatives."""
    from segmentation_training_pipeline_tpu.data.datasets import LambdaDataSet

    r = np.random.RandomState(42)
    xs, ys = [], []
    for i in range(16):
        x = r.randint(0, 255, size=(64, 64, 3), dtype=np.uint8)
        y = np.zeros((64, 64), dtype=np.uint8)
        if i % 4 != 3:
            cy, cx = r.randint(16, 48, size=2)
            yy, xx = np.mgrid[0:64, 0:64]
            y[(yy - cy) ** 2 + (xx - cx) ** 2 < 100] = 1
        xs.append(x)
        ys.append(y)
    return LambdaDataSet(xs, ys)
