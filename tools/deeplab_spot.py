"""Compiled-on-TPU spot check + throughput for DeepLabV3+/xception_aligned.

The aligned Xception-65 + bonlime decoder is a new 70-conv graph (round 3);
its oracle tests run on CPU — this confirms the bf16 train step compiles
and runs on the chip and records img/s for PERF.md.
Usage: python tools/deeplab_spot.py [B] [H]
"""

import sys

import numpy as np

from _util import enable_compile_cache, timeit

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def main():
    from segmentation_training_pipeline_tpu.models.factory import (
        create_model, init_model)
    from segmentation_training_pipeline_tpu.ops.losses import (
        binary_crossentropy)

    model = create_model("DeepLabV3", "xception_aligned", classes=1)
    variables = init_model(model, (H, W, 3))
    loss_fn = lambda logits, y: binary_crossentropy(y, logits)  # noqa: E731
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    r = np.random.RandomState(0)
    x = jax.device_put(r.rand(B, H, W, 3).astype(np.float32) * 255.0)
    y = jax.device_put((r.rand(B, H, W, 1) > 0.5).astype(np.float32))

    def step(params, stats, opt_state, x, y):
        def lf(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return loss_fn(logits, y).mean(), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, \
            opt_state, loss

    jstep = jax.jit(step)  # no donation: timeit reuses the input buffers
    p, s = variables["params"], variables["batch_stats"]
    ms = timeit(f"deeplab-xception_aligned train B{B} {H}²",
                jstep, p, s, opt_state, x, y, n=3)
    print(f"-> {B / (ms / 1000):.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
