"""Train-step throughput across the decoder zoo on the real chip.

Breadth companion to bench.py's Unet-resnet34 headline: one full bf16
train step (fwd+bwd+adam, BN mutation) per architecture.  Results feed
PERF.md.  Usage: python tools/arch_bench.py [B] [H] [backbone] [archs…]
[--donate] (e.g. ``arch_bench.py 32 512 xception_aligned DeepLabV3``
reproduces the aligned-DeepLab spot check — tools/deeplab_spot.py is that
shortcut).  ``--donate`` donates params/stats/opt_state like bench.py's
headline step — halves state residency so the biggest graphs (senet154)
fit the zoo-standard B16 512² (VERDICT r4 item 4).
"""

import sys
import time

import numpy as np

from _util import enable_compile_cache, timeit

enable_compile_cache()

import jax  # noqa: E402
import optax  # noqa: E402

ARCHS = ["Unet", "FPN", "Linknet", "PSPNet", "DeepLabV3"]


def _timeit_donated(name: str, jstep, params, stats, opt_state, x, y,
                    n: int = 3, width: int = 45) -> float:
    """Donated variant: thread the returned state back in (the donated
    input buffers are dead after each call), value-fetch to close the
    chain (block_until_ready lies on axon)."""
    params, stats, opt_state, loss = jstep(params, stats, opt_state, x, y)
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    for _ in range(n):
        params, stats, opt_state, loss = jstep(params, stats, opt_state,
                                               x, y)
    float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:{width}s} {dt:8.2f} ms", flush=True)
    return dt


def bench_archs(archs, backbone: str, batch: int, size: int,
                donate: bool = False):
    from segmentation_training_pipeline_tpu.models.factory import (
        create_model, init_model)
    from segmentation_training_pipeline_tpu.ops.losses import (
        binary_crossentropy)

    r = np.random.RandomState(0)
    x = jax.device_put(r.rand(batch, size, size, 3).astype(np.float32)
                       * 255.0)
    y = jax.device_put((r.rand(batch, size, size, 1) > 0.5)
                       .astype(np.float32))
    tx = optax.adam(1e-3)

    for arch in archs:
        model = create_model(arch, backbone, classes=1)
        variables = init_model(model, (size, size, 3))
        opt_state = tx.init(variables["params"])

        def step(params, stats, opt_state, x, y, model=model):
            def lf(p):
                logits, upd = model.apply(
                    {"params": p, "batch_stats": stats}, x, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
                return binary_crossentropy(y, logits), upd["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, \
                opt_state, loss

        # default NOT donated: timeit re-feeds the same buffers, so
        # residency is ~2x bench.py's donated step — size batches
        # accordingly, or pass --donate for bench.py-matching residency
        label = f"{arch}-{backbone} train B{batch} {size}²"
        try:
            if donate:
                jstep = jax.jit(step, donate_argnums=(0, 1, 2))
                ms = _timeit_donated(label + " (donated)", jstep,
                                     variables["params"],
                                     variables["batch_stats"],
                                     opt_state, x, y, n=3)
            else:
                jstep = jax.jit(step)
                ms = timeit(label, jstep,
                            variables["params"], variables["batch_stats"],
                            opt_state, x, y, n=3)
            print(f"  -> {batch / (ms / 1000):.1f} img/s/chip", flush=True)
        except Exception as e:  # keep going (e.g. HBM OOM at this B)
            print(f"{arch}-{backbone}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)


def main():
    donate = "--donate" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if len(argv) > 0 else 32
    size = int(argv[1]) if len(argv) > 1 else 512
    backbone = argv[2] if len(argv) > 2 else "resnet34"
    archs = argv[3:] or ARCHS
    bench_archs(archs, backbone, batch, size, donate=donate)


if __name__ == "__main__":
    main()
