"""Optimizer construction semantics (weight decay / momentum config keys)."""

import jax.numpy as jnp

from segmentation_training_pipeline_tpu.config import parse_dict
from segmentation_training_pipeline_tpu.train.optimizers import build_optimizer


def _one_update(cfg, grads, params):
    tx = build_optimizer(cfg)
    state = tx.init(params)
    upd, _ = tx.update(grads, state, params)
    return upd


def test_adamw_default_decay_vs_explicit_zero():
    params = {"w": jnp.ones((4,))}
    zero_grads = {"w": jnp.zeros((4,))}
    # unset weight_decay + AdamW -> conventional 1e-4 decay shows up even
    # with zero gradients
    upd = _one_update(parse_dict({"optimizer": "AdamW"}), zero_grads, params)
    assert float(jnp.abs(upd["w"]).max()) > 0
    # explicit 0.0 must disable the decay entirely (round-1 truthiness bug)
    upd0 = _one_update(
        parse_dict({"optimizer": "AdamW", "weight_decay": 0.0}),
        zero_grads, params)
    assert float(jnp.abs(upd0["w"]).max()) == 0.0


def test_sgd_momentum_key():
    params = {"w": jnp.zeros((3,))}
    g = {"w": jnp.ones((3,))}
    # Keras default: momentum 0 -> update == grad on every step
    tx = build_optimizer(parse_dict({"optimizer": "SGD"}))
    st = tx.init(params)
    u1, st = tx.update(g, st, params)
    u2, st = tx.update(g, st, params)
    assert float(u2["w"][0]) == 1.0
    # momentum: 0.9 accumulates: second update = 1 + 0.9
    tx = build_optimizer(parse_dict({"optimizer": "SGD", "momentum": 0.9}))
    st = tx.init(params)
    u1, st = tx.update(g, st, params)
    u2, st = tx.update(g, st, params)
    assert abs(float(u2["w"][0]) - 1.9) < 1e-6


def test_every_registered_optimizer_builds_and_steps():
    """Registry ↔ _algo lockstep: every YAML-reachable optimizer name must
    build and produce a finite update (catches names registered without a
    builder, e.g. the round-3 Adamax addition)."""
    import jax.numpy as jnp
    import numpy as np
    from segmentation_training_pipeline_tpu.config import (OPTIMIZERS,
                                                           parse_dict)

    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.5)}
    for name in sorted(OPTIMIZERS._entries):
        tx = build_optimizer(parse_dict({"optimizer": name}))
        state = tx.init(params)
        upd, _ = tx.update(grads, state, params)
        assert np.all(np.isfinite(np.asarray(upd["w"]))), name
