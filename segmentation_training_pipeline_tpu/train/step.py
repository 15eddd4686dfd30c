"""Jitted train/eval steps.

One XLA program per (stage-config): on-device augmentation + preprocessing
+ forward + loss + backward + optimizer update, with the train state
donated (params update in place in HBM).  Data parallelism is GSPMD: the
batch arrives sharded ``P('data', 'space')``, the state replicated; XLA
inserts the gradient/BatchNorm ``psum``s over ICI.  Learning rate is a
runtime scalar argument so host-side schedule callbacks never retrace.

The reference's equivalent is Keras ``model.compile`` + ``fit_generator``'s
per-batch train function (SURVEY.md §3.2); there is no param-server or
NCCL analog to port — the mesh story is new (SURVEY §2d).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.factory import apply_activation
from ..ops.preprocess import preprocess


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _per_example(fn):
    """Lift a batch-mean fn(y, p, act) to per-example values (B,)."""

    def wrapped(y, p, activation):
        return jax.vmap(lambda yt, pt: fn(yt[None], pt[None], activation))(y, p)

    return wrapped


def build_train_step(model, tx, loss_fn, metric_fns: Dict[str, Callable],
                     activation: str, preprocessing: Optional[str],
                     aug_fn: Optional[Callable] = None,
                     donate: bool = True,
                     debug_checks: bool = False):
    """→ train_step(state, batch, lr, rng) -> (state, logs).

    ``debug_checks`` (YAML ``debug: true``) instruments the whole program
    with ``checkify`` float + index checks (SURVEY §5 sanitizers): the
    first NaN/Inf or out-of-bounds index raises host-side with the
    offending primitive's location.  Costs a device sync per step — debug
    only.
    """

    # per-example loss so the final wrap-padded batch's duplicate rows get
    # weight 0 (no double gradient, no biased logs).  Every bundled loss is
    # a per-image mean already, so this is semantics-preserving for full
    # batches (weight ≡ 1 → identical value and gradient).
    per_loss = jax.vmap(lambda yt, lg: loss_fn(yt[None], lg[None]))

    def _step(state: TrainState, batch, lr, rng):
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        images, masks = batch["image"], batch["mask"]
        w = batch.get("weight")
        if w is None:
            w = jnp.ones((images.shape[0],), jnp.float32)
        wsum = jnp.maximum(w.sum(), 1.0)
        if aug_fn is not None:
            images, masks = aug_fn(aug_rng, images, masks)
        x = preprocess(images, preprocessing or "tf", model.dtype)
        masks = masks.astype(jnp.float32)

        def lf(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            loss = (per_loss(masks, logits) * w).sum() / wsum
            return loss, (upd["batch_stats"], logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            lf, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        lr_ = jnp.asarray(lr, jnp.float32)
        updates = jax.tree.map(lambda u: (-lr_ * u).astype(u.dtype), updates)
        params = optax.apply_updates(state.params, updates)

        logs = {"loss": loss}
        if metric_fns:
            probs = apply_activation(logits, activation)
            for name, fn in metric_fns.items():
                per = _per_example(fn)(masks, probs, activation)
                logs[name] = (per * w).sum() / wsum
        logs["_wsum"] = w.sum()  # real-example count for epoch averaging
        new_state = TrainState(
            params=params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, logs

    if debug_checks:
        from jax.experimental import checkify

        checked = jax.jit(checkify.checkify(
            _step, errors=checkify.float_checks | checkify.index_checks))

        def step_with_checks(state, batch, lr, rng):
            err, out = checked(state, batch, lr, rng)
            checkify.check_error(err)  # raises with the failing primitive
            return out

        return step_with_checks

    return jax.jit(_step, donate_argnums=(0,) if donate else ())


def build_eval_step(model, loss_fn, metric_fns: Dict[str, Callable],
                    activation: str, preprocessing: Optional[str],
                    transform_fn: Optional[Callable] = None):
    """→ eval_step(state, batch) -> per-example logs dict + 'weight'.

    Per-example values let the host compute padding-corrected epoch means
    (the final wrap-padded batch contributes weight 0 for padded rows).
    ``transform_fn`` is the deterministic ``transforms:`` preprocessing —
    validation must see the same processing as training.
    """

    per_loss = jax.vmap(lambda yt, lg: loss_fn(yt[None], lg[None]))

    def _step(state: TrainState, batch):
        images, masks = batch["image"], batch["mask"]
        if transform_fn is not None:
            images, masks = transform_fn(images, masks)
        x = preprocess(images, preprocessing or "tf", model.dtype)
        masks = masks.astype(jnp.float32)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        logs = {"loss": per_loss(masks, logits), "weight": batch["weight"]}
        probs = apply_activation(logits, activation)
        for name, fn in metric_fns.items():
            logs[name] = _per_example(fn)(masks, probs, activation)
        return logs

    return jax.jit(_step)


def build_predict_step(model, activation: str, preprocessing: Optional[str]):
    """→ predict_step(variables, images_u8) -> probabilities (f32)."""

    def _step(variables, images):
        x = preprocess(images, preprocessing or "tf", model.dtype)
        logits = model.apply(variables, x, train=False)
        return apply_activation(logits, activation)

    return jax.jit(_step)
