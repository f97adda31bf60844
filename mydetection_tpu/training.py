"""Training machinery: SGD + burn-in warmup, jitted train step, resume.

Reference parity: `train.py` in duanzhiihao/myDetection [recalled;
SURVEY.md §2.12] — SGD(momentum, weight decay) with a burn-in LR
warmup, iteration-based loop, multi-scale input resizing, periodic
checkpoint. The loop itself lives in the repo-root `train.py` script;
this module holds the pure/jittable pieces so the multi-chip dry-run
and tests reuse them.

TPU-native notes:
  * one jitted train step per input-size bucket (multi-scale training
    = cycling through static buckets, SURVEY.md §5.7);
  * data parallelism comes from sharding the batch axis of the inputs
    over a 1-D mesh — XLA inserts the gradient `psum`s; the step
    function itself is sharding-agnostic;
  * BatchNorm running stats ride along as param-tree updates merged
    after the gradient step (models/layers.tree_merge).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from mydetection_tpu.models.layers import tree_merge
from mydetection_tpu.registry import Model

Params = Any


# ---------------------------------------------------------------------------
# SGD with momentum + weight decay (darknet-style)
# ---------------------------------------------------------------------------

def sgd_init(params: Params) -> Params:
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd_update(params: Params, grads: Params, velocity: Params, *,
               lr, momentum: float = 0.9, weight_decay: float = 5e-4):
    """v <- m*v + g + wd*p ; p <- p - lr*v. Returns (params, velocity)."""

    def upd(p, g, v):
        v_new = momentum * v + g + weight_decay * p
        return p - lr * v_new, v_new

    flat = jax.tree_util.tree_map(upd, params, grads, velocity)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat,
                                        is_leaf=lambda t: isinstance(t, tuple))
    new_vel = jax.tree_util.tree_map(lambda t: t[1], flat,
                                     is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_vel


def burn_in_lr(step, *, base_lr: float, burn_in: int = 1000,
               milestones: tuple[int, ...] = (), gamma: float = 0.1):
    """Darknet burn-in: lr * (step/burn_in)^4 during warmup, then
    step-decay by `gamma` at each milestone [recalled idiom].

    Pure host Python on purpose: `step` is a host int in the training
    loop, and the jnp formulation dispatched ~4 tiny device ops PER
    ITERATION outside the compiled step — on the remote-TPU transport
    (~30 ms/dispatch) that cost more than the step itself at small
    batch. Returns a float the jitted step takes as a scalar arg."""
    step_f = float(step)
    warm = base_lr * min(step_f / burn_in, 1.0) ** 4
    decay = 1.0
    for m in milestones:
        if step_f >= m:
            decay *= gamma
    return warm * decay


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------

def make_train_step(model: Model, *, input_size: int,
                    momentum: float = 0.9, weight_decay: float = 5e-4,
                    donate: bool | None = None):
    """Build the jitted train step for one input-size bucket.

    step(params, velocity, images_u8, gt_boxes, gt_classes, gt_valid, lr)
      -> (params, velocity, metrics dict)

    Sharding-agnostic: shard the batch axis of (images, gt_*) over a
    mesh and XLA turns the implicit gradient reduction into psum over
    ICI; no code change for 1 vs N chips.

    `donate`: donate the params+velocity input buffers to XLA so the
    SGD update writes in place instead of allocating a second copy of
    the model+optimizer state per step (the caller rebinds both from
    the return value, so the old buffers are dead anyway). Default
    (None) = on for TPU, off elsewhere — XLA:CPU ignores donation with
    a warning, and CPU tests/dryruns reuse the pre-step params.
    """
    if donate is None:
        donate = jax.default_backend() == "tpu"

    def loss_fn(params, images, gt_boxes, gt_classes, gt_valid):
        terms = model.loss(params, images, gt_boxes, gt_classes, gt_valid,
                           input_size=input_size)
        bn_updates = terms.pop("bn_updates", None)
        return terms["total"], (terms, bn_updates)

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, velocity, images, gt_boxes, gt_classes, gt_valid, lr):
        (_, (terms, bn_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, images, gt_boxes, gt_classes, gt_valid)
        new_params, new_velocity = sgd_update(
            params, grads, velocity, lr=lr, momentum=momentum,
            weight_decay=weight_decay)
        new_params = tree_merge(new_params, bn_updates)
        metrics = {k: v for k, v in terms.items()}
        return new_params, new_velocity, metrics

    return step
