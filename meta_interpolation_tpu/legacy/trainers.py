"""Functional Reptile and first-order-MAML steps (legacy trainer parity).

Reference: ``/root/reference/legacy/train_sepconv.py:104-180`` (same shape
in train_voxelflow.py:160-206 etc.). Inner rule is Adamax (fresh state per
task, matching the fresh ``torch.optim.Adamax`` per batch).
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from ..meta.inner_optimizers import InnerOptimizer

PyTree = Any


def _adapt(apply_fn: Callable, loss_fn: Callable, params: PyTree,
           frames: jnp.ndarray, inner_lr: float, num_steps: int,
           support_idxs=((0, 2, 4), (2, 4, 6))) -> PyTree:
    """k inner Adamax steps on the support pairs (:117-128)."""
    opt = InnerOptimizer(rule="Adamax", lr_mode="fixed", num_steps=num_steps)
    lrs = opt.init_lrs(params, inner_lr)
    state = opt.init_state(params)

    def support_loss(p):
        total = 0.0
        for (i0, it, i1) in support_idxs:
            pred = apply_fn(p, frames[:, i0], frames[:, i1])
            total = total + loss_fn(pred, frames[:, it])
        return total

    def body(carry, step):
        p, s = carry
        grads = jax.lax.stop_gradient(jax.grad(support_loss)(p))
        p, s = opt.update(p, grads, lrs, s, step)
        return (p, s), None

    (params, _), _ = jax.lax.scan(body, (params, state),
                                  jnp.arange(num_steps))
    return params


def reptile_step(apply_fn: Callable, loss_fn: Callable, params: PyTree,
                 frames: jnp.ndarray, inner_lr: float, outer_lr: float,
                 num_steps: int = 1) -> Tuple[PyTree, jnp.ndarray]:
    """θ ← θ + ε (θ' − θ) (:130-136). frames: (B, 7, H, W, C).

    Returns (new_params, query_loss_after_update) — the reference evaluates
    the query under no_grad after the interpolation (:138-143).
    """
    adapted = _adapt(apply_fn, loss_fn, params, frames, inner_lr, num_steps)
    new_params = jax.tree.map(lambda w, wa: w + (wa - w) * outer_lr,
                              params, adapted)
    pred = apply_fn(new_params, frames[:, 2], frames[:, 4])
    q_loss = jax.lax.stop_gradient(loss_fn(pred, frames[:, 3]))
    return new_params, q_loss


def fomaml_step(apply_fn: Callable, loss_fn: Callable, params: PyTree,
                opt_state, tx, frames: jnp.ndarray, inner_lr: float,
                num_steps: int = 1):
    """First-order MAML (:145-180): query gradient at the adapted weights,
    applied to the base weights by the outer optimizer ``tx`` (optax)."""
    import optax

    adapted = _adapt(apply_fn, loss_fn, params, frames, inner_lr, num_steps)

    def query_loss(p):
        pred = apply_fn(p, frames[:, 2], frames[:, 4])
        return loss_fn(pred, frames[:, 3])

    loss, grads = jax.value_and_grad(query_loss)(adapted)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
