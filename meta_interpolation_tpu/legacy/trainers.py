"""Functional Reptile and first-order-MAML steps (legacy trainer parity).

Reference: ``/root/reference/legacy/train_sepconv.py:104-180`` (same shape
in train_voxelflow.py:160-206, train_superslomo.py:280-340,
train_dain.py:200-280). Inner rule mirrors the fresh per-batch
``torch.optim.Adamax/Adam`` the scripts construct each iteration.

The drive-able CLI wrappers live in legacy/driver.py +
legacy/train_{sepconv,voxelflow,superslomo,dain}.py.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..meta.inner_optimizers import InnerOptimizer

PyTree = Any


def _apply_pair(apply_fn, params, f0, f1):
    """Run the model; normalize (pred) vs (pred, aux) returns."""
    out = apply_fn(params, f0, f1)
    if isinstance(out, tuple):
        pred, aux = out
        aux = dict(aux)
        aux["I0"], aux["I1"] = f0, f1
        return pred, aux
    return out, None


def _call_loss(loss_fn, pred, target, aux):
    """loss_fn(pred, target) or loss_fn(pred, target, aux) — models with
    auxiliary outputs (SuperSloMo) use the 3-arg form."""
    if aux is None:
        return loss_fn(pred, target)
    return loss_fn(pred, target, aux)


def _adapt(apply_fn: Callable, loss_fn: Callable, params: PyTree,
           frames: jnp.ndarray, inner_lr: float, num_steps: int,
           support_idxs=((0, 2, 4), (2, 4, 6)), inner_rule: str = "Adamax",
           mask: Optional[PyTree] = None) -> PyTree:
    """k inner steps on the support pairs (:117-128). ``mask``: 0/1 pytree
    like params — leaves with 0 are frozen (DAIN adapts rectifyNet only,
    train_dain.py:210)."""
    opt = InnerOptimizer(rule=inner_rule, lr_mode="fixed",
                         num_steps=num_steps)
    lrs = opt.init_lrs(params, inner_lr)
    state = opt.init_state(params)

    def support_loss(p):
        total = 0.0
        for (i0, it, i1) in support_idxs:
            pred, aux = _apply_pair(apply_fn, p, frames[:, i0], frames[:, i1])
            total = total + _call_loss(loss_fn, pred, frames[:, it], aux)
        return total

    def body(carry, step):
        p, s = carry
        grads = jax.lax.stop_gradient(jax.grad(support_loss)(p))
        if mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        p, s = opt.update(p, grads, lrs, s, step)
        return (p, s), None

    (params, _), _ = jax.lax.scan(body, (params, state),
                                  jnp.arange(num_steps))
    return params


def reptile_step(apply_fn: Callable, loss_fn: Callable, params: PyTree,
                 frames: jnp.ndarray, inner_lr: float, outer_lr: float,
                 num_steps: int = 1, inner_rule: str = "Adamax",
                 mask: Optional[PyTree] = None) -> Tuple[PyTree, jnp.ndarray]:
    """θ ← θ + ε (θ' − θ) (:130-136). frames: (B, 7, H, W, C).

    Returns (new_params, query_loss_after_update) — the reference evaluates
    the query under no_grad after the interpolation (:138-143).
    """
    adapted = _adapt(apply_fn, loss_fn, params, frames, inner_lr, num_steps,
                     inner_rule=inner_rule, mask=mask)
    new_params = jax.tree.map(lambda w, wa: w + (wa - w) * outer_lr,
                              params, adapted)
    pred, aux = _apply_pair(apply_fn, new_params, frames[:, 2], frames[:, 4])
    q_loss = jax.lax.stop_gradient(
        _call_loss(loss_fn, pred, frames[:, 3], aux))
    return new_params, q_loss


def fomaml_step(apply_fn: Callable, loss_fn: Callable, params: PyTree,
                opt_state, tx, frames: jnp.ndarray, inner_lr: float,
                num_steps: int = 1, inner_rule: str = "Adamax",
                mask: Optional[PyTree] = None):
    """First-order MAML (:145-180): query gradient at the adapted weights,
    applied to the base weights by the outer optimizer ``tx`` (optax).
    ``mask`` freezes leaves in BOTH loops (the DAIN scripts build both
    optimizers over rectifyNet.parameters() only)."""
    import optax

    adapted = _adapt(apply_fn, loss_fn, params, frames, inner_lr, num_steps,
                     inner_rule=inner_rule, mask=mask)

    def query_loss(p):
        pred, aux = _apply_pair(apply_fn, p, frames[:, 2], frames[:, 4])
        return _call_loss(loss_fn, pred, frames[:, 3], aux)

    loss, grads = jax.value_and_grad(query_loss)(adapted)
    if mask is not None:
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
    updates, opt_state = tx.update(grads, opt_state, params)
    if mask is not None:
        updates = jax.tree.map(lambda u, m: u * m, updates, mask)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def eval_episode(apply_fn: Callable, loss_fn: Callable, params: PyTree,
                 frames: jnp.ndarray, inner_lr: float, num_steps: int,
                 inner_rule: str = "Adamax",
                 mask: Optional[PyTree] = None):
    """Legacy validate() body (:218-263): adapt a throwaway copy on the
    support pairs, evaluate the query under no-grad, discard the weights.
    Returns (query_loss, pred)."""
    adapted = _adapt(apply_fn, loss_fn, params, frames, inner_lr, num_steps,
                     inner_rule=inner_rule, mask=mask)
    pred, aux = _apply_pair(apply_fn, adapted, frames[:, 2], frames[:, 4])
    pred = jax.lax.stop_gradient(pred)
    loss = jax.lax.stop_gradient(_call_loss(loss_fn, pred, frames[:, 3], aux))
    return loss, pred
