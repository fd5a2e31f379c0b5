"""Differentiable functional inner-loop optimizers.

Reference: ``/root/reference/inner_loop_optimizers.py`` — LSLR
(per-layer, per-step learnable LRs; :57-147) and Meta-SGD (per-parameter
learnable LR tensors; :248-301), each with SGD / Adam / Adamax update rules
(:115-244, :303-426). Constants match the reference exactly: β1=0.9, β2=0.99,
eps=1e-8, zero weight decay; Adamax adds eps to |g| *before* the max.

Everything here is a pure function over pytrees. The optimizer state
(moments, step) is part of the ``lax.scan`` carry in meta/episode.py, so
second-order gradients flow through the moments exactly as they do in the
reference when ``create_graph=True`` (the torch in-place moment updates build
graph through graph-carrying grads).

Learning-rate containers:
  * LSLR:     each param leaf ↦ LR vector of shape ``(num_steps + 1,)``
              (reference :100-102); step ``i`` uses ``lrs[i]``.
  * Meta-SGD: each param leaf ↦ LR tensor shaped like the param (:289-291).
  * plain:    scalar LR broadcast everywhere (non-learnable fallback).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

BETA1 = 0.9
BETA2 = 0.99
EPS = 1e-8

PyTree = Any


@dataclasses.dataclass(frozen=True)
class InnerOptimizer:
    """A functional inner-loop learning rule.

    Attributes:
      rule: 'SGD' | 'Adam' | 'Adamax' (reference ``--optimizer`` flag reused
        for the inner rule, meta_learning_system.py:86-94).
      lr_mode: 'lslr' | 'metasgd' | 'fixed'.
      num_steps: total inner steps (sizes the LSLR vectors).
      learnable: whether LR containers should be part of the meta-params.
    """
    rule: str = "Adam"
    lr_mode: str = "lslr"
    num_steps: int = 1
    learnable: bool = True

    # -- LR container ------------------------------------------------------
    def init_lrs(self, params: PyTree, init_lr: float) -> PyTree:
        if self.lr_mode == "metasgd":
            return jax.tree.map(lambda p: jnp.full(p.shape, init_lr,
                                                   dtype=jnp.float32), params)
        if self.lr_mode == "lslr":
            n = self.num_steps + 1
            return jax.tree.map(
                lambda p: jnp.full((n,), init_lr, dtype=jnp.float32), params)
        return jax.tree.map(lambda p: jnp.asarray(init_lr, jnp.float32), params)

    def _step_lr(self, lr_leaf: jnp.ndarray, step_idx) -> jnp.ndarray:
        if self.lr_mode == "lslr":
            return lr_leaf[step_idx]
        return lr_leaf

    # -- Optimizer state ---------------------------------------------------
    def init_state(self, params: PyTree) -> PyTree:
        """Fresh per-task state (reference initialize_state(), :104-107)."""
        if self.rule == "SGD":
            return {"step": jnp.zeros((), jnp.int32)}
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        if self.rule == "Adam":
            return {"step": jnp.zeros((), jnp.int32),
                    "exp_avg": zeros(), "exp_avg_sq": zeros()}
        if self.rule == "Adamax":
            return {"step": jnp.zeros((), jnp.int32),
                    "exp_avg": zeros(), "exp_inf": zeros()}
        raise NotImplementedError(f"inner rule {self.rule!r}")

    # -- Update ------------------------------------------------------------
    def update(self, params: PyTree, grads: PyTree, lrs: PyTree,
               state: PyTree, step_idx) -> tuple[PyTree, PyTree]:
        """One inner step → (new_params, new_state). Pure; scan-friendly."""
        if self.rule == "SGD":
            new_params = jax.tree.map(
                lambda w, g, lr: w - self._step_lr(lr, step_idx) * g,
                params, grads, lrs)
            return new_params, state

        step = state["step"] + 1
        stepf = step.astype(jnp.float32)
        if self.rule == "Adam":
            bias_c1 = 1.0 - BETA1 ** stepf
            bias_c2 = 1.0 - BETA2 ** stepf
            new_m = jax.tree.map(lambda m, g: BETA1 * m + (1 - BETA1) * g,
                                 state["exp_avg"], grads)
            new_v = jax.tree.map(lambda v, g: BETA2 * v + (1 - BETA2) * g * g,
                                 state["exp_avg_sq"], grads)

            def upd(w, m, v, lr):
                # the tiny shift keeps grad-of-sqrt finite at v=0 (second-
                # order MAML NaNs otherwise on any zero-gradient leaf);
                # value change vs the reference math is ≤1e-12 relative
                denom = jnp.sqrt(v + 1e-24) / jnp.sqrt(bias_c2) + EPS
                step_size = self._step_lr(lr, step_idx) / bias_c1
                return w - step_size * m / denom

            new_params = jax.tree.map(upd, params, new_m, new_v, lrs)
            return new_params, {"step": step, "exp_avg": new_m,
                                "exp_avg_sq": new_v}

        if self.rule == "Adamax":
            bias_c1 = 1.0 - BETA1 ** stepf
            new_m = jax.tree.map(lambda m, g: BETA1 * m + (1 - BETA1) * g,
                                 state["exp_avg"], grads)
            # reference: exp_inf = max(beta2*exp_inf, |g| + eps)  (:229-236)
            new_u = jax.tree.map(
                lambda u, g: jnp.maximum(BETA2 * u, jnp.abs(g) + EPS),
                state["exp_inf"], grads)

            def upd(w, m, u, lr):
                clr = self._step_lr(lr, step_idx) / bias_c1
                return w - clr * m / u

            new_params = jax.tree.map(upd, params, new_m, new_u, lrs)
            return new_params, {"step": step, "exp_avg": new_m, "exp_inf": new_u}

        raise NotImplementedError(f"inner rule {self.rule!r}")


def make_inner_optimizer(cfg) -> InnerOptimizer:
    """Build from a Config (meta_learning_system.py:83-94 dispatch)."""
    if cfg.metasgd:
        lr_mode, learnable = "metasgd", True
    elif cfg.learnable_per_layer_per_step_inner_loop_learning_rate:
        lr_mode, learnable = "lslr", True
    else:
        lr_mode, learnable = "lslr", False  # LSLR container, frozen LRs
    return InnerOptimizer(rule=cfg.optimizer, lr_mode=lr_mode,
                          num_steps=cfg.number_of_training_steps_per_iter,
                          learnable=learnable)
