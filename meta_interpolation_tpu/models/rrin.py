"""RRIN — Residue Refinement Interpolation Network.

Reference: ``/root/reference/rrin/model.py:61-151``. Four U-Nets:
  * ``Flow_L``      UNet(6→4, depth 5): bidirectional flow between inputs
  * ``refine_flow`` UNet(10→4, depth 4): refines the time-weighted flows
  * ``Mask``        UNet(16→2, depth 4): soft occlusion weights
  * ``final``       UNet(9→3, depth 4): residual refinement

Pipeline (t=0.5): F_t0 = −(1−t)t·F01 + t²·F10, F_t1 = (1−t)²·F01 − t(1−t)·F10;
refine; backward-warp both inputs with the RRIN warp (ops/warp.py,
half-pixel-quirk preserved); sigmoid mask blend with ε=1e-8; final UNet adds a
residual; clamp to [0,1]. Pad-to-×128 outside.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers, unet
from ..ops import warp as warp_ops
from .layers import Params


def init(rng: jax.Array, **_kw) -> Params:
    r_mask, r_flow, r_refine, r_final = jax.random.split(rng, 4)
    return {
        "Mask": unet.init(r_mask, 16, 2, 4),
        "Flow_L": unet.init(r_flow, 6, 4, 5),
        "refine_flow": unet.init(r_refine, 10, 4, 4),
        "final": unet.init(r_final, 9, 3, 4),
    }


def inner_mask(params: Params) -> Params:
    """0/1 mask excluding the Mask UNet from inner-loop adaptation: the
    reference forward calls ``self.Mask(temp)`` WITHOUT threading the
    adapted params (rrin/model.py:101 — unlike Flow_L/refine_flow/final,
    which consume param_dict entries), so adaptation never changes the
    occlusion-mask weights; outer grads still reach them via the query
    forward. Same preserved quirk as sepconv's kernel subnets."""
    def mk(name, sub):
        val = 0.0 if name == "Mask" else 1.0
        return jax.tree.map(lambda x: jnp.full((), val, jnp.float32), sub)

    return {name: mk(name, sub) for name, sub in params.items()}


def _process(params: Params, x0, x1, t: float, warp_range=None):
    x = jnp.concatenate([x0, x1], axis=-1)
    flow = unet.apply(params["Flow_L"], x, depth=5)
    f01, f10 = flow[..., :2], flow[..., 2:4]
    ft0 = -(1 - t) * t * f01 + t * t * f10
    ft1 = (1 - t) * (1 - t) * f01 - t * (1 - t) * f10
    refined = unet.apply(params["refine_flow"],
                         jnp.concatenate([ft0, ft1, x], axis=-1), depth=4)
    ft0 = ft0 + refined[..., :2]
    ft1 = ft1 + refined[..., 2:4]
    xt1 = warp_ops.backward_warp_rrin(x0, ft0, warp_range=warp_range)
    xt2 = warp_ops.backward_warp_rrin(x1, ft1, warp_range=warp_range)
    mask_in = jnp.concatenate([ft0, ft1, x, xt1, xt2], axis=-1)
    mask = jax.nn.sigmoid(unet.apply(params["Mask"], mask_in, depth=4))
    w1 = (1 - t) * mask[..., 0:1]
    w2 = t * mask[..., 1:2]
    return (w1 * xt1 + w2 * xt2) / (w1 + w2 + 1e-8)


def apply(params: Params, frame0: jnp.ndarray, frame1: jnp.ndarray,
          t: float = 0.5, warp_range=None, **_kw) -> jnp.ndarray:
    """``warp_range``: optional pixel bound enabling the TPU fast warp
    (ops/warp.grid_sample_bounded); None = exact gather."""
    x0, pads = layers.pad_to_multiple(frame0, 128)
    x1, _ = layers.pad_to_multiple(frame1, 128)
    output = _process(params, x0, x1, t, warp_range)
    compose = jnp.concatenate([x0, x1, output], axis=-1)
    final = unet.apply(params["final"], compose, depth=4) + output
    final = jnp.clip(final, 0.0, 1.0)
    return layers.unpad(final, pads)
