"""Deep Voxel Flow (DVF).

Reference: ``/root/reference/voxelflow/core/models/voxel_flow.py:231-534``.
3-level conv encoder (5×5/5×5/3×3, bias-free convs + BN + ReLU, max-pool),
bottleneck, decoder with skip-concats and bilinear ×2 upsampling
(align_corners=False), tanh head → 2-ch voxel flow + 1-ch mask; trilinear
sampling on symmetric ±flow normalized coordinates with border padding
(ops/warp.voxelflow_sample). Pad-to-×64 reflect (:360-370).

BatchNorm is **permanently frozen in eval mode** in every phase
(:283-284, :352-355), so it is a fixed affine with stored running stats
(layers.batch_norm_apply); the BN stats live in the params tree but are
excluded from inner-loop adaptation unless
``--enable_inner_loop_optimizable_bn_params`` (episode mask; mirrors the
reference's "norm_layer" name filter, meta_learning_system.py:222-226).

Init: conv weights N(0, 0.01), zero bias (:267-271).
Inputs are 0-255-range normalized (x−127.5)/127.5 upstream (registry).
The ``get_optim_policies`` grouping (:307-350, multipliers
voxelflow_maml_config.py:8-10) is implemented in
meta/system.make_outer_optimizer (voxelflow+Adam): conv weights
[lr×1, decay×1], conv biases [lr×2, decay×0], BN scale/shift
[lr×1, decay×1], torch-default betas; BN running stats are buffers,
frozen via ``outer_mask`` below. Documented deviation: the reference's
voxelflow branch passes ONLY net policies to Adam
(meta_learning_system.py:134-136), silently leaving the Meta-SGD inner
LRs out of the outer optimizer; here the LRs stay trainable on a plain
no-decay Adam policy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers
from .layers import Params


def _conv_init_normal(rng, in_ch, out_ch, k, bias=True) -> Params:
    p: Params = {"kernel": 0.01 * jax.random.normal(
        rng, (k, k, in_ch, out_ch))}
    if bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


def init(rng: jax.Array, per_step_bn_affine: int = 0, **_kw) -> Params:
    """``per_step_bn_affine=S`` (> 0): BN affine scale/bias become per-step
    (S, C) rows initialized ones/zeros — the reference MetaBatchNormLayer's
    ``use_per_step_bn_statistics`` WITHOUT
    ``enable_inner_loop_optimizable_bn_params`` (model_utils.py:453-461:
    ``self.weight[num_step]``). Outer-trainable (requires_grad =
    learnable_gamma/beta), never inner-adapted."""
    rngs = jax.random.split(rng, 8)
    params = {
        "conv1": _conv_init_normal(rngs[0], 6, 64, 5, bias=False),
        "conv1_bn": layers.batch_norm_init(64),
        "conv2": _conv_init_normal(rngs[1], 64, 128, 5, bias=False),
        "conv2_bn": layers.batch_norm_init(128),
        "conv3": _conv_init_normal(rngs[2], 128, 256, 3, bias=False),
        "conv3_bn": layers.batch_norm_init(256),
        "bottleneck": _conv_init_normal(rngs[3], 256, 256, 3, bias=False),
        "bottleneck_bn": layers.batch_norm_init(256),
        "deconv1": _conv_init_normal(rngs[4], 512, 256, 3, bias=False),
        "deconv1_bn": layers.batch_norm_init(256),
        "deconv2": _conv_init_normal(rngs[5], 384, 128, 5, bias=False),
        "deconv2_bn": layers.batch_norm_init(128),
        "deconv3": _conv_init_normal(rngs[6], 192, 64, 5, bias=False),
        "deconv3_bn": layers.batch_norm_init(64),
        "conv4": _conv_init_normal(rngs[7], 64, 3, 5, bias=True),
    }
    if per_step_bn_affine > 0:
        for name in BN_NAMES:
            ch = params[name]["scale"].shape[0]
            params[name]["scale"] = jnp.ones((per_step_bn_affine, ch))
            params[name]["bias"] = jnp.zeros((per_step_bn_affine, ch))
    return params


def inner_mask(params: Params) -> Params:
    """Exclude BN running stats AND affine params from inner-loop adaptation
    (the reference's get_inner_loop_parameter_dict drops 'norm_layer' names
    when --enable_inner_loop_optimizable_bn_params is off; BN is frozen in
    VoxelFlow anyway)."""
    def mk(name, sub):
        val = 0.0 if name.endswith("_bn") else 1.0
        return jax.tree.map(lambda x: jnp.full((), val, jnp.float32), sub)

    return {name: mk(name, sub) for name, sub in params.items()}


def outer_mask(params: Params) -> Params:
    """BN running stats (mean/var) are torch buffers — excluded from
    list(m.parameters()) in get_optim_policies (:321-329), so the outer
    optimizer must never move them. Affine scale/bias stay trainable."""
    def mk(name, sub):
        if name.endswith("_bn"):
            return {k: (k in ("scale", "bias")) for k in sub}
        return jax.tree.map(lambda _: True, sub)

    return {name: mk(name, sub) for name, sub in params.items()}


BN_NAMES = ("conv1_bn", "conv2_bn", "conv3_bn", "bottleneck_bn",
            "deconv1_bn", "deconv2_bn", "deconv3_bn")


def init_bn_state(num_steps: int) -> Params:
    """Per-step BN running statistics for every BN layer — the reference
    MetaBatchNormLayer's use_per_step_bn_statistics buffers, initialized
    zeros/ones per model_utils.py:454-457 (NOT from the checkpoint's flat
    running stats, matching the reference layer's own init)."""
    chans = {"conv1_bn": 64, "conv2_bn": 128, "conv3_bn": 256,
             "bottleneck_bn": 256, "deconv1_bn": 256, "deconv2_bn": 128,
             "deconv3_bn": 64}
    return {name: {"running_mean": jnp.zeros((num_steps, chans[name])),
                   "running_var": jnp.ones((num_steps, chans[name]))}
            for name in BN_NAMES}


def _cbr(p_conv, p_bn, x, k, bn_entry=None, num_step=0):
    """conv → BN → ReLU. ``bn_entry`` None: the reference VoxelFlow's
    permanently-frozen eval-mode BN (fixed affine on stored stats,
    voxel_flow.py:283-284). Else: MetaBatchNormLayer semantics with
    use_per_step_bn_statistics (model_utils.py:504-521 —
    F.batch_norm(training=True): batch-stat normalization, per-step
    running rows updated with momentum 0.1); returns the updated entry.
    The affine follows the param shape: (S, C) rows → per-step affine
    ``self.weight[num_step]`` (reference :504-511, the combination without
    enable_inner_loop_optimizable_bn_params); flat (C,) → the adaptable
    flat affine that flag substitutes (:470-475)."""
    x = layers.conv2d(p_conv, x, padding=k // 2)
    if bn_entry is None:
        return jax.nn.relu(layers.batch_norm_apply(p_bn, x)), None
    if p_bn["scale"].ndim == 2:
        w, b = p_bn["scale"][num_step], p_bn["bias"][num_step]
    else:
        w, b = p_bn["scale"], p_bn["bias"]
    p = {"weight": w, "bias": b,
         "running_mean": bn_entry["running_mean"],
         "running_var": bn_entry["running_var"]}
    out, new = layers.meta_batch_norm_apply(
        p, x, num_step=num_step, adapted={"weight": w, "bias": b})
    new_entry = {"running_mean": new["running_mean"],
                 "running_var": new["running_var"]}
    return jax.nn.relu(out), new_entry


def apply(params: Params, frame0: jnp.ndarray, frame1: jnp.ndarray,
          syn_type: str = "inter", warp_range=None, bn_state=None,
          num_step=0, **_kw):
    """Returns the prediction; with ``bn_state`` (per-step BN mode — see
    init_bn_state), returns ``(pred, new_bn_state)``."""
    from ..ops import warp as warp_ops

    x = jnp.concatenate([frame0, frame1], axis=-1)
    x, pads = layers.pad_to_multiple(x, 64)
    inp = x

    if bn_state is not None:
        steps = bn_state[BN_NAMES[0]]["running_mean"].shape[0]
        num_step = jnp.clip(num_step, 0, steps - 1)
    new_state = {}

    def cbr(name_conv, name_bn, x, k):
        entry = None if bn_state is None else bn_state[name_bn]
        out, new_entry = _cbr(params[name_conv], params[name_bn], x, k,
                              bn_entry=entry, num_step=num_step)
        if new_entry is not None:
            new_state[name_bn] = new_entry
        return out

    conv1 = cbr("conv1", "conv1_bn", x, 5)
    x = layers.max_pool(conv1, 2)
    conv2 = cbr("conv2", "conv2_bn", x, 5)
    x = layers.max_pool(conv2, 2)
    conv3 = cbr("conv3", "conv3_bn", x, 3)
    x = layers.max_pool(conv3, 2)
    x = cbr("bottleneck", "bottleneck_bn", x, 3)

    x = layers.upsample_bilinear(x, 2, align_corners=False)
    x = cbr("deconv1", "deconv1_bn",
            jnp.concatenate([x, conv3], axis=-1), 3)
    x = layers.upsample_bilinear(x, 2, align_corners=False)
    x = cbr("deconv2", "deconv2_bn",
            jnp.concatenate([x, conv2], axis=-1), 5)
    x = layers.upsample_bilinear(x, 2, align_corners=False)
    x = cbr("deconv3", "deconv3_bn",
            jnp.concatenate([x, conv1], axis=-1), 5)
    x = layers.conv2d(params["conv4"], x, padding=2)
    x = jnp.tanh(x)

    flow = 0.5 * x[..., 0:2]
    mask = x[..., 2:3]
    if syn_type == "extra":
        # extrapolation: both samples on the same side (:486-490)
        n, h, w, _ = inp.shape
        gx = jnp.linspace(-1.0, 1.0, w)[None, None, :]
        gy = jnp.linspace(-1.0, 1.0, h)[None, :, None]
        u, v = flow[..., 0], flow[..., 1]
        g1 = jnp.stack([gx - 2 * u, gy - 2 * v], axis=-1)
        g2 = jnp.stack([gx - u, gy - v], axis=-1)
        out1 = warp_ops.grid_sample(inp[..., 0:3], g1, align_corners=True,
                                    padding_mode="border")
        out2 = warp_ops.grid_sample(inp[..., 3:6], g2, align_corners=True,
                                    padding_mode="border")
        m = 0.5 * (1.0 + mask)
        out = m * out1 + (1.0 - m) * out2
    else:
        out = warp_ops.voxelflow_sample(inp[..., 0:3], inp[..., 3:6],
                                        flow, mask, warp_range=warp_range)
    out = layers.unpad(out, pads)
    if bn_state is not None:
        return out, new_state
    return out
