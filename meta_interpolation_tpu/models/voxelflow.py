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


def init(rng: jax.Array, **_kw) -> Params:
    rngs = jax.random.split(rng, 8)
    return {
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


def _cbr(p_conv, p_bn, x, k):
    x = layers.conv2d(p_conv, x, padding=k // 2)
    x = layers.batch_norm_apply(p_bn, x)
    return jax.nn.relu(x)


def apply(params: Params, frame0: jnp.ndarray, frame1: jnp.ndarray,
          syn_type: str = "inter", warp_range=None, **_kw) -> jnp.ndarray:
    from ..ops import warp as warp_ops

    x = jnp.concatenate([frame0, frame1], axis=-1)
    x, pads = layers.pad_to_multiple(x, 64)
    inp = x

    conv1 = _cbr(params["conv1"], params["conv1_bn"], x, 5)
    x = layers.max_pool(conv1, 2)
    conv2 = _cbr(params["conv2"], params["conv2_bn"], x, 5)
    x = layers.max_pool(conv2, 2)
    conv3 = _cbr(params["conv3"], params["conv3_bn"], x, 3)
    x = layers.max_pool(conv3, 2)
    x = _cbr(params["bottleneck"], params["bottleneck_bn"], x, 3)

    x = layers.upsample_bilinear(x, 2, align_corners=False)
    x = _cbr(params["deconv1"], params["deconv1_bn"],
             jnp.concatenate([x, conv3], axis=-1), 3)
    x = layers.upsample_bilinear(x, 2, align_corners=False)
    x = _cbr(params["deconv2"], params["deconv2_bn"],
             jnp.concatenate([x, conv2], axis=-1), 5)
    x = layers.upsample_bilinear(x, 2, align_corners=False)
    x = _cbr(params["deconv3"], params["deconv3_bn"],
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
    return layers.unpad(out, pads)
