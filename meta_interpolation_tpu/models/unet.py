"""Tunable U-Net used by RRIN (reference ``/root/reference/rrin/unet.py``).

depth-d encoder of double-conv blocks (3×3, LeakyReLU 0.1) with avg-pool
downsampling, a mid conv, and bilinear-upsample + conv + skip-concat
decoder blocks. Channel widths 2^(wf+i), wf=5.

Param tree mirrors the torch module names (``down_path.{i}.block.{0,2}``,
``midconv``, ``up_path.{i}.up.1`` / ``up_path.{i}.conv_block.block.{0,2}``,
``last``) for .pth conversion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers
from .cain import _xavier_conv
from .layers import Params


def _init_conv_block(rng, in_ch, out_ch) -> Params:
    r0, r2 = jax.random.split(rng)
    return {"block": {"0": _xavier_conv(r0, in_ch, out_ch, 3),
                      "2": _xavier_conv(r2, out_ch, out_ch, 3)}}


def _init_up_block(rng, in_ch, out_ch) -> Params:
    r_up, r_cb = jax.random.split(rng)
    return {"up": {"1": _xavier_conv(r_up, in_ch, out_ch, 3)},
            "conv_block": _init_conv_block(r_cb, in_ch, out_ch)}


def init(rng: jax.Array, in_channels: int, n_classes: int, depth: int,
         wf: int = 5) -> Params:
    n_down = depth
    rngs = jax.random.split(rng, 2 * depth + 1)
    params: Params = {"down_path": {}, "up_path": {}}
    prev = in_channels
    for i in range(n_down):
        params["down_path"][str(i)] = _init_conv_block(rngs[i], prev,
                                                       2 ** (wf + i))
        prev = 2 ** (wf + i)
    params["midconv"] = _xavier_conv(rngs[depth], prev, prev, 3)
    for j, i in enumerate(reversed(range(depth - 1))):
        params["up_path"][str(j)] = _init_up_block(rngs[depth + 1 + j], prev,
                                                   2 ** (wf + i))
        prev = 2 ** (wf + i)
    params["last"] = _xavier_conv(rngs[-1], prev, n_classes, 3)
    return params


def _conv_block(p: Params, x) -> jnp.ndarray:
    x = layers.leaky_relu(layers.conv2d(p["block"]["0"], x, padding=1), 0.1)
    x = layers.leaky_relu(layers.conv2d(p["block"]["2"], x, padding=1), 0.1)
    return x


def _up_block(p: Params, x, bridge) -> jnp.ndarray:
    up = layers.upsample_bilinear(x, 2, align_corners=False)
    up = layers.conv2d(p["up"]["1"], up, padding=1)
    # center-crop the bridge to match (shapes already match for ×128 inputs)
    bh, bw = bridge.shape[1], bridge.shape[2]
    uh, uw = up.shape[1], up.shape[2]
    dy, dx = (bh - uh) // 2, (bw - uw) // 2
    bridge = bridge[:, dy:dy + uh, dx:dx + uw, :]
    return _conv_block(p["conv_block"], jnp.concatenate([up, bridge], axis=-1))


def apply(params: Params, x: jnp.ndarray, depth: int) -> jnp.ndarray:
    blocks = []
    for i in range(depth):
        x = _conv_block(params["down_path"][str(i)], x)
        if i != depth - 1:
            blocks.append(x)
            x = layers.avg_pool(x, 2)
    x = layers.leaky_relu(layers.conv2d(params["midconv"], x, padding=1), 0.1)
    for j in range(depth - 1):
        x = _up_block(params["up_path"][str(j)], x, blocks[-j - 1])
    return layers.conv2d(params["last"], x, padding=1)
