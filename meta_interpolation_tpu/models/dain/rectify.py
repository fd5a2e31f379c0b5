"""Rectify network — MultipleBasicBlock_4, DAIN's only meta-learned part.

Reference: ``/root/reference/dain/Resblock/BasicBlock.py:152-215``:
conv7×7(437→128)+ReLU, then 3 residual BasicBlocks (conv3×3+ReLU+conv3×3,
add, ReLU — no BN), then conv3×3(128→3). Init: normal(0, sqrt(2/n)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import layers
from ..layers import Params


def _kaiming_conv(rng, in_ch, out_ch, k, bias=True):
    n = k * k * out_ch
    p = {"kernel": jax.random.normal(rng, (k, k, in_ch, out_ch))
         * jnp.sqrt(2.0 / n)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


def init(rng: jax.Array, in_channels: int = 437,
         intermediate: int = 128) -> Params:
    rngs = jax.random.split(rng, 8)
    params: Params = {
        "block1": {"0": _kaiming_conv(rngs[0], in_channels, intermediate, 7)},
        "block5": {"0": _kaiming_conv(rngs[7], intermediate, 3, 3)},
    }
    # MetaBasicBlock convs carry no bias (BasicBlock.py:101-106
    # use_bias=False) — rectifyNet is the ONLY meta-learned DAIN part, so
    # phantom biases would be adapted/meta-trained leaves the reference
    # does not have (and change the L2F attenuator layer count)
    for i, name in enumerate(("block2", "block3", "block4")):
        r1, r2 = jax.random.split(rngs[1 + i])
        params[name] = {
            "conv1": _kaiming_conv(r1, intermediate, intermediate, 3,
                                   bias=False),
            "conv2": _kaiming_conv(r2, intermediate, intermediate, 3,
                                   bias=False)}
    return params


def _basic_block(p: Params, x):
    out = jax.nn.relu(layers.conv2d(p["conv1"], x, padding=1))
    out = layers.conv2d(p["conv2"], out, padding=1)
    return jax.nn.relu(out + x)


def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = jax.nn.relu(layers.conv2d(params["block1"]["0"], x, padding=3))
    x = _basic_block(params["block2"], x)
    x = _basic_block(params["block3"], x)
    x = _basic_block(params["block4"], x)
    return layers.conv2d(params["block5"]["0"], x, padding=1)
