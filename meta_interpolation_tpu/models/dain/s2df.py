"""S2DF_3dense context network.

Reference: ``/root/reference/dain/S2D_models/S2DF.py:148-196,335-337``.
conv7×7 3→64 (no bias) + ReLU stem, then two dilated residual BasicBlocks
(dilations 4 and 8; conv3×3(dil)+ReLU+conv3×3, residual add, ReLU — no BN,
:28-57). Dense output: concat[raw(3), stem(64), block2(64), block3(64)]
= 195 channels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import layers
from ..layers import Params

CTX_CHANNELS = 3 * 64 + 3  # 195


def _kaiming_conv(rng, in_ch, out_ch, k, bias=True) -> Params:
    n = k * k * out_ch
    p = {"kernel": jax.random.normal(rng, (k, k, in_ch, out_ch))
         * jnp.sqrt(2.0 / n)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


def _init_block(rng, ch) -> Params:
    # BasicBlock convs carry no bias (S2DF.py:67,72 bias=False) — the
    # param tree must mirror the torch state_dict exactly
    r1, r2 = jax.random.split(rng)
    return {"conv1": _kaiming_conv(r1, ch, ch, 3, bias=False),
            "conv2": _kaiming_conv(r2, ch, ch, 3, bias=False)}


def init(rng: jax.Array) -> Params:
    r0, r2, r3 = jax.random.split(rng, 3)
    return {
        "block1": {"0": _kaiming_conv(r0, 3, 64, 7, bias=False)},
        "block2": _init_block(r2, 64),
        "block3": _init_block(r3, 64),
    }


def _basic_block(p: Params, x, dilation: int):
    out = layers.conv2d(p["conv1"], x, padding=dilation, dilation=dilation)
    out = jax.nn.relu(out)
    out = layers.conv2d(p["conv2"], out, padding=1)
    return jax.nn.relu(out + x)


def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (N,H,W,3) → (N,H,W,195) dense context features."""
    feats = [x]
    h = jax.nn.relu(layers.conv2d(params["block1"]["0"], x, padding=3))
    feats.append(h)
    h = _basic_block(params["block2"], h, dilation=4)
    feats.append(h)
    h = _basic_block(params["block3"], h, dilation=8)
    feats.append(h)
    return jnp.concatenate(feats, axis=-1)
