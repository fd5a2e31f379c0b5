"""MonoNet5 — DAIN's filter-kernel encoder-decoder.

Reference: ``/root/reference/dain/networks/DAIN.py:692-739`` (get_MonoNet5)
with the stack-based forward at :662-689: a 5-level conv/ReLU/max-pool
encoder (16→512), an intermediate conv, and a 5-level bilinear-upsample
decoder whose post-upsample features get the matching pre-pool encoder
feature *added* (the 'filter' path; the unused 'offset' path concatenates).
Two conv-relu-conv branches emit the per-frame 4×4=16-channel adaptive
filter maps.

Layer naming follows the torch flat-Sequential indices inside
``initScaleNets_filter`` / ``_filter1`` / ``_filter2`` so the released
weights convert mechanically.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from .. import layers
from ..layers import Params

# (kind, in, out): kind ∈ conv (3×3 conv + relu), pool, up
_TRUNK: List[Tuple[str, int, int]] = [
    ("conv", 6, 16),
    ("conv", 16, 32), ("pool", 0, 0),
    ("conv", 32, 64), ("pool", 0, 0),
    ("conv", 64, 128), ("pool", 0, 0),
    ("conv", 128, 256), ("pool", 0, 0),
    ("conv", 256, 512), ("pool", 0, 0),
    ("conv", 512, 512),
    ("up", 0, 0), ("conv", 512, 256),
    ("up", 0, 0), ("conv", 256, 128),
    ("up", 0, 0), ("conv", 128, 64),
    ("up", 0, 0), ("conv", 64, 32),
    ("up", 0, 0), ("conv", 32, 16),
]


def _xavier_conv(rng, in_ch, out_ch, k=3):
    fan_in = in_ch * k * k
    fan_out = out_ch * k * k
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return {"kernel": jax.random.uniform(rng, (k, k, in_ch, out_ch),
                                         minval=-bound, maxval=bound),
            "bias": jnp.zeros((out_ch,))}


def init(rng: jax.Array, channel_out: int = 16) -> Params:
    n_convs = sum(1 for k, _i, _o in _TRUNK if k == "conv")
    rngs = jax.random.split(rng, n_convs + 4)
    it = iter(rngs)
    trunk = {}
    # torch flattens [conv, relu] / [pool] / [up, conv, relu] — conv layer
    # indices in that flat ModuleList:
    idx = 0
    for kind, ic, oc in _TRUNK:
        if kind == "conv":
            trunk[str(idx)] = _xavier_conv(next(it), ic, oc)
            idx += 2  # conv + relu
        elif kind == "pool":
            idx += 1
        else:  # up
            idx += 1
    # `branch += Sequential(conv, relu, conv)` flattens in the reference, so
    # branch params are flat indices {0, 2}
    branch1 = {"0": _xavier_conv(next(it), 16, 16),
               "2": _xavier_conv(next(it), 16, channel_out)}
    branch2 = {"0": _xavier_conv(next(it), 16, 16),
               "2": _xavier_conv(next(it), 16, channel_out)}
    return {"initScaleNets_filter": trunk,
            "initScaleNets_filter1": branch1,
            "initScaleNets_filter2": branch2}


def _trunk(p: Params, x) -> jnp.ndarray:
    stack = []
    idx = 0
    for kind, _ic, _oc in _TRUNK:
        if kind == "conv":
            x = jax.nn.relu(layers.conv2d(p[str(idx)], x, padding=1))
            idx += 2
        elif kind == "pool":
            stack.append(x)
            x = layers.max_pool(x, 2)
            idx += 1
        else:  # up: bilinear ×2 then residual add of the pre-pool feature
            x = layers.upsample_bilinear(x, 2, align_corners=False)
            x = x + stack.pop()
            idx += 1
    return x


def _branch(p: Params, x) -> jnp.ndarray:
    x = jax.nn.relu(layers.conv2d(p["0"], x, padding=1))
    return layers.conv2d(p["2"], x, padding=1)


def apply(params: Params, frames_cat: jnp.ndarray):
    """frames_cat: (N, H, W, 6) → (filter0, filter1) each (N, H, W, 16)."""
    temp = _trunk(params["initScaleNets_filter"], frames_cat)
    return (_branch(params["initScaleNets_filter1"], temp),
            _branch(params["initScaleNets_filter2"], temp))
