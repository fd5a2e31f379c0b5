"""SepConv — adaptive separable convolution VFI.

Reference: ``/root/reference/sepconv/model.py:168-375``. A 5-level conv
encoder-decoder (32→512 ch, triple-conv ``Basic`` blocks, avg-pool down /
bilinear-up with skip adds) feeding four ``Subnet`` heads that emit per-pixel
51-tap vertical/horizontal 1-D kernels for each input frame. Output =
sepconv(pad₂₅(I0), kv1, kh1) + sepconv(pad₂₅(I1), kv2, kh2).

Padding protocol (reference :252-269): replicate-pad 25 px + grow to the
next ×128 on the bottom/right, crop back after.

Reference quirk preserved via the inner-loop mask (registry/inner_mask):
the four kernel-prediction subnets are invoked *without* the adapted params
at :346-347, i.e. they are excluded from inner-loop adaptation (they still
receive outer-loop meta-gradients). ``inner_mask()`` mirrors that.

The sepconv application itself is the Pallas kernel in ops/sepconv.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers
from .cain import _xavier_conv
from ..ops import sepconv as sepconv_op
from .layers import Params

PAD = 25
F_TAPS = 51


def _init_basic(rng, in_ch, out_ch) -> Params:
    r0, r2, r4 = jax.random.split(rng, 3)
    return {"0": _xavier_conv(r0, in_ch, out_ch, 3),
            "2": _xavier_conv(r2, out_ch, out_ch, 3),
            "4": _xavier_conv(r4, out_ch, out_ch, 3)}


def _init_subnet(rng) -> Params:
    r0, r2, r4, r7 = jax.random.split(rng, 4)
    return {"0": _xavier_conv(r0, 64, 64, 3),
            "2": _xavier_conv(r2, 64, 64, 3),
            "4": _xavier_conv(r4, 64, F_TAPS, 3),
            "7": _xavier_conv(r7, F_TAPS, F_TAPS, 3)}


def _init_upsample(rng, ch) -> Params:
    return {"1": _xavier_conv(rng, ch, ch, 3)}


def init(rng: jax.Array, **_kw) -> Params:
    names_channels = [
        ("moduleConv1", 6, 32), ("moduleConv2", 32, 64),
        ("moduleConv3", 64, 128), ("moduleConv4", 128, 256),
        ("moduleConv5", 256, 512), ("moduleDeconv5", 512, 512),
        ("moduleDeconv4", 512, 256), ("moduleDeconv3", 256, 128),
        ("moduleDeconv2", 128, 64),
    ]
    rngs = jax.random.split(rng, len(names_channels) + 8)
    params: Params = {}
    for i, (name, ic, oc) in enumerate(names_channels):
        params[name] = _init_basic(rngs[i], ic, oc)
    base = len(names_channels)
    for j, (name, ch) in enumerate([("moduleUpsample5", 512),
                                    ("moduleUpsample4", 256),
                                    ("moduleUpsample3", 128),
                                    ("moduleUpsample2", 64)]):
        params[name] = _init_upsample(rngs[base + j], ch)
    for j, name in enumerate(["moduleVertical1", "moduleVertical2",
                              "moduleHorizontal1", "moduleHorizontal2"]):
        params[name] = _init_subnet(rngs[base + 4 + j])
    return params


def inner_mask(params: Params) -> Params:
    """0/1 mask excluding the four kernel subnets from inner-loop adaptation
    (reference sepconv/model.py:346-347 calls them without params)."""
    frozen = {"moduleVertical1", "moduleVertical2",
              "moduleHorizontal1", "moduleHorizontal2"}

    def mk(name, sub):
        val = 0.0 if name in frozen else 1.0
        return jax.tree.map(lambda x: jnp.full((), val, jnp.float32), sub)

    return {name: mk(name, sub) for name, sub in params.items()}


def _basic(p: Params, x):
    x = jax.nn.relu(layers.conv2d(p["0"], x, padding=1))
    x = jax.nn.relu(layers.conv2d(p["2"], x, padding=1))
    x = jax.nn.relu(layers.conv2d(p["4"], x, padding=1))
    return x


def _upsample_block(p: Params, x):
    x = layers.upsample_bilinear(x, 2, align_corners=True)
    return jax.nn.relu(layers.conv2d(p["1"], x, padding=1))


def _subnet(p: Params, x):
    x = jax.nn.relu(layers.conv2d(p["0"], x, padding=1))
    x = jax.nn.relu(layers.conv2d(p["2"], x, padding=1))
    x = jax.nn.relu(layers.conv2d(p["4"], x, padding=1))
    x = layers.upsample_bilinear(x, 2, align_corners=True)
    return layers.conv2d(p["7"], x, padding=1)


def apply(params: Params, frame0: jnp.ndarray, frame1: jnp.ndarray,
          use_pallas: bool = True, **_kw) -> jnp.ndarray:
    h, w = frame0.shape[1], frame0.shape[2]
    # pad 25 then grow to ×128 (reference :254-266): left/top get exactly 25,
    # bottom/right absorb the rounding
    target_h = -(-(h + 2 * PAD) // 128) * 128
    target_w = -(-(w + 2 * PAD) // 128) * 128
    pads = (PAD, target_w - PAD - w, PAD, target_h - PAD - h)
    x0 = layers.replicate_pad(frame0, pads)
    x1 = layers.replicate_pad(frame1, pads)

    join = jnp.concatenate([x0, x1], axis=-1)
    c1 = _basic(params["moduleConv1"], join)
    c2 = _basic(params["moduleConv2"], layers.avg_pool(c1, 2))
    c3 = _basic(params["moduleConv3"], layers.avg_pool(c2, 2))
    c4 = _basic(params["moduleConv4"], layers.avg_pool(c3, 2))
    c5 = _basic(params["moduleConv5"], layers.avg_pool(c4, 2))

    d5 = _basic(params["moduleDeconv5"], layers.avg_pool(c5, 2))
    u5 = _upsample_block(params["moduleUpsample5"], d5)
    comb = u5 + c5
    d4 = _basic(params["moduleDeconv4"], comb)
    u4 = _upsample_block(params["moduleUpsample4"], d4)
    comb = u4 + c4
    d3 = _basic(params["moduleDeconv3"], comb)
    u3 = _upsample_block(params["moduleUpsample3"], d3)
    comb = u3 + c3
    d2 = _basic(params["moduleDeconv2"], comb)
    u2 = _upsample_block(params["moduleUpsample2"], d2)
    comb = u2 + c2  # half resolution, 64 ch

    kv1 = _subnet(params["moduleVertical1"], comb)
    kv2 = _subnet(params["moduleVertical2"], comb)
    kh1 = _subnet(params["moduleHorizontal1"], comb)
    kh2 = _subnet(params["moduleHorizontal2"], comb)

    pad_k = F_TAPS // 2
    x0p = layers.replicate_pad(x0, pad_k)
    x1p = layers.replicate_pad(x1, pad_k)
    dot1 = sepconv_op.sepconv(x0p, kv1, kh1, use_pallas)
    dot2 = sepconv_op.sepconv(x1p, kv2, kh2, use_pallas)
    out = dot1 + dot2
    return out[:, PAD:PAD + h, PAD:PAD + w, :]
