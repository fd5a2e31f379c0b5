"""PWC-DC optical flow network.

Reference: ``/root/reference/dain/PWCNet/PWCNet.py:40-317`` — 6-level
siamese feature pyramid (LeakyReLU 0.1 convs), correlation cost volume at
each level (ops/correlation.py, md=4, 81 ch), DenseNet-style flow decoders
(each conv output concatenated with its input), flow upsampling via 4×4
stride-2 transposed convs, masked backward warping between levels with
per-level flow scaling (0.625 / 1.25 / 2.5 / 5.0), and a dilated context
network refining the final quarter-res flow.

Warp convention (:158-198): vgrid = grid + flow normalized by
2·x/(W−1) − 1, torch-1.4-default align_corners=False grid_sample, with an
out-of-bounds mask that zeroes samples whose ones-warp drops below 0.9999.

Init: kaiming-normal fan-in, zero bias (:135-139).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from .. import layers
from ..layers import Params
from ...ops.correlation import correlation
from ...ops import warp as warp_ops

ND = 81  # (2*4+1)^2 correlation channels
DD = [128, 256, 352, 416, 448]  # cumsum([128,128,96,64,32])

_FEATURE_SPECS = [
    # (name, in, out, stride)
    ("conv1a", 3, 16, 2), ("conv1aa", 16, 16, 1), ("conv1b", 16, 16, 1),
    ("conv2a", 16, 32, 2), ("conv2aa", 32, 32, 1), ("conv2b", 32, 32, 1),
    ("conv3a", 32, 64, 2), ("conv3aa", 64, 64, 1), ("conv3b", 64, 64, 1),
    ("conv4a", 64, 96, 2), ("conv4aa", 96, 96, 1), ("conv4b", 96, 96, 1),
    ("conv5a", 96, 128, 2), ("conv5aa", 128, 128, 1), ("conv5b", 128, 128, 1),
    ("conv6aa", 128, 196, 2), ("conv6a", 196, 196, 1), ("conv6b", 196, 196, 1),
]

_LEVEL_EXTRA = {6: 0, 5: 128 + 4, 4: 96 + 4, 3: 64 + 4, 2: 32 + 4}
_FLOW_SCALE = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


def _kaiming_conv(rng, in_ch, out_ch, k) -> Params:
    fan_in = in_ch * k * k
    return {"kernel": jax.random.normal(rng, (k, k, in_ch, out_ch))
            * jnp.sqrt(2.0 / fan_in),
            "bias": jnp.zeros((out_ch,))}


def init(rng: jax.Array) -> Params:
    params: Params = {}
    n_convs = (len(_FEATURE_SPECS) + 5 * 7 + 7 + 2)
    rngs = iter(jax.random.split(rng, n_convs + 8))
    for name, ic, oc, _s in _FEATURE_SPECS:
        params[name] = {"0": _kaiming_conv(next(rngs), ic, oc, 3)}
    for lvl in (6, 5, 4, 3, 2):
        od = ND + _LEVEL_EXTRA[lvl]
        widths = [128, 128, 96, 64, 32]
        ch = od
        for i, wdt in enumerate(widths):
            params[f"conv{lvl}_{i}"] = {"0": _kaiming_conv(next(rngs), ch, wdt, 3)}
            ch += wdt
        params[f"predict_flow{lvl}"] = _kaiming_conv(next(rngs), ch, 2, 3)
        if lvl > 2:
            params[f"deconv{lvl}"] = _kaiming_conv(next(rngs), 2, 2, 4)
            params[f"upfeat{lvl}"] = _kaiming_conv(next(rngs), ch, 2, 4)
    dc_specs = [(ND + _LEVEL_EXTRA[2] + DD[4], 128, 1), (128, 128, 2),
                (128, 128, 4), (128, 96, 8), (96, 64, 16), (64, 32, 1)]
    for i, (ic, oc, _d) in enumerate(dc_specs):
        params[f"dc_conv{i + 1}"] = {"0": _kaiming_conv(next(rngs), ic, oc, 3)}
    params["dc_conv7"] = _kaiming_conv(next(rngs), 32, 2, 3)
    return params


def _conv_lrelu(p, x, stride=1, dilation=1):
    out = layers.conv2d(p["0"], x, stride=stride, padding=dilation,
                        dilation=dilation)
    return layers.leaky_relu(out, 0.1)


def _deconv(p, x):
    """ConvTranspose2d(k=4, s=2, p=1) — torch kernel converted to HWIO."""
    return layers.conv2d_transpose(p, x, stride=2, padding=1)


def _warp_masked(x, flow):
    """Reference warp (:158-198): normalized 2p/(S−1)−1 grid,
    align_corners=False sampling, validity mask thresholded at 0.9999."""
    n, h, w, c = x.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    gx = 2.0 * (xs + flow[..., 0]) / max(w - 1, 1) - 1.0
    gy = 2.0 * (ys + flow[..., 1]) / max(h - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    out = warp_ops.grid_sample(x, grid, align_corners=False,
                               padding_mode="zeros")
    ones = jnp.ones_like(x[..., :1])
    mask = warp_ops.grid_sample(ones, grid, align_corners=False,
                                padding_mode="zeros")
    mask = jnp.where(mask < 0.9999, 0.0, 1.0)
    return out * mask


def _features(params: Params, im) -> Dict[int, jnp.ndarray]:
    feats = {}
    x = im
    for i, (name, _ic, _oc, s) in enumerate(_FEATURE_SPECS):
        x = _conv_lrelu(params[name], x, stride=s)
        if name in ("conv1b", "conv2b", "conv3b", "conv4b", "conv5b", "conv6b"):
            feats[int(name[4])] = x
    return feats


def _decoder_level(params: Params, lvl: int, x_in):
    x = x_in
    for i in range(5):
        out = _conv_lrelu(params[f"conv{lvl}_{i}"], x)
        x = jnp.concatenate([out, x], axis=-1)
    flow = layers.conv2d(params[f"predict_flow{lvl}"], x, padding=1)
    return x, flow


def apply(params: Params, im1: jnp.ndarray, im2: jnp.ndarray) -> jnp.ndarray:
    """Quarter-resolution flow (N, H/4, W/4, 2); multiply by div_flow=20
    and upsample ×4 at the caller (DAIN's forward_flownets)."""
    f1 = _features(params, im1)
    f2 = _features(params, im2)

    corr6 = layers.leaky_relu(correlation(f1[6], f2[6]), 0.1)
    x, flow6 = _decoder_level(params, 6, corr6)
    up_flow = _deconv(params["deconv6"], flow6)
    up_feat = _deconv(params["upfeat6"], x)

    for lvl in (5, 4, 3):
        warped = _warp_masked(f2[lvl], up_flow * _FLOW_SCALE[lvl])
        corr = layers.leaky_relu(correlation(f1[lvl], warped), 0.1)
        x_in = jnp.concatenate([corr, f1[lvl], up_flow, up_feat], axis=-1)
        x, flow = _decoder_level(params, lvl, x_in)
        up_flow = _deconv(params[f"deconv{lvl}"], flow)
        up_feat = _deconv(params[f"upfeat{lvl}"], x)

    warped = _warp_masked(f2[2], up_flow * _FLOW_SCALE[2])
    corr = layers.leaky_relu(correlation(f1[2], warped), 0.1)
    x_in = jnp.concatenate([corr, f1[2], up_flow, up_feat], axis=-1)
    x, flow2 = _decoder_level(params, 2, x_in)

    # dilated context refinement (:127-133, :304-305)
    h = x
    for i, d in enumerate((1, 2, 4, 8, 16, 1)):
        h = _conv_lrelu(params[f"dc_conv{i + 1}"], h, dilation=d)
    flow2 = flow2 + layers.conv2d(params["dc_conv7"], h, padding=1)
    return flow2
