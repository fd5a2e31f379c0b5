"""MegaDepth HourGlass depth network — spec-interpreted.

Reference: ``/root/reference/dain/MegaDepth/pytorch_DIW_scratch.py`` (761
lines of machine-generated nested torch7-converted modules: conv7×7 stem →
4-level nested hourglass of inception blocks (Concat reduces) with
residual adds (CAddTable), → conv3×3 → 1-channel log-depth).

Rather than hand-transcribing 779 parameters' worth of wiring, the torch
module tree was walked once into ``hourglass_spec.json`` — a JSON op tree of
{conv, bn, relu, maxpool, upsample, seq, parallel, reduce(cat|add)} nodes.
This module interprets the spec functionally; the params tree uses the same
numeric Sequential indices as the torch ``state_dict``, so the released
``best_generalization_net_G.pth`` converts mechanically
(core/checkpoint.torch_state_dict_to_pytree).

BN semantics: eval-mode (stored running stats) — DAIN freezes everything
but its rectify net during meta-training, and released-weight inference is
the parity target.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .. import layers
from ..layers import Params

_SPEC_PATH = os.path.join(os.path.dirname(__file__), "hourglass_spec.json")


@functools.lru_cache(maxsize=1)
def spec() -> Dict[str, Any]:
    with open(_SPEC_PATH) as f:
        return json.load(f)


def _init_node(rng, node) -> Params:
    op = node["op"]
    if op == "conv":
        kh, kw = node["k"]
        # the reference applies no explicit init to the depth net (DAIN's
        # _initialize_weights runs before depthNet is constructed), so torch
        # Conv2d defaults apply — matched via layers.conv_init. NOTE:
        # random-init log-depth magnitudes still explode through the ~30
        # nested inception levels (reference-identical); real use loads the
        # released MegaDepth weights.
        from .. import layers as L
        return L.conv_init(rng, node["in"], node["out"], (kh, kw),
                           bias=node.get("bias", True))
    if op == "bn":
        ch = node["ch"]
        p = {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}
        if node["affine"]:
            p["scale"] = jnp.ones((ch,))
            p["bias"] = jnp.zeros((ch,))
        return p
    if op in ("seq", "parallel", "reduce"):
        mods = node["mods"]
        rngs = jax.random.split(rng, max(1, len(mods)))
        out = {}
        for i, child in enumerate(mods):
            cp = _init_node(rngs[i], child)
            if cp:
                out[str(i)] = cp
        return out
    return {}


def init(rng: jax.Array) -> Params:
    return _init_node(rng, spec())


def _bn(p: Params, x, eps: float) -> jnp.ndarray:
    inv = jax.lax.rsqrt(p["var"].astype(x.dtype) + eps)
    out = (x - p["mean"].astype(x.dtype)) * inv
    if "scale" in p:
        out = out * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return out


def _apply_node(p: Params, node, x):
    op = node["op"]
    if op == "conv":
        pad = node["p"]
        return layers.conv2d(p, x, stride=node["s"][0],
                             padding=((pad[0], pad[0]), (pad[1], pad[1])))
    if op == "bn":
        return _bn(p, x, node.get("eps", 1e-5))
    if op == "relu":
        return jax.nn.relu(x)
    if op == "maxpool":
        k = node["k"]
        k = k[0] if isinstance(k, list) else k
        return layers.max_pool(x, k)
    if op == "avgpool":
        k = node["k"]
        k = k[0] if isinstance(k, list) else k
        return layers.avg_pool(x, k)
    if op == "upsample":
        # torch7-converted Upsample(mode='nearest') in this graph
        s = int(node["scale"])
        if node["mode"] == "nearest":
            return jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
        return layers.upsample_bilinear(x, s, align_corners=False)
    if op == "seq":
        for i, child in enumerate(node["mods"]):
            x = _apply_node(p.get(str(i), {}) if p else {}, child, x)
        return x
    if op == "parallel":
        return [_apply_node(p.get(str(i), {}) if p else {}, child, x)
                for i, child in enumerate(node["mods"])]
    if op == "reduce":
        if node["mods"]:
            outs = [_apply_node(p.get(str(i), {}) if p else {}, child, x)
                    for i, child in enumerate(node["mods"])]
        else:
            outs = x  # consumes the list emitted by a preceding 'parallel'
        if node["fn"] == "cat":
            return jnp.concatenate(outs, axis=-1)
        acc = outs[0]
        for o in outs[1:]:
            acc = acc + o
        return acc
    raise ValueError(f"unknown op {op!r}")


def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (N, H, W, 3) → (N, H, W, 1) log depth."""
    return _apply_node(params, spec(), x)
