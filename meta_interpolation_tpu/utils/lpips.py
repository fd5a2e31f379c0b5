"""LPIPS (AlexNet variant) — learned perceptual metric.

Reference hook: ``/root/reference/utils.py:207-211`` (``evaluate_lpips``,
gated by ``--lpips``) imports the external ``lpips`` package. This is a
jax port of that package's alex configuration
(richzhang/PerceptualSimilarity):

  scale inputs ([-1,1]) by the fixed shift/scale layer → torchvision
  AlexNet ``features`` → collect the 5 post-ReLU feature maps →
  channel-unit-normalize → squared difference → per-layer learned 1×1
  'lin' weights → spatial mean → sum over layers.

Weights (zero egress — cannot be downloaded here) are searched on the
same path as the VGG perceptual weights (core/losses.py):
``alexnet_features.pth`` (``torchvision.models.alexnet(pretrained=True)
.features.state_dict()``) and ``lpips_alex_lins.pth`` (the ``lpips``
package's ``LPIPS(net='alex')`` lin state_dict). Without them the metric
runs on random-init features with a loud warning — structurally correct,
numerically not the published metric.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

# torchvision alexnet().features flat layout; lpips collects features
# after the ReLUs at module indices 1, 4, 7, 9, 11
# (kind, out_ch, ksize, stride, pad)
_ALEX_LAYERS: List[Tuple[str, int, int, int, int]] = [
    ("conv", 64, 11, 4, 2), ("relu", 0, 0, 0, 0), ("pool", 0, 3, 2, 0),
    ("conv", 192, 5, 1, 2), ("relu", 0, 0, 0, 0), ("pool", 0, 3, 2, 0),
    ("conv", 384, 3, 1, 1), ("relu", 0, 0, 0, 0),
    ("conv", 256, 3, 1, 1), ("relu", 0, 0, 0, 0),
    ("conv", 256, 3, 1, 1), ("relu", 0, 0, 0, 0), ("pool", 0, 3, 2, 0),
]
_FEATURE_IDXS = (1, 4, 7, 9, 11)
_LIN_CHANNELS = (64, 192, 384, 256, 256)
# lpips ScalingLayer constants (lpips/lpips.py)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


def init_params(rng: jax.Array) -> Dict[str, Any]:
    """He-init fallback (random features — see module docstring)."""
    params: Dict[str, Any] = {"convs": {}, "lins": {}}
    in_ch = 3
    conv_i = 0
    for kind, out_ch, k, _s, _p in _ALEX_LAYERS:
        if kind != "conv":
            continue
        rng, r = jax.random.split(rng)
        fan_in = k * k * in_ch
        params["convs"][str(conv_i)] = {
            "kernel": jax.random.normal(r, (k, k, in_ch, out_ch))
            * jnp.sqrt(2.0 / fan_in),
            "bias": jnp.zeros((out_ch,))}
        conv_i += 1
        in_ch = out_ch
    for i, ch in enumerate(_LIN_CHANNELS):
        rng, r = jax.random.split(rng)
        params["lins"][str(i)] = jnp.abs(
            jax.random.normal(r, (ch,)) / ch)
    return params


def load_alexnet_from_torch_state(state_dict) -> Dict[str, Any]:
    """Convert torchvision ``alexnet().features.state_dict()``."""
    import numpy as np
    convs = {}
    conv_i = 0
    for idx, (kind, *_rest) in enumerate(_ALEX_LAYERS):
        if kind != "conv":
            continue
        w = np.asarray(state_dict[f"{idx}.weight"])
        b = np.asarray(state_dict[f"{idx}.bias"])
        convs[str(conv_i)] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                              "bias": jnp.asarray(b)}
        conv_i += 1
    return convs


def load_lins_from_torch_state(state_dict) -> Dict[str, Any]:
    """Convert the lpips package's lin weights
    (``lin{i}.model.1.weight`` shaped (1, C, 1, 1))."""
    import numpy as np
    lins = {}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in state_dict:
                w = np.asarray(state_dict[key])
                lins[str(i)] = jnp.asarray(w.reshape(-1))
                break
    missing = [i for i in range(5) if str(i) not in lins]
    if missing:
        # fail at load time with the file's actual key layout — a partial
        # dict would KeyError later inside the first jitted lpips() trace,
        # far from the cause
        raise ValueError(
            f"lins state_dict is missing lin weights for layers {missing}; "
            f"expected lin{{i}}.model.1.weight or lins.{{i}}.model.1.weight "
            f"(got keys like {sorted(state_dict)[:4]})")
    return lins


def load_pretrained() -> Optional[Dict[str, Any]]:
    """Search the shared weights path; None (with a warning) if absent."""
    from ..core import checkpoint as ckpt_lib
    from ..core.losses import find_pretrained_vgg
    alex_path = find_pretrained_vgg("alexnet_features")
    lins_path = find_pretrained_vgg("lpips_alex_lins")
    if alex_path is None or lins_path is None:
        import sys
        print(
            "[lpips] WARNING: pretrained alexnet_features.pth / "
            "lpips_alex_lins.pth not found on the weights search path — "
            "LPIPS runs on RANDOM-INIT features (not the published "
            "metric). See core/losses.py VGG_WEIGHTS_ENV.",
            file=sys.stderr, flush=True)
        return None
    convs = load_alexnet_from_torch_state(
        ckpt_lib.load_torch_file(alex_path))
    try:
        lins = load_lins_from_torch_state(ckpt_lib.load_torch_file(lins_path))
    except ValueError as e:
        import sys
        print(f"[lpips] WARNING: {lins_path} unusable ({e}); LPIPS runs "
              f"on RANDOM-INIT lins.", file=sys.stderr, flush=True)
        return None
    print(f"[lpips] loaded {alex_path} + {lins_path}")
    return {"convs": convs, "lins": lins}


def _features(convs: Dict[str, Any], x: jnp.ndarray) -> List[jnp.ndarray]:
    feats = []
    conv_i = 0
    for idx, (kind, _oc, k, s, p) in enumerate(_ALEX_LAYERS):
        if kind == "conv":
            w = convs[str(conv_i)]["kernel"]
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + convs[str(conv_i)]["bias"]
            conv_i += 1
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:  # pool k=3 s=2
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, k, k, 1), (1, s, s, 1), "VALID")
        if idx in _FEATURE_IDXS:
            feats.append(x)
    return feats


def lpips(params: Dict[str, Any], img0: jnp.ndarray,
          img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per batch element. NHWC inputs in [0, 1]."""
    def prep(x):
        x = 2.0 * x - 1.0  # lpips expects [-1, 1]
        return (x - _SHIFT) / _SCALE

    f0 = _features(params["convs"], prep(img0))
    f1 = _features(params["convs"], prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        nb = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        d2 = (na - nb) ** 2
        w = params["lins"][str(i)]
        total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(1, 2))
    return total
