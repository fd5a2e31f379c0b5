"""SuperSloMo — arbitrary-time flow interpolation.

Reference: ``/root/reference/superslomo/model.py``. Two UNets:
  * ``flowComp``        UNet(6→4): bidirectional flow F_0_1 / F_1_0 (:584-586)
  * ``arbTimeFlowIntrp``UNet(20→5): flow refinement + visibility map (:598-620)

UNet topology (:457-544): conv7×7 ×2 (32ch) → 5 ``down`` blocks (avg-pool +
double conv, filter sizes 5,3,3,3,3; 64→512) → 5 ``up`` blocks (bilinear ×2 +
conv + skip-concat conv) → conv3×3 head; all LeakyReLU(0.1) **including the
output head** (:543).

Time-indexed coefficients over t = linspace(0.125, 0.875, 7) (:306-379);
default ind=3 → t=0.5. Backward warp uses the ``2*(x/W−0.5)`` normalization
with align_corners=False — the same half-pixel-shift convention as RRIN
(:294-302), served by ops/warp.backward_warp_rrin.

Input is mean-subtracted (0.429, 0.431, 0.397) upstream (registry).
Returns ``(Ft_p, aux)`` where aux feeds the composite ``Super`` loss
(core/losses.superslomo_loss). Pad-to-×64 reflect (:567-575).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import layers
from .cain import _xavier_conv
from ..ops import warp as warp_ops
from .layers import Params

T_VALUES = np.linspace(0.125, 0.875, 7)


def _init_down(rng, in_ch, out_ch, k) -> Params:
    r1, r2 = jax.random.split(rng)
    return {"conv1": _xavier_conv(r1, in_ch, out_ch, k),
            "conv2": _xavier_conv(r2, out_ch, out_ch, k)}


def _init_up(rng, in_ch, out_ch) -> Params:
    r1, r2 = jax.random.split(rng)
    return {"conv1": _xavier_conv(r1, in_ch, out_ch, 3),
            "conv2": _xavier_conv(r2, 2 * out_ch, out_ch, 3)}


def _init_unet(rng, in_ch, out_ch) -> Params:
    rngs = jax.random.split(rng, 13)
    return {
        "conv1": _xavier_conv(rngs[0], in_ch, 32, 7),
        "conv2": _xavier_conv(rngs[1], 32, 32, 7),
        "down1": _init_down(rngs[2], 32, 64, 5),
        "down2": _init_down(rngs[3], 64, 128, 3),
        "down3": _init_down(rngs[4], 128, 256, 3),
        "down4": _init_down(rngs[5], 256, 512, 3),
        "down5": _init_down(rngs[6], 512, 512, 3),
        "up1": _init_up(rngs[7], 512, 512),
        "up2": _init_up(rngs[8], 512, 256),
        "up3": _init_up(rngs[9], 256, 128),
        "up4": _init_up(rngs[10], 128, 64),
        "up5": _init_up(rngs[11], 64, 32),
        "conv3": _xavier_conv(rngs[12], 32, out_ch, 3),
    }


def init(rng: jax.Array, **_kw) -> Params:
    r_fc, r_at = jax.random.split(rng)
    return {"flowComp": _init_unet(r_fc, 6, 4),
            "arbTimeFlowIntrp": _init_unet(r_at, 20, 5)}


def _down(p, x, k):
    x = layers.avg_pool(x, 2)
    x = layers.leaky_relu(layers.conv2d(p["conv1"], x, padding=k // 2), 0.1)
    x = layers.leaky_relu(layers.conv2d(p["conv2"], x, padding=k // 2), 0.1)
    return x


def _up(p, x, skip):
    x = layers.upsample_bilinear(x, 2, align_corners=False)
    x = layers.leaky_relu(layers.conv2d(p["conv1"], x, padding=1), 0.1)
    x = jnp.concatenate([x, skip], axis=-1)
    x = layers.leaky_relu(layers.conv2d(p["conv2"], x, padding=1), 0.1)
    return x


def _unet(p: Params, x):
    x = layers.leaky_relu(layers.conv2d(p["conv1"], x, padding=3), 0.1)
    s1 = layers.leaky_relu(layers.conv2d(p["conv2"], x, padding=3), 0.1)
    s2 = _down(p["down1"], s1, 5)
    s3 = _down(p["down2"], s2, 3)
    s4 = _down(p["down3"], s3, 3)
    s5 = _down(p["down4"], s4, 3)
    x = _down(p["down5"], s5, 3)
    x = _up(p["up1"], x, s5)
    x = _up(p["up2"], x, s4)
    x = _up(p["up3"], x, s3)
    x = _up(p["up4"], x, s2)
    x = _up(p["up5"], x, s1)
    return layers.leaky_relu(layers.conv2d(p["conv3"], x, padding=1), 0.1)


def apply(params: Params, frame0: jnp.ndarray, frame1: jnp.ndarray,
          ind: int = 3, warp_range=None, **_kw) -> Tuple[jnp.ndarray, Dict]:
    t = float(T_VALUES[ind])
    I0, pads = layers.pad_to_multiple(frame0, 64)
    I1, _ = layers.pad_to_multiple(frame1, 64)

    flow_out = _unet(params["flowComp"], jnp.concatenate([I0, I1], axis=-1))
    F01 = flow_out[..., :2]
    F10 = flow_out[..., 2:]

    # flow coefficients (:310-344): C00=C11=−(1−t)t, C01=t², C10=(1−t)²
    c00 = c11 = -(1 - t) * t
    c01 = t * t
    c10 = (1 - t) * (1 - t)
    F_t0 = c00 * F01 + c01 * F10
    F_t1 = c10 * F01 + c11 * F10

    def bw(im, fl):  # same grid convention as RRIN (:294-302)
        return warp_ops.backward_warp_rrin(im, fl, warp_range=warp_range)
    g_I0_t0 = bw(I0, F_t0)
    g_I1_t1 = bw(I1, F_t1)

    intrp = _unet(params["arbTimeFlowIntrp"], jnp.concatenate(
        [I0, I1, F01, F10, F_t1, F_t0, g_I1_t1, g_I0_t0], axis=-1))
    F_t0_f = intrp[..., :2] + F_t0
    F_t1_f = intrp[..., 2:4] + F_t1
    V_t0 = jax.nn.sigmoid(intrp[..., 4:5])
    V_t1 = 1.0 - V_t0

    g_I0_f = bw(I0, F_t0_f)
    g_I1_f = bw(I1, F_t1_f)

    w0, w1 = 1 - t, t
    Ft_p = (w0 * V_t0 * g_I0_f + w1 * V_t1 * g_I1_f) / (
        w0 * V_t0 + w1 * V_t1)

    warped_I0 = bw(I0, F10)
    warped_I1 = bw(I1, F01)

    unpad = lambda x: layers.unpad(x, pads)
    aux = {
        "bidirectional_flow": (unpad(F01), unpad(F10)),
        "warped_intermediate_frames": (unpad(g_I0_t0), unpad(g_I1_t1)),
        "warped_input_frames": (unpad(warped_I0), unpad(warped_I1)),
    }
    return unpad(Ft_p), aux
