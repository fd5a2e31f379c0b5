"""AdaptiveWeightInterpolation op family (the §2.4 'extras').

Reference: ``/root/reference/dain/my_package/FilterInterpolation/
FilterInterpolationLayer.py:82-533`` (WeightLayer, PixelValueLayer,
PixelWeightLayer, ReliableWeightLayer) composed by
``AdaptiveWeightInterpolationModule``
(``FilterInterpolationModule.py:25-150``). These layers are unused by
DAIN's active path, and the snapshot ships ONLY their Python dispatch
shells: the pybind module registers no ``WeightLayer_*`` entry points
(``filterinterpolation_cuda.cc:168-171``) and the kernel file contains no
such kernels — upstream they cannot execute at all. The semantics below
are therefore reconstructed from the module's dataflow (the shapes, the
normalization ``p/(pw+eps)``, the reliability ``pw/(rw+eps)``, and the
parameter names), which is the classic adaptive weighted forward-splatting
of MEMC-Net-style interpolation:

  * :func:`weight_layer` — per-source-pixel flow confidence in (0, 1]:
    brightness-constancy error of I1(x) vs I2(x + f(x)) (bilinear sample)
    through exp(−(e/λ_e)²), optionally damped by the local flow variance
    over an Nw×Nw window times λ_v.
  * :func:`pixel_value_layer` — forward-splat of ``flow_weight · I1`` to
    the target grid: each source pixel lands at x + f(x) and deposits into
    the (2·Prowindow)² integer neighbors with gaussian spatial taps
    exp(−d²/(2σ_d²)).
  * :func:`pixel_weight_layer` — the matching denominator: splat of the
    flow weights alone.
  * :func:`reliable_weight_layer` — coverage denominator: splat of ones.

TPU formulation: ``.at[].add`` scatter-adds (deterministic, race-free, and
autodiff gives the scatter-add VJP for free — the reference hand-writes
backward kernels that do not exist in this snapshot).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_sample(img: jnp.ndarray, x2: jnp.ndarray, y2: jnp.ndarray):
    """Sample img (N,H,W,C) at float coords (x2, y2), zero outside."""
    n, h, w, c = img.shape
    valid = (x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1)
    x0 = jnp.clip(jnp.floor(x2).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y2).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    ax = (x2 - x0.astype(x2.dtype))[..., None]
    ay = (y2 - y0.astype(y2.dtype))[..., None]
    b = jnp.arange(n)[:, None, None] * jnp.ones((1,) + x0.shape[1:],
                                                jnp.int32)
    v = (img[b, y0, x0] * (1 - ax) * (1 - ay)
         + img[b, y0, x1] * ax * (1 - ay)
         + img[b, y1, x0] * (1 - ax) * ay
         + img[b, y1, x1] * ax * ay)
    return jnp.where(valid[..., None], v, 0.0)


def weight_layer(img1: jnp.ndarray, img2: jnp.ndarray, flow1: jnp.ndarray,
                 lambda_e: float = 30.0 / 255.0, lambda_v: float = 1.0,
                 nw: int = 3) -> jnp.ndarray:
    """Flow-confidence weights (N, H, W, 1) in (0, 1].

    w(x) = exp(−(e(x)/λ_e)² − λ_v · var_Nw(f)(x)) with e the mean-abs
    brightness-constancy error |I1(x) − I2(x + f(x))| and var_Nw the local
    flow variance over an Nw×Nw window (the module's commented-out
    flow-gradient term, FilterInterpolationModule.py:66-70, plays this
    smoothness role).
    """
    n, h, w, _ = img1.shape
    xs = jnp.arange(w, dtype=flow1.dtype)[None, None, :]
    ys = jnp.arange(h, dtype=flow1.dtype)[None, :, None]
    warped = _bilinear_sample(img2, xs + flow1[..., 0], ys + flow1[..., 1])
    err = jnp.mean(jnp.abs(img1 - warped), axis=-1, keepdims=True)
    val = (err / lambda_e) ** 2
    if lambda_v > 0 and nw > 1:
        pad = nw // 2
        fpad = jnp.pad(flow1, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                       mode="edge")
        win = jnp.stack([fpad[:, dy:dy + h, dx:dx + w]
                         for dy in range(nw) for dx in range(nw)])
        var = jnp.mean(jnp.var(win, axis=0), axis=-1, keepdims=True)
        val = val + lambda_v * var
    return jnp.exp(-val)


def _splat(values: Optional[jnp.ndarray], flow: jnp.ndarray,
           flow_weights: Optional[jnp.ndarray], sigma_d: float,
           prowindow: int) -> jnp.ndarray:
    """Gaussian forward-splat Σ_x g(z − x − f(x)) · fw(x) · v(x) onto grid
    position z, over integer offsets within ±prowindow of the landing
    point. values None → splat the weights alone (denominators)."""
    n, h, w, _ = flow.shape
    dtype = flow.dtype
    xs = jnp.arange(w, dtype=dtype)[None, None, :]
    ys = jnp.arange(h, dtype=dtype)[None, :, None]
    x2 = xs + flow[..., 0]
    y2 = ys + flow[..., 1]
    valid = (x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1)
    fw = (flow_weights[..., 0] if flow_weights is not None
          else jnp.ones_like(x2))
    fw = jnp.where(valid, fw, 0.0)

    ix0 = jnp.clip(jnp.floor(x2).astype(jnp.int32), 0, w - 1)
    iy0 = jnp.clip(jnp.floor(y2).astype(jnp.int32), 0, h - 1)
    c = values.shape[-1] if values is not None else 1
    acc = jnp.zeros((n, h, w, c), dtype)
    b = jnp.arange(n)[:, None, None] * jnp.ones((1, h, w), jnp.int32)
    inv2s2 = 1.0 / (2.0 * sigma_d * sigma_d)
    for dy in range(-prowindow + 1, prowindow + 1):
        for dx in range(-prowindow + 1, prowindow + 1):
            iz_x = ix0 + dx
            iz_y = iy0 + dy
            inb = ((iz_x >= 0) & (iz_x < w) & (iz_y >= 0) & (iz_y < h))
            d2 = ((iz_x.astype(dtype) - x2) ** 2
                  + (iz_y.astype(dtype) - y2) ** 2)
            g = jnp.exp(-d2 * inv2s2) * fw * inb.astype(dtype)
            contrib = (values * g[..., None] if values is not None
                       else g[..., None])
            acc = acc.at[b, jnp.clip(iz_y, 0, h - 1),
                         jnp.clip(iz_x, 0, w - 1)].add(contrib)
    return acc


def pixel_value_layer(img1: jnp.ndarray, flow1: jnp.ndarray,
                      flow_weights: jnp.ndarray, sigma_d: float = 1.5,
                      tao_r: float = 0.05, prowindow: int = 2) -> jnp.ndarray:
    """Weighted forward-splat of the image → (N, H, W, C) accumulated
    color. ``tao_r`` is accepted for signature parity; the reference marks
    it 'maybe not useable' (FilterInterpolationLayer.py:174) and the
    dispatch shell never consumes it host-side."""
    del tao_r
    return _splat(img1, flow1, flow_weights, sigma_d, prowindow)


def pixel_weight_layer(flow1: jnp.ndarray, flow_weights: jnp.ndarray,
                       sigma_d: float = 1.5, tao_r: float = 0.05,
                       prowindow: int = 2) -> jnp.ndarray:
    """Splat of the flow weights alone → (N, H, W, 1) denominator."""
    del tao_r
    return _splat(None, flow1, flow_weights, sigma_d, prowindow)


def reliable_weight_layer(flow1: jnp.ndarray, sigma_d: float = 1.5,
                          tao_r: float = 0.05,
                          prowindow: int = 2) -> jnp.ndarray:
    """Splat of ones → (N, H, W, 1) coverage / reliability denominator."""
    del tao_r
    return _splat(None, flow1, None, sigma_d, prowindow)


def adaptive_weight_interpolation(img1: jnp.ndarray, img2: jnp.ndarray,
                                  flow1: jnp.ndarray, flow2: jnp.ndarray,
                                  training: bool = False,
                                  threshold: float = 1e-6,
                                  lambda_e: float = 30.0 / 255.0,
                                  lambda_v: float = 1.0, nw: int = 3,
                                  sigma_d: float = 1.5, tao_r: float = 0.05,
                                  prowindow: int = 2) -> jnp.ndarray:
    """AdaptiveWeightInterpolationModule.forward
    (FilterInterpolationModule.py:62-150): splat both frames along their
    flows, normalize each by its splatted weight, blend by reliability
    w_i = pw_i / (rw_i + ε); eval zeroes pixels with w ≤ 10ε."""
    fw1 = weight_layer(img1, img2, flow1, lambda_e, lambda_v, nw)
    p1 = pixel_value_layer(img1, flow1, fw1, sigma_d, tao_r, prowindow)
    pw1 = pixel_weight_layer(flow1, fw1, sigma_d, tao_r, prowindow)
    i1 = p1 / (pw1 + threshold)
    rw1 = reliable_weight_layer(flow1, sigma_d, tao_r, prowindow)
    w1 = pw1 / (rw1 + threshold)

    fw2 = weight_layer(img2, img1, flow2, lambda_e, lambda_v, nw)
    p2 = pixel_value_layer(img2, flow2, fw2, sigma_d, tao_r, prowindow)
    pw2 = pixel_weight_layer(flow2, fw2, sigma_d, tao_r, prowindow)
    i2 = p2 / (pw2 + threshold)
    rw2 = reliable_weight_layer(flow2, sigma_d, tao_r, prowindow)
    w2 = pw2 / (rw2 + threshold)

    wsum = w1 + w2
    out = (i1 * w1 + i2 * w2) / (wsum + threshold)
    if not training:
        out = jnp.where(wsum <= 10 * threshold, 0.0, out)
    return out
