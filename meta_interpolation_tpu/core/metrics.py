"""Image quality metrics — PSNR / SSIM, exact parity with the reference.

Reference semantics (``/root/reference/utils.py:171-204``):
  * quantize both prediction and GT to 0..255 with round() and clamp first;
  * PSNR = -10 log10(mean(((p-g)/255)^2) + 1e-8)   (the +1e-8 guards mse==0);
  * SSIM uses an 11x11 gaussian window (sigma=1.5), **no padding** (valid
    conv), val_range=255, C1=(0.01*255)^2, C2=(0.03*255)^2, full-map mean
    (``/root/reference/pytorch_msssim/__init__.py:19-75``).

All functions are pure jnp over NHWC arrays and jit/vmap-friendly.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def quantize(img: jnp.ndarray, rgb_range: float = 1.0) -> jnp.ndarray:
    """Map [0, rgb_range] image to quantized 0..255 (utils.py:171-172)."""
    return jnp.round(jnp.clip(img * (255.0 / rgb_range), 0.0, 255.0))


def psnr_from_quantized(pred255: jnp.ndarray, gt255: jnp.ndarray) -> jnp.ndarray:
    """PSNR over 0-255-quantized inputs (utils.py:175-186)."""
    diff = (pred255 - gt255) / 255.0
    mse = jnp.mean(diff * diff) + 1e-8
    return -10.0 * jnp.log10(mse)


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Normalized 1-D gaussian (pytorch_msssim/__init__.py:7-9)."""
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return g


def _window_filter(img: jnp.ndarray, win1d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable valid-conv with the gaussian window. NHWC.

    precision=HIGHEST is load-bearing ON TPU: the default lowers f32
    convs to bf16 passes, and SSIM's variance terms are catastrophic
    cancellations (E[x²] − μ² ≈ units against terms ≈ 16000 at 0-255
    scale) — measured on-chip SSIM came out > 1.1 before pinning this
    (round-4 pareto run). CPU tests never see it (conftest forces
    highest globally), so keep the pin here, next to the math it guards.
    """
    k = win1d.shape[0]
    c = img.shape[-1]
    # separable: H pass then W pass; depthwise via feature_group_count=C
    kh = jnp.broadcast_to(win1d.reshape(k, 1, 1, 1), (k, 1, 1, c))
    kw = jnp.broadcast_to(win1d.reshape(1, k, 1, 1), (1, k, 1, c))
    hp = jax.lax.Precision.HIGHEST
    dn = jax.lax.conv_dimension_numbers(img.shape, (k, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), "VALID",
                                       dimension_numbers=dn, feature_group_count=c,
                                       precision=hp)
    dn2 = jax.lax.conv_dimension_numbers(out.shape, (1, k, 1, c), ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), "VALID",
                                       dimension_numbers=dn2, feature_group_count=c,
                                       precision=hp)
    return out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, val_range=255.0,
         window_size: int = 11) -> jnp.ndarray:
    """SSIM, NHWC batched, scalar mean (pytorch_msssim/__init__.py:19-75).

    Matches the reference: no padding (valid conv), sigma=1.5, mean over the
    whole valid map.
    """
    return ssim_full(img1, img2, val_range, window_size)[0]


def ssim_full(img1, img2, val_range=255.0, window_size=11):
    """SSIM returning (ssim, contrast_sensitivity) for MS-SSIM.

    ``val_range=None`` reproduces the reference's data-driven range
    detection (pytorch_msssim/__init__.py:21-31: L = (255 if max>128
    else 1) − (−1 if min<−0.5 else 0)) — the semantics the reference
    SSIM *loss* runs with, since its class never forwards val_range.
    The window also shrinks to min(window_size, H, W) (:36-37) so
    sub-11px inputs compute instead of crashing."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    if val_range is None:
        max_val = jnp.where(jnp.max(img1) > 128, 255.0, 1.0)
        min_val = jnp.where(jnp.min(img1) < -0.5, -1.0, 0.0)
        val_range = max_val - min_val
    h, w = img1.shape[1], img1.shape[2]
    win = jnp.asarray(_gaussian_window(min(window_size, h, w)))
    mu1 = _window_filter(img1, win)
    mu2 = _window_filter(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _window_filter(img1 * img1, win) - mu1_sq
    sigma2_sq = _window_filter(img2 * img2, win) - mu2_sq
    sigma12 = _window_filter(img1 * img2, win) - mu1_mu2
    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2.0 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    return jnp.mean(ssim_map), cs


def msssim(img1, img2, val_range=255.0, window_size=11, normalize=False):
    """Multi-scale SSIM (pytorch_msssim/__init__.py:78-104)."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], jnp.float32)
    mssim, mcs = [], []
    for _ in range(weights.shape[0]):
        s, cs = ssim_full(img1, img2, val_range=val_range, window_size=window_size)
        mssim.append(s)
        mcs.append(cs)
        img1 = jax.lax.reduce_window(img1, 0.0, jax.lax.add, (1, 2, 2, 1),
                                     (1, 2, 2, 1), "VALID") / 4.0
        img2 = jax.lax.reduce_window(img2, 0.0, jax.lax.add, (1, 2, 2, 1),
                                     (1, 2, 2, 1), "VALID") / 4.0
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if normalize:
        mssim = (mssim + 1) / 2
        mcs = (mcs + 1) / 2
    pow1 = mcs ** weights
    pow2 = mssim ** weights
    return jnp.prod(pow1[:-1] * pow2[-1])


def calc_metrics(pred: jnp.ndarray, gt: jnp.ndarray):
    """Quantize then compute (PSNR, SSIM) — reference utils.py:195-204.

    ``pred``/``gt``: NHWC in [0, 1].
    """
    if pred.ndim == 3:
        pred = pred[None]
        gt = gt[None]
    q_pred = quantize(pred, 1.0)
    q_gt = quantize(gt, 1.0)
    return psnr_from_quantized(q_pred, q_gt), ssim(q_pred, q_gt, val_range=255.0)
