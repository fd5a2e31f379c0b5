"""PSNR/SSIM parity tests against independent numpy/scipy references.

The reference's metric definitions (utils.py:171-204,
pytorch_msssim/__init__.py:19-75) are re-derived here in pure numpy — not
imported — and our jnp implementations must match them.
"""
import numpy as np
import jax.numpy as jnp

from meta_interpolation_tpu.core import metrics


def _np_gaussian(n=11, sigma=1.5):
    xs = np.arange(n)
    g = np.exp(-((xs - n // 2) ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _np_ssim(a, b, L=255.0):
    """Valid-conv gaussian-window SSIM, single image HWC, numpy."""
    win = _np_gaussian()
    w2d = np.outer(win, win)

    def filt(img):
        h, w, c = img.shape
        kh, kw = 11, 11
        out = np.zeros((h - 10, w - 10, c))
        for ci in range(c):
            for i in range(h - 10):
                for j in range(w - 10):
                    out[i, j, ci] = np.sum(img[i:i + kh, j:j + kw, ci] * w2d)
        return out

    mu1, mu2 = filt(a), filt(b)
    s1 = filt(a * a) - mu1 ** 2
    s2 = filt(b * b) - mu2 ** 2
    s12 = filt(a * b) - mu1 * mu2
    c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)
    return np.mean(num / den)


def test_psnr_matches_definition():
    rng = np.random.RandomState(0)
    pred = rng.rand(1, 16, 16, 3).astype(np.float32)
    gt = np.clip(pred + 0.05 * rng.randn(1, 16, 16, 3).astype(np.float32), 0, 1)
    q_pred = np.round(np.clip(pred * 255, 0, 255))
    q_gt = np.round(np.clip(gt * 255, 0, 255))
    mse = np.mean(((q_pred - q_gt) / 255.0) ** 2) + 1e-8
    expected = -10 * np.log10(mse)
    psnr, _ = metrics.calc_metrics(jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_allclose(float(psnr), expected, rtol=1e-5)


def test_psnr_identical_images_finite():
    x = jnp.ones((1, 16, 16, 3)) * 0.5
    psnr, ssim = metrics.calc_metrics(x, x)
    assert np.isfinite(float(psnr))  # the +1e-8 guard (utils.py:184)
    np.testing.assert_allclose(float(psnr), 80.0, atol=1e-3)
    np.testing.assert_allclose(float(ssim), 1.0, atol=1e-5)


def test_ssim_matches_numpy_reference():
    rng = np.random.RandomState(1)
    a = rng.rand(20, 20, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(20, 20, 3).astype(np.float32), 0, 1)
    qa = np.round(a * 255)
    qb = np.round(np.clip(b, 0, 1) * 255)
    expected = _np_ssim(qa, qb)
    got = metrics.ssim(jnp.asarray(qa)[None], jnp.asarray(qb)[None],
                       val_range=255.0)
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_quantize_rounds_and_clamps():
    x = jnp.asarray([[-0.1, 0.5, 1.2]])
    q = metrics.quantize(x, 1.0)
    np.testing.assert_array_equal(np.asarray(q), [[0.0, 128.0, 255.0]])


def test_msssim_range():
    rng = np.random.RandomState(2)
    a = rng.rand(1, 180, 180, 3).astype(np.float32) * 255
    v = metrics.msssim(jnp.asarray(a), jnp.asarray(a), val_range=255.0)
    np.testing.assert_allclose(float(v), 1.0, atol=1e-4)


def test_ssim_matches_reference_torch_auto_range_and_shrink():
    """val_range=None auto-detection and the min(window,H,W) shrink must
    match the reference pytorch_msssim.ssim exactly (torch oracle)."""
    import sys
    import torch
    sys.path.insert(0, "/root/reference")
    from pytorch_msssim import ssim as ref_ssim

    rng = np.random.RandomState(5)
    # mean-shifted space: min < -0.5 => L = 2 in the reference
    a = (rng.rand(1, 24, 24, 3).astype(np.float32) * 2 - 1)
    b = np.clip(a + 0.2 * rng.randn(1, 24, 24, 3).astype(np.float32), -1, 1)
    ta = torch.from_numpy(a.transpose(0, 3, 1, 2))
    tb = torch.from_numpy(b.transpose(0, 3, 1, 2))
    expected = float(ref_ssim(ta, tb, val_range=None))
    got = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b), val_range=None))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # sub-11px input: the reference shrinks the window instead of crashing
    s = (rng.rand(1, 7, 9, 3).astype(np.float32))
    s2 = np.clip(s + 0.1 * rng.randn(1, 7, 9, 3).astype(np.float32), 0, 1)
    ts, ts2 = (torch.from_numpy(x.transpose(0, 3, 1, 2)) for x in (s, s2))
    expected_small = float(ref_ssim(ts, ts2, val_range=1.0))
    got_small = float(metrics.ssim(jnp.asarray(s), jnp.asarray(s2),
                                   val_range=1.0))
    np.testing.assert_allclose(got_small, expected_small, rtol=1e-5)
