"""Tests for the remaining §2.4 op variants."""
import jax
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.ops.flow_projection import min_depth_flow_projection
from meta_interpolation_tpu.ops.sepconv import separable_conv_flow


def test_min_depth_projection_nearest_wins():
    """Two sources land in the same cell; the one with larger inverse depth
    (nearer) must win outright."""
    flow = np.zeros((1, 4, 4, 2), np.float32)
    flow[0, 0, 0] = [1.0, 1.0]   # source A → cell (1,1)
    flow[0, 2, 2] = [-1.0, -1.0]  # source B → cell (1,1)
    depth_inv = np.full((1, 4, 4, 1), 0.1, np.float32)
    depth_inv[0, 2, 2] = 5.0  # B much nearer
    out = min_depth_flow_projection(jnp.asarray(flow), jnp.asarray(depth_inv))
    np.testing.assert_allclose(np.asarray(out)[0, 1, 1], [1.0, 1.0],
                               atol=1e-6)  # −flow of B


def test_min_depth_projection_empty_cells_zero():
    flow = np.zeros((1, 3, 3, 2), np.float32)
    flow[0, 1, 1] = [100.0, 0.0]  # out of bounds → no writes
    depth_inv = np.ones((1, 3, 3, 1), np.float32)
    out = min_depth_flow_projection(jnp.asarray(flow), jnp.asarray(depth_inv))
    # in-bounds zero-flow sources write −0 to their own cells; OOB cell is 0
    assert np.all(np.isfinite(np.asarray(out)))


def test_separable_conv_flow_centroid():
    f = 5
    kv = np.zeros((1, 2, 2, f), np.float32)
    kh = np.zeros((1, 2, 2, f), np.float32)
    kv[0, 0, 0, 4] = 1.0  # all mass at tap 4 → flow_y = 4 − 2 = 2
    kh[0, 0, 0, 0] = 2.0  # all mass at tap 0 → flow_x = 0 − 2 = −2
    out = separable_conv_flow(jnp.asarray(kv), jnp.asarray(kh))
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], [-2.0, 2.0],
                               atol=1e-6)
    # zero-sum kernels → −2000 sentinel (reference :75, :88)
    np.testing.assert_allclose(np.asarray(out)[0, 1, 1], [-2000.0, -2000.0])


def test_separable_conv_flow_differentiable():
    rs = np.random.RandomState(0)
    kv = jnp.asarray(rs.rand(1, 3, 3, 5), jnp.float32)
    kh = jnp.asarray(rs.rand(1, 3, 3, 5), jnp.float32)
    g = jax.grad(lambda k: jnp.sum(separable_conv_flow(k, kh) ** 2))(kv)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# AdaptiveWeightInterpolation extras (ops/adaptive_weight.py)
# ---------------------------------------------------------------------------

def _np_splat(values, flow, fw, sigma_d, prowindow):
    """Per-pixel python oracle of adaptive_weight._splat."""
    n, h, w, _ = flow.shape
    c = values.shape[-1] if values is not None else 1
    acc = np.zeros((n, h, w, c), np.float64)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                x2 = x + flow[b, y, x, 0]
                y2 = y + flow[b, y, x, 1]
                if not (0 <= x2 <= w - 1 and 0 <= y2 <= h - 1):
                    continue
                wgt = fw[b, y, x, 0] if fw is not None else 1.0
                ix0, iy0 = int(np.floor(x2)), int(np.floor(y2))
                for dy in range(-prowindow + 1, prowindow + 1):
                    for dx in range(-prowindow + 1, prowindow + 1):
                        zx, zy = ix0 + dx, iy0 + dy
                        if not (0 <= zx < w and 0 <= zy < h):
                            continue
                        d2 = (zx - x2) ** 2 + (zy - y2) ** 2
                        g = np.exp(-d2 / (2 * sigma_d ** 2)) * wgt
                        v = values[b, y, x] if values is not None else 1.0
                        acc[b, zy, zx] += g * v
    return acc.astype(np.float32)


def test_pixel_value_and_weight_layers_match_oracle():
    from meta_interpolation_tpu.ops import adaptive_weight as aw

    rs = np.random.RandomState(0)
    img = rs.rand(2, 6, 7, 3).astype(np.float32)
    flow = (rs.rand(2, 6, 7, 2).astype(np.float32) - 0.5) * 3
    fw = rs.rand(2, 6, 7, 1).astype(np.float32)

    got_p = np.asarray(aw.pixel_value_layer(jnp.asarray(img),
                                            jnp.asarray(flow),
                                            jnp.asarray(fw)))
    np.testing.assert_allclose(got_p, _np_splat(img, flow, fw, 1.5, 2),
                               rtol=1e-4, atol=1e-5)
    got_w = np.asarray(aw.pixel_weight_layer(jnp.asarray(flow),
                                             jnp.asarray(fw)))
    np.testing.assert_allclose(got_w, _np_splat(None, flow, fw, 1.5, 2),
                               rtol=1e-4, atol=1e-5)
    got_r = np.asarray(aw.reliable_weight_layer(jnp.asarray(flow)))
    np.testing.assert_allclose(got_r, _np_splat(None, flow, None, 1.5, 2),
                               rtol=1e-4, atol=1e-5)


def test_weight_layer_confidence_properties():
    """Perfect brightness constancy with uniform flow → weight exp(0)=1;
    mismatched images → strictly smaller weights."""
    from meta_interpolation_tpu.ops import adaptive_weight as aw

    rs = np.random.RandomState(1)
    img = rs.rand(1, 8, 8, 3).astype(np.float32)
    zero_flow = np.zeros((1, 8, 8, 2), np.float32)
    w_same = np.asarray(aw.weight_layer(jnp.asarray(img), jnp.asarray(img),
                                        jnp.asarray(zero_flow)))
    np.testing.assert_allclose(w_same, 1.0, atol=1e-6)
    other = rs.rand(1, 8, 8, 3).astype(np.float32)
    w_diff = np.asarray(aw.weight_layer(jnp.asarray(img), jnp.asarray(other),
                                        jnp.asarray(zero_flow)))
    assert np.all(w_diff <= 1.0) and np.mean(w_diff) < 0.99
    # constant flow field keeps the variance term at zero: a pure shift of
    # the image by integer flow must again give weight 1 in the interior
    shift = np.roll(img, 2, axis=2)
    flow2 = np.zeros((1, 8, 8, 2), np.float32)
    flow2[..., 0] = 2.0
    w_shift = np.asarray(aw.weight_layer(
        jnp.asarray(img), jnp.asarray(shift), jnp.asarray(flow2)))
    np.testing.assert_allclose(w_shift[0, :, :5], 1.0, atol=1e-5)


def test_adaptive_weight_interpolation_static_scene_is_normalized_blur():
    """Two identical frames, zero flow → weights are 1 everywhere and the
    composed module reduces to the normalized gaussian splat (a σ_d blur)
    of the frame — pinned against the python oracle. Also checks the whole
    composition is differentiable w.r.t. the flows."""
    from meta_interpolation_tpu.ops import adaptive_weight as aw

    rs = np.random.RandomState(2)
    img_np = rs.rand(1, 8, 8, 3).astype(np.float32)
    img = jnp.asarray(img_np)
    flow_np = np.zeros((1, 8, 8, 2), np.float32)
    flow = jnp.asarray(flow_np)
    out = aw.adaptive_weight_interpolation(img, img, flow, flow)
    num = _np_splat(img_np, flow_np, None, 1.5, 2)
    den = _np_splat(None, flow_np, None, 1.5, 2)
    expected = num / (den + 1e-6)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-4)

    def loss(f):
        return jnp.sum(aw.adaptive_weight_interpolation(
            img, img, f, f, training=True))

    g = jax.grad(loss)(flow)
    assert np.all(np.isfinite(np.asarray(g)))
