"""DAIN op tests — correlation, flow projection, filter interpolation.

Brute-force numpy implementations re-derive each CUDA kernel's definition
(cited in the op docstrings); our XLA formulations must match.
"""
import jax
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.ops.correlation import correlation
from meta_interpolation_tpu.ops.flow_projection import flow_projection
from meta_interpolation_tpu.ops.filter_interpolation import filter_interpolation


def test_correlation_matches_brute_force():
    rs = np.random.RandomState(0)
    n, h, w, c, d = 1, 6, 7, 4, 2
    f1 = rs.rand(n, h, w, c).astype(np.float32)
    f2 = rs.rand(n, h, w, c).astype(np.float32)
    expected = np.zeros((n, h, w, (2 * d + 1) ** 2), np.float32)
    for y in range(h):
        for x in range(w):
            for tj in range(-d, d + 1):
                for ti in range(-d, d + 1):
                    tc = (tj + d) * (2 * d + 1) + (ti + d)
                    y2, x2 = y + tj, x + ti
                    if 0 <= y2 < h and 0 <= x2 < w:
                        expected[0, y, x, tc] = np.mean(
                            f1[0, y, x] * f2[0, y2, x2])
    got = correlation(jnp.asarray(f1), jnp.asarray(f2), max_displacement=d)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-7)


def _brute_projection(flow, depth=None):
    n, h, w, _ = flow.shape
    acc = np.zeros_like(flow)
    cnt = np.zeros((n, h, w), np.float32)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                fx, fy = flow[b, y, x]
                x2, y2 = x + fx, y + fy
                if 0 <= x2 <= w - 1 and 0 <= y2 <= h - 1:
                    ixl, iyt = int(np.floor(x2)), int(np.floor(y2))
                    ixr, iyb = min(ixl + 1, w - 1), min(iyt + 1, h - 1)
                    wt = depth[b, y, x, 0] if depth is not None else 1.0
                    for (yy, xx) in ((iyt, ixl), (iyt, ixr), (iyb, ixl),
                                     (iyb, ixr)):
                        acc[b, yy, xx, 0] += -fx * wt
                        acc[b, yy, xx, 1] += -fy * wt
                        cnt[b, yy, xx] += wt
    out = acc.copy()
    mask = cnt > 0
    out[mask] = acc[mask] / cnt[mask][:, None]
    return out, cnt


def test_flow_projection_matches_brute_force():
    rs = np.random.RandomState(1)
    flow = (rs.rand(1, 5, 6, 2).astype(np.float32) * 4 - 2)
    expected, _ = _brute_projection(flow)
    got = flow_projection(jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_depth_weighted_projection():
    rs = np.random.RandomState(2)
    flow = (rs.rand(1, 5, 6, 2).astype(np.float32) * 3 - 1.5)
    depth = rs.rand(1, 5, 6, 1).astype(np.float32) + 0.5
    expected, _ = _brute_projection(flow, depth)
    got = flow_projection(jnp.asarray(flow), jnp.asarray(depth))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_flow_projection_differentiable():
    flow = jnp.asarray(np.random.RandomState(3).rand(1, 4, 4, 2) - 0.5,
                       jnp.float32)

    def loss(f):
        return jnp.sum(flow_projection(f) ** 2)

    g = jax.grad(loss)(flow)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_fill_hole_fills_empty_cells():
    # all flow points to the top-left corner → most target cells are holes
    flow = np.zeros((1, 4, 4, 2), np.float32)
    for y in range(4):
        for x in range(4):
            flow[0, y, x] = [-x, -y]  # lands at (0, 0)
    out_nofill = flow_projection(jnp.asarray(flow), fill_hole=False)
    out_fill = flow_projection(jnp.asarray(flow), fill_hole=True)
    # (0,0) is valid in both; holes get copies of nearest valid values
    np.testing.assert_allclose(np.asarray(out_fill)[0, 0, 0],
                               np.asarray(out_nofill)[0, 0, 0])
    # (3,0): row 3 has no valid cells, but column 0 does (rows 0-1) → the
    # up-direction search fills it. (3,3) has no valid cell on either axis
    # and stays unfilled — matching the reference's directional search.
    assert np.allclose(np.asarray(out_nofill)[0, 3, 0], 0.0)
    assert not np.allclose(np.asarray(out_fill)[0, 3, 0], 0.0)
    assert np.allclose(np.asarray(out_fill)[0, 3, 3], 0.0)


def _brute_filter_interp(img, flow, filters, fs=4):
    n, h, w, c = img.shape
    out = np.zeros_like(img)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                fx, fy = flow[b, y, x]
                x2, y2 = x + fx, y + fy
                if not (0 <= x2 <= w - 1 and 0 <= y2 <= h - 1
                        and abs(fx) < w / 2 and abs(fy) < h / 2):
                    out[b, y, x] = img[b, y, x]
                    continue
                ixl = int(np.floor(x2)) + 1 - fs // 2
                iyt = int(np.floor(y2)) + 1 - fs // 2
                alpha = x2 - np.floor(x2)
                beta = y2 - np.floor(y2)
                acc = np.zeros(c, np.float32)
                for j in range(fs):
                    wr = (1 - beta) if iyt + j <= np.floor(y2) else beta
                    rr = min(max(iyt + j, 0), h - 1)
                    for i in range(fs):
                        wc = (1 - alpha) if ixl + i <= np.floor(x2) else alpha
                        cc = min(max(ixl + i, 0), w - 1)
                        acc += (img[b, rr, cc] * filters[b, y, x, j * fs + i]
                                * wr * wc)
                out[b, y, x] = acc
    return out


def test_filter_interpolation_matches_brute_force():
    rs = np.random.RandomState(4)
    img = rs.rand(1, 6, 7, 3).astype(np.float32)
    flow = (rs.rand(1, 6, 7, 2).astype(np.float32) * 3 - 1.5)
    filters = rs.rand(1, 6, 7, 16).astype(np.float32)
    expected = _brute_filter_interp(img, flow, filters)
    got = filter_interpolation(jnp.asarray(img), jnp.asarray(flow),
                               jnp.asarray(filters))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_filter_interpolation_slabbed_path_matches(monkeypatch):
    # large batch/tile sizes slab the window gather over channels so the
    # (N·H·W, 4, 4, cs) temporary stays bounded — pin the multi-slab path
    # against the single-gather branch
    from meta_interpolation_tpu.ops import filter_interpolation as fi_mod
    rs = np.random.RandomState(11)
    img = rs.rand(2, 6, 7, 5).astype(np.float32)
    flow = (rs.rand(2, 6, 7, 2).astype(np.float32) * 3 - 1.5)
    filters = rs.rand(2, 6, 7, 16).astype(np.float32)
    combined = filter_interpolation(jnp.asarray(img), jnp.asarray(flow),
                                    jnp.asarray(filters))
    # cap the per-gather temporary at 2 channels' worth → 3 slabs
    monkeypatch.setattr(fi_mod, "_WINDOW_SLAB_BYTES",
                        2 * 2 * 6 * 7 * 16 * np.dtype(np.float32).itemsize)
    slabbed = fi_mod.filter_interpolation(jnp.asarray(img), jnp.asarray(flow),
                                          jnp.asarray(filters))
    np.testing.assert_allclose(np.asarray(slabbed), np.asarray(combined),
                               rtol=1e-6, atol=1e-6)


def test_filter_interpolation_differentiable():
    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.rand(1, 5, 5, 2), jnp.float32)
    flow = jnp.asarray(rs.rand(1, 5, 5, 2) - 0.5, jnp.float32)
    filters = jnp.asarray(rs.rand(1, 5, 5, 16), jnp.float32)

    g = jax.grad(lambda f: jnp.sum(
        filter_interpolation(img, f, filters) ** 2))(flow)
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda ff: jnp.sum(
        filter_interpolation(img, flow, ff) ** 2))(filters)
    assert float(jnp.abs(g2).sum()) > 0


def test_flow_projection_bounded_matches_scatter_interpret():
    """Bounded pallas projection (interpret mode) == scatter formulation,
    both unweighted and depth-weighted; count plane drives hole filling."""
    from meta_interpolation_tpu.ops.flow_projection_pallas import (
        flow_projection_bounded)

    rs = np.random.RandomState(7)
    flow = jnp.asarray(rs.rand(2, 16, 32, 2) * 12 - 6, jnp.float32)
    dinv = jnp.asarray(rs.rand(2, 16, 32, 1) + 0.3, jnp.float32)

    out, cnt = flow_projection_bounded(flow, dinv, max_displacement=8,
                                       interpret=True)
    ref = flow_projection(flow, dinv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    out_u, _ = flow_projection_bounded(flow, None, max_displacement=8,
                                       interpret=True)
    ref_u = flow_projection(flow)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u),
                               atol=2e-5, rtol=1e-5)


def test_flow_projection_proj_range_cpu_fallthrough():
    """On CPU the proj_range fast path falls through to the exact scatter
    (the pallas kernel is TPU-only)."""
    rs = np.random.RandomState(8)
    flow = jnp.asarray(rs.rand(1, 16, 128, 2) * 4 - 2, jnp.float32)
    a = flow_projection(flow, proj_range=8)
    b = flow_projection(flow)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fill_holes_scan_matches_gather():
    """The associative-scan hole fill (no gathers) must be bit-identical
    to the index-gather form on random hole patterns, including all-hole
    rows/columns and fully-valid frames."""
    import numpy as np
    import jax.numpy as jnp
    from meta_interpolation_tpu.ops import flow_projection as fp

    rng = np.random.RandomState(0)
    for density in (0.0, 0.3, 0.97, 1.0):
        cnt = ((rng.rand(2, 13, 17) < density)
               * (1 + rng.rand(2, 13, 17))).astype(np.float32)
        out = np.where(cnt[..., None] > 0,
                       rng.randn(2, 13, 17, 2), 0.0).astype(np.float32)
        a = fp._fill_holes_gather(jnp.asarray(out), jnp.asarray(cnt))
        b = fp._fill_holes_scan(jnp.asarray(out), jnp.asarray(cnt))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
