"""Bounded fast warp vs exact gather (must be bit-comparable for in-range
flows, all padding/align modes)."""
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.ops import warp


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_bounded_matches_exact_in_range():
    img = _rand((2, 12, 16, 3), 0)
    # grid displacements within ±3 px
    base_y, base_x = np.meshgrid(np.arange(12), np.arange(16), indexing="ij")
    disp = (_rand((2, 12, 16, 2), 1) - 0.5) * 6
    ix = base_x[None] + disp[..., 0]
    iy = base_y[None] + disp[..., 1]
    for ac in (False, True):
        for pm in ("zeros", "border"):
            if ac:
                gx = 2 * ix / 15 - 1
                gy = 2 * iy / 11 - 1
            else:
                gx = (2 * ix + 1) / 16 - 1
                gy = (2 * iy + 1) / 12 - 1
            grid = jnp.asarray(np.stack([gx, gy], -1), jnp.float32)
            exact = warp.grid_sample(jnp.asarray(img), grid,
                                     align_corners=ac, padding_mode=pm)
            fast = warp.grid_sample_bounded(jnp.asarray(img), grid, 8,
                                            align_corners=ac, padding_mode=pm)
            np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                       atol=1e-5, err_msg=f"ac={ac} pm={pm}")


def test_bounded_warp_through_backward_warp():
    img = jnp.asarray(_rand((1, 10, 10, 2), 2))
    flow = jnp.asarray((_rand((1, 10, 10, 2), 3) - 0.5) * 4)
    exact = warp.backward_warp(img, flow, align_corners=True,
                               padding_mode="border")
    fast = warp.backward_warp(img, flow, align_corners=True,
                              padding_mode="border", warp_range=8)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5)


def test_bounded_warp_rrin_convention():
    img = jnp.asarray(_rand((1, 8, 8, 3), 4))
    flow = jnp.asarray((_rand((1, 8, 8, 2), 5) - 0.5) * 3)
    exact = warp.backward_warp_rrin(img, flow)
    fast = warp.backward_warp_rrin(img, flow, warp_range=6)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5)


def test_pallas_bounded_warp_interpret_matches_unrolled():
    """Pallas bounded-warp kernel (interpret mode) vs the jnp math."""
    import jax.numpy as jnp
    from meta_interpolation_tpu.ops import warp_pallas

    rs = np.random.RandomState(8)
    img = jnp.asarray(rs.rand(1, 16, 128, 3).astype(np.float32))
    h, w = 16, 128
    r = 4
    dy = (rs.rand(1, h, w).astype(np.float32) - 0.5) * 6
    dx = (rs.rand(1, h, w).astype(np.float32) - 0.5) * 6
    dy0 = np.floor(dy).astype(np.int32)
    dx0 = np.floor(dx).astype(np.int32)
    fy = (dy - dy0).astype(np.float32)
    fx = (dx - dx0).astype(np.float32)

    got = warp_pallas.warp_bounded_pallas(
        img, jnp.asarray(dy0), jnp.asarray(dx0), jnp.asarray(fy),
        jnp.asarray(fx), r, interpret=True)

    # jnp reference of the same accumulation (edge-padded shifts)
    imgp = np.pad(np.asarray(img), ((0, 0), (r + 1, r + 1), (r + 1, r + 1),
                                    (0, 0)), mode="edge")
    exp = np.zeros_like(np.asarray(img))
    for d in range(-r, r + 2):
        for e in range(-r, r + 2):
            wy = np.where(dy0 == d, 1 - fy, 0) + np.where(dy0 == d - 1, fy, 0)
            wx = np.where(dx0 == e, 1 - fx, 0) + np.where(dx0 == e - 1, fx, 0)
            win = imgp[:, d + r + 1:d + r + 1 + h, e + r + 1:e + r + 1 + w]
            exp = exp + (wy * wx)[..., None] * win
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5)


def test_bounded_warp_differentiable():
    import jax
    img = jnp.asarray(_rand((1, 8, 8, 2), 6))
    flow = jnp.asarray((_rand((1, 8, 8, 2), 7) - 0.5))
    g = jax.grad(lambda f: jnp.sum(
        warp.backward_warp(img, f, warp_range=4) ** 2))(flow)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_bounded_warp_gradients_match_exact():
    """d(bounded warp)/d(img, grid) == exact gather warp gradients when all
    samples are within range (training with --fast_warp_range)."""
    import jax
    import jax.numpy as jnp
    from meta_interpolation_tpu.ops import warp as W

    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.rand(1, 8, 16, 2), jnp.float32)
    flow = jnp.asarray(rs.rand(1, 8, 16, 2) * 3 - 1.5, jnp.float32)
    xs = jnp.arange(16, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(8, dtype=jnp.float32)[None, :, None]
    grid = jnp.stack([2 * (xs + flow[..., 0]) / 15 - 1,
                      2 * (ys + flow[..., 1]) / 7 - 1], axis=-1)

    def loss_exact(i, g):
        return jnp.sum(W.grid_sample(i, g, align_corners=True,
                                     padding_mode="border") ** 2)

    def loss_fast(i, g):
        return jnp.sum(W.grid_sample_bounded(i, g, 4, align_corners=True,
                                             padding_mode="border") ** 2)

    gi_e, gg_e = jax.grad(loss_exact, argnums=(0, 1))(img, grid)
    gi_f, gg_f = jax.grad(loss_fast, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_e),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_f), np.asarray(gg_e),
                               atol=1e-3, rtol=1e-3)
