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


def test_bounded_warp_differentiable():
    import jax
    img = jnp.asarray(_rand((1, 8, 8, 2), 6))
    flow = jnp.asarray((_rand((1, 8, 8, 2), 7) - 0.5))
    g = jax.grad(lambda f: jnp.sum(
        warp.backward_warp(img, f, warp_range=4) ** 2))(flow)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
