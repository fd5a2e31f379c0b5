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
