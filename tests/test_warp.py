"""grid_sample / warp parity vs torch.nn.functional.grid_sample (CPU torch
is an independent oracle here — we assert bit-level semantic parity with the
conventions each reference model uses)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from meta_interpolation_tpu.ops import warp


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _torch_grid_sample(img_nhwc, grid, align_corners, padding_mode):
    t_img = torch.from_numpy(img_nhwc.transpose(0, 3, 1, 2))
    t_grid = torch.from_numpy(grid)
    out = F.grid_sample(t_img, t_grid, mode="bilinear",
                        padding_mode=padding_mode,
                        align_corners=align_corners)
    return out.numpy().transpose(0, 2, 3, 1)


def test_grid_sample_matches_torch_all_modes():
    img = _rand((2, 9, 13, 3), 0)
    grid = (_rand((2, 7, 11, 2), 1) * 2.4 - 1.2).astype(np.float32)  # incl. OOB
    for ac in (False, True):
        for pm in ("zeros", "border"):
            expected = _torch_grid_sample(img, grid, ac, pm)
            got = warp.grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                   align_corners=ac, padding_mode=pm)
            np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5,
                                       err_msg=f"ac={ac} pm={pm}")


def test_rrin_warp_matches_reference_formula():
    """RRIN warp normalizes 2*(pos/size-0.5) with align_corners=False
    (rrin/model.py:8-21) — replicate that exact composition in torch."""
    img = _rand((1, 8, 10, 3), 2)
    flow = (_rand((1, 8, 10, 2), 3) * 4 - 2).astype(np.float32)

    h, w = 8, 10
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    x = gx[None] + flow[..., 0]
    y = gy[None] + flow[..., 1]
    grid = np.stack([2 * (x / w - 0.5), 2 * (y / h - 0.5)],
                    axis=3).astype(np.float32)
    expected = _torch_grid_sample(img, grid, False, "zeros")
    got = warp.backward_warp_rrin(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_backward_warp_identity_at_zero_flow():
    img = _rand((1, 6, 6, 2), 4)
    out = warp.backward_warp(jnp.asarray(img), jnp.zeros((1, 6, 6, 2)),
                             align_corners=True)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)
    out2 = warp.backward_warp(jnp.asarray(img), jnp.zeros((1, 6, 6, 2)),
                              align_corners=False)
    np.testing.assert_allclose(np.asarray(out2), img, atol=1e-6)


def test_backward_warp_integer_shift():
    img = _rand((1, 6, 8, 1), 5)
    flow = np.zeros((1, 6, 8, 2), np.float32)
    flow[..., 0] = 1.0  # sample one pixel to the right
    out = warp.backward_warp(jnp.asarray(img), jnp.asarray(flow),
                             align_corners=True)
    np.testing.assert_allclose(np.asarray(out)[:, :, :-1], img[:, :, 1:],
                               atol=1e-6)


def test_warp_gradients_flow():
    import jax
    img = jnp.asarray(_rand((1, 6, 6, 3), 6))
    flow = jnp.asarray((_rand((1, 6, 6, 2), 7) - 0.5))

    def loss(f):
        return jnp.sum(warp.backward_warp(img, f) ** 2)

    g = jax.grad(loss)(flow)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0

    def loss_img(im):
        return jnp.sum(warp.backward_warp(im, flow) ** 2)

    gi = jax.grad(loss_img)(img)
    assert np.all(np.isfinite(np.asarray(gi)))


def test_flowstats_warns_when_every_call_is_jitted():
    """A FlowStats context whose probed forwards all run under jit records
    nothing (tracers carry no values) — it must WARN instead of silently
    reporting frac_beyond=0/max_disp=0 (VERDICT r4 item 8)."""
    import warnings

    import jax

    from meta_interpolation_tpu.ops import warp as warp_ops

    img = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3), jnp.float32)
    grid = jnp.zeros((1, 8, 8, 2), jnp.float32)

    jit_sample = jax.jit(lambda im, g: warp_ops.grid_sample(im, g))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        with warp_ops.FlowStats(r=4) as fs:
            jax.block_until_ready(jit_sample(img, grid))
    assert fs.calls == 0 and fs.jitted_skips >= 1
    assert any("recorded 0" in str(w.message) for w in rec), (
        [str(w.message) for w in rec])

    # eager call in the context: records, no warning
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        with warp_ops.FlowStats(r=4) as fs2:
            warp_ops.grid_sample(img, grid)
    assert fs2.calls == 1
    assert not any("recorded 0" in str(w.message) for w in rec2)
