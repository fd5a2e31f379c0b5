"""Layer-level parity tests vs torch (independent oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from meta_interpolation_tpu.models import layers


def test_conv2d_matches_torch():
    rs = np.random.RandomState(0)
    x = rs.rand(2, 9, 11, 5).astype(np.float32)
    w = rs.rand(3, 3, 5, 7).astype(np.float32)
    b = rs.rand(7).astype(np.float32)
    got = layers.conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                        jnp.asarray(x), padding=1)
    exp = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(np.asarray(got),
                               exp.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_conv2d_transpose_matches_torch():
    rs = np.random.RandomState(1)
    x = rs.rand(1, 6, 8, 3).astype(np.float32)
    # torch ConvTranspose2d weight: (in, out, kh, kw)
    w = rs.rand(3, 4, 4, 4).astype(np.float32)
    b = rs.rand(4).astype(np.float32)
    exp = F.conv_transpose2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             torch.from_numpy(w), torch.from_numpy(b),
                             stride=2, padding=1)
    # our storage: (kh, kw, in, out)
    got = layers.conv2d_transpose(
        {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),
         "bias": jnp.asarray(b)},
        jnp.asarray(x), stride=2, padding=1)
    assert got.shape == (1, 12, 16, 4)
    np.testing.assert_allclose(np.asarray(got),
                               exp.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_upsample_bilinear_matches_torch():
    rs = np.random.RandomState(2)
    x = rs.rand(1, 5, 7, 3).astype(np.float32)
    for ac in (False, True):
        exp = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            scale_factor=2, mode="bilinear",
                            align_corners=ac)
        got = layers.upsample_bilinear(jnp.asarray(x), 2, align_corners=ac)
        np.testing.assert_allclose(np.asarray(got),
                                   exp.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-5, err_msg=f"ac={ac}")


def test_avg_max_pool_match_torch():
    rs = np.random.RandomState(3)
    x = rs.rand(1, 8, 8, 3).astype(np.float32)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(layers.avg_pool(jnp.asarray(x), 2)),
        F.avg_pool2d(t, 2).numpy().transpose(0, 2, 3, 1), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(layers.max_pool(jnp.asarray(x), 2)),
        F.max_pool2d(t, 2).numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_reflect_pad_matches_torch():
    rs = np.random.RandomState(4)
    x = rs.rand(1, 5, 6, 2).astype(np.float32)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    exp = F.pad(t, (2, 1, 1, 2), mode="reflect")
    got = layers.reflect_pad(jnp.asarray(x), (2, 1, 1, 2))
    np.testing.assert_allclose(np.asarray(got),
                               exp.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_batch_norm_eval_matches_torch():
    rs = np.random.RandomState(5)
    x = rs.rand(2, 4, 4, 6).astype(np.float32)
    p = {"scale": jnp.asarray(rs.rand(6).astype(np.float32)),
         "bias": jnp.asarray(rs.rand(6).astype(np.float32)),
         "mean": jnp.asarray(rs.rand(6).astype(np.float32)),
         "var": jnp.asarray(rs.rand(6).astype(np.float32) + 0.5)}
    got = layers.batch_norm_apply(p, jnp.asarray(x))
    exp = F.batch_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(np.asarray(p["mean"])),
                       torch.from_numpy(np.asarray(p["var"])),
                       torch.from_numpy(np.asarray(p["scale"])),
                       torch.from_numpy(np.asarray(p["bias"])),
                       training=False)
    np.testing.assert_allclose(np.asarray(got),
                               exp.numpy().transpose(0, 2, 3, 1), atol=1e-5)
