"""DAIN component tests.

The hourglass parity test drives the reference's torch graph (CPU, random
init) as an oracle: its state_dict converts through our .pth converter and
both nets must produce identical log-depth maps — validating the JSON spec,
the interpreter, and the converter in one shot.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference/dain/MegaDepth"


def test_s2df_shapes():
    from meta_interpolation_tpu.models.dain import s2df
    p = s2df.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    out = s2df.apply(p, x)
    assert out.shape == (1, 32, 32, 195)
    # dense concat: first 3 channels are the raw input
    np.testing.assert_allclose(np.asarray(out[..., :3]), np.asarray(x))


def test_rectify_shapes_and_grad():
    from meta_interpolation_tpu.models.dain import rectify
    p = rectify.init(jax.random.PRNGKey(0), in_channels=437)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 437), jnp.float32)
    out = rectify.apply(p, x)
    assert out.shape == (1, 16, 16, 3)
    g = jax.grad(lambda p: jnp.sum(rectify.apply(p, x) ** 2))(p)
    assert all(np.isfinite(float(jnp.sum(jnp.abs(l))))
               for l in jax.tree.leaves(g))


def test_mononet_shapes():
    from meta_interpolation_tpu.models.dain import mononet
    p = mononet.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 6), jnp.float32)
    f0, f1 = mononet.apply(p, x)
    assert f0.shape == (1, 64, 64, 16)
    assert f1.shape == (1, 64, 64, 16)


def test_pwcnet_shapes():
    from meta_interpolation_tpu.models.dain import pwcnet
    p = pwcnet.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(3)
    im1 = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    im2 = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    flow = pwcnet.apply(p, im1, im2)
    assert flow.shape == (1, 16, 16, 2)  # quarter resolution


def test_hourglass_shapes():
    from meta_interpolation_tpu.models.dain import hourglass
    p = hourglass.init(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(p))
    # reference torch model: 5,371,452 params + BN running stats; our tree
    # holds both (affine=False BNs carry only stats)
    assert n_params > 5_000_000
    x = jnp.asarray(np.random.RandomState(4).rand(1, 32, 32, 3), jnp.float32)
    out = hourglass.apply(p, x)
    assert out.shape == (1, 32, 32, 1)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout unavailable")
def test_hourglass_matches_torch_oracle():
    import sys
    sys.path.insert(0, REFERENCE)
    import torch
    from pytorch_DIW_scratch import pytorch_DIW_scratch as torch_model

    from meta_interpolation_tpu.core import checkpoint as ckpt
    from meta_interpolation_tpu.models.dain import hourglass

    torch_model.eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    target = hourglass.init(jax.random.PRNGKey(0))
    converted = ckpt.torch_state_dict_to_pytree(sd)
    merged = ckpt.lossy_merge(target, converted, verbose=True)

    rs = np.random.RandomState(5)
    x = rs.rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        expected = torch_model(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = hourglass.apply(merged, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=1e-4)


def test_dain_forward_tiny():
    from meta_interpolation_tpu.models.dain import model as dain_model
    p = dain_model.init(jax.random.PRNGKey(0))
    # random-init hourglass emits unbounded log-depth whose exp() overflows
    # in the inverse-depth weighting (the reference behaves identically with
    # random weights — it always loads pretrained ones); bound the depth
    # head so the composed forward is finite
    last = str(max(int(k) for k in p["depthNet"]))
    p["depthNet"][last]["kernel"] = p["depthNet"][last]["kernel"] * 1e-4
    p["depthNet"][last]["bias"] = p["depthNet"][last]["bias"] * 0.0
    rs = np.random.RandomState(6)
    f0 = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    f1 = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    out = dain_model.apply(p, f0, f1)
    assert out.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))

    # masks: only rectifyNet adapts
    mask = dain_model.inner_mask(p)
    assert float(jax.tree.leaves(mask["rectifyNet"])[0]) == 1.0
    assert float(jax.tree.leaves(mask["depthNet"])[0]) == 0.0


def test_dain_meta_apply_kwargs_fill_holes():
    """The meta system must run every DAIN forward with hole filling on
    (the reference keys fillhole on flow.requires_grad, and the meta
    config freezes every flow-producing subnet — see models/dain/model.py
    apply docstring)."""
    from meta_interpolation_tpu.models import registry
    assert registry.get("dain").meta_apply_kwargs == {"fill_holes": True}
