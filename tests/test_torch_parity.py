"""End-to-end model parity vs the reference's torch modules (CPU oracle).

These tests import the reference implementation read-only, run it with its
own random init, convert the state_dict through our .pth importer, and
require our functional models to reproduce the outputs. This is the
strongest possible evidence that released .pth weights will give identical
predictions (the 0.05 dB PSNR-parity requirement).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout unavailable")


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _import_ref(module, cls):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    mod = importlib.import_module(module)
    return getattr(mod, cls)


def test_cain_matches_reference_torch():
    import torch
    from meta_interpolation_tpu.core import checkpoint as ckpt
    from meta_interpolation_tpu.models import cain

    MetaCAIN = _import_ref("cain.model", "MetaCAIN")
    torch.manual_seed(0)
    # tiny depth keeps CPU runtime sane; architecture logic is identical
    net = MetaCAIN(depth=2, resume=False)
    net.eval()
    # shrink to 1 group x 1 block for speed: rebuild encoder.interpolate
    sys.path.insert(0, REF)
    from model_utils import MetaInterpolation
    import torch.nn as nn
    net.encoder.interpolate = MetaInterpolation(
        1, 1, 3 * 16, act=nn.LeakyReLU(0.2, False))  # 48ch: CA 48//16=3 valid

    # 128×128 input: smaller sizes make the reference's pad-to-×128
    # reflection exceed the input dim (torch restriction)
    rs = np.random.RandomState(0)
    x = rs.rand(1, 3, 128, 128).astype(np.float32)
    y = rs.rand(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        expected = _to_nhwc(net(torch.from_numpy(x), torch.from_numpy(y)))

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    target = cain.init(jax.random.PRNGKey(0), depth=2, n_resgroups=1,
                       n_resblocks=1)
    merged = ckpt.lossy_merge(target, ckpt.torch_state_dict_to_pytree(sd),
                              verbose=True)
    got = cain.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(y.transpose(0, 2, 3, 1)),
                     depth=2, n_resgroups=1, n_resblocks=1)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


def test_rrin_unet_matches_reference_torch():
    import torch
    from meta_interpolation_tpu.core import checkpoint as ckpt
    from meta_interpolation_tpu.models import unet as our_unet

    MetaUNet = _import_ref("rrin.unet", "MetaUNet")
    torch.manual_seed(1)
    net = MetaUNet(6, 4, 3)  # depth 3 for speed
    net.eval()

    rs = np.random.RandomState(1)
    x = rs.rand(1, 6, 16, 16).astype(np.float32)
    with torch.no_grad():
        expected = _to_nhwc(net(torch.from_numpy(x)))

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    target = our_unet.init(jax.random.PRNGKey(0), 6, 4, 3)
    merged = ckpt.lossy_merge(target, ckpt.torch_state_dict_to_pytree(sd),
                              verbose=True)
    got = our_unet.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         depth=3)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


def test_superslomo_unet_matches_reference_torch():
    import torch
    from meta_interpolation_tpu.core import checkpoint as ckpt
    from meta_interpolation_tpu.models import superslomo as ssm

    try:
        MetaUNet = _import_ref("superslomo.model", "MetaUNet")
    except (ImportError, ModuleNotFoundError):
        pytest.skip("reference superslomo imports torchvision (unavailable)")
    torch.manual_seed(2)
    net = MetaUNet(6, 4)
    net.eval()

    rs = np.random.RandomState(2)
    x = rs.rand(1, 6, 64, 64).astype(np.float32)
    with torch.no_grad():
        expected = _to_nhwc(net(torch.from_numpy(x)))

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    target = ssm._init_unet(jax.random.PRNGKey(0), 6, 4)
    merged = ckpt.lossy_merge(target, ckpt.torch_state_dict_to_pytree(sd),
                              verbose=True)
    got = ssm._unet(merged, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=2e-4)


def test_sepconv_encoder_matches_reference_torch():
    """SepConv full Meta network vs ours, with the sepconv op on the jnp
    reference path (CPU)."""
    import torch
    from meta_interpolation_tpu.core import checkpoint as ckpt
    from meta_interpolation_tpu.models import sepconv as our_sepconv

    # The reference MetaNetwork imports its cupy op at module import; the
    # op itself is only touched in forward, but `import cupy` happens at
    # import time — skip if unavailable.
    try:
        MetaNetwork = _import_ref("sepconv.model", "MetaNetwork")
    except ImportError:
        pytest.skip("reference sepconv imports cupy (unavailable)")

    torch.manual_seed(3)
    net = MetaNetwork(resume=False)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    target = our_sepconv.init(jax.random.PRNGKey(0))
    merged = ckpt.lossy_merge(target, ckpt.torch_state_dict_to_pytree(sd),
                              verbose=True)
    # can't run the reference forward (cupy/CUDA); instead verify that every
    # reference parameter landed (no skipped keys ⇒ same architecture)
    flat_ref = {k for k in sd if k.endswith("weight") or k.endswith("bias")}
    n_ours = len(jax.tree.leaves(target))
    assert n_ours == len(flat_ref), (n_ours, len(flat_ref))
