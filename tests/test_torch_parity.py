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

    from ref_stubs import stub_torchvision
    stub_torchvision()  # unused import at superslomo/model.py:2-3
    MetaUNet = _import_ref("superslomo.model", "MetaUNet")
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
    # op itself is only touched in forward — the stub satisfies the import
    # (full forward parity: test_torch_parity_ext.py).
    from ref_stubs import stub_cupy
    stub_cupy()
    MetaNetwork = _import_ref("sepconv.model", "MetaNetwork")

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


def test_one_step_adaptation_matches_reference():
    """North-star witness (BASELINE.json): PSNR after ONE inner-loop
    adaptation step within 0.05 dB of the reference. The oracle episode is
    assembled from reference code — MetaCAIN + LSLRGradientDescentLearningRule
    + the forward() recipe of meta_learning_system.py:366-432 (support loss
    summed over triplets (0,4)→2 and (2,6)→4, one SGD-rule update, query
    (2,4)→3) — because meta_learning_system.py itself imports torchvision,
    unavailable offline."""
    import torch
    import torch.nn.functional as F
    from meta_interpolation_tpu.core import checkpoint as ckpt
    from meta_interpolation_tpu.core import metrics as M
    from meta_interpolation_tpu.core.losses import make_loss_fn
    from meta_interpolation_tpu.meta.episode import EpisodeBuilder, EpisodeSpec
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer
    from meta_interpolation_tpu.models import cain

    MetaCAIN = _import_ref("cain.model", "MetaCAIN")
    LSLR = _import_ref("inner_loop_optimizers",
                       "LSLRGradientDescentLearningRule")
    torch.manual_seed(0)
    net = MetaCAIN(depth=2, resume=False)
    sys.path.insert(0, REF)
    from model_utils import MetaInterpolation
    import torch.nn as nn
    net.encoder.interpolate = MetaInterpolation(
        1, 1, 3 * 16, act=nn.LeakyReLU(0.2, False))
    net.eval()
    inner_lr = 1e-2  # large enough that a wrong update would shift PSNR

    rs = np.random.RandomState(3)
    frames_np = rs.rand(7, 128, 128, 3).astype(np.float32)
    frames_t = [torch.from_numpy(f.transpose(2, 0, 1))[None]
                for f in frames_np]

    # ---- reference episode (1 step, SGD rule, L1) ----
    weights = {n: p for n, p in net.named_parameters() if p.requires_grad}
    rule = LSLR(device="cpu", optimizer="SGD", total_num_inner_loop_steps=1,
                use_learnable_learning_rates=True,
                init_learning_rate=inner_lr)
    rule.initialize(weights)
    rule.initialize_state()
    support_loss = 0.0
    for (i0, it, i1) in ((0, 2, 4), (2, 4, 6)):
        out = net(frames_t[i0], frames_t[i1], params=weights)
        support_loss = support_loss + F.l1_loss(out, frames_t[it])
    grads = torch.autograd.grad(support_loss, list(weights.values()),
                                create_graph=False, allow_unused=True)
    grads_dict = dict(zip(weights.keys(), grads))
    adapted = rule.update_params(weights, grads_dict, num_step=0)
    with torch.no_grad():
        q_ref = net(frames_t[2], frames_t[4], params=adapted)
    q_ref = _to_nhwc(q_ref)

    # ---- our episode, converted init ----
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    target = cain.init(jax.random.PRNGKey(0), depth=2, n_resgroups=1,
                       n_resblocks=1)
    merged = ckpt.lossy_merge(target, ckpt.torch_state_dict_to_pytree(sd))
    opt = InnerOptimizer(rule="SGD", lr_mode="lslr", num_steps=1)
    builder = EpisodeBuilder(
        apply_fn=lambda p, a, b: cain.apply(p, a, b, depth=2, n_resgroups=1,
                                            n_resblocks=1),
        loss_fn=make_loss_fn("1*L1"), inner_opt=opt)
    meta = {"net": merged, "lrs": opt.init_lrs(merged, inner_lr)}
    spec = EpisodeSpec(num_steps=1, second_order=False)
    _, pred, _ = builder.task_episode(meta, jnp.asarray(frames_np),
                                      jnp.ones((1,)), spec, training=False)
    pred = np.asarray(pred)

    np.testing.assert_allclose(pred, q_ref[0], rtol=1e-3, atol=1e-4)
    tgt = jnp.asarray(frames_np[3])[None]
    psnr_ref, _ = M.calc_metrics(jnp.asarray(q_ref), tgt)
    psnr_got, _ = M.calc_metrics(jnp.asarray(pred)[None], tgt)
    assert abs(float(psnr_ref) - float(psnr_got)) < 0.05, (
        float(psnr_ref), float(psnr_got))
