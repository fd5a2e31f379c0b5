"""Extended torch-oracle parity: every CPU-runnable reference surface.

Round-2 coverage (VERDICT.md item 2): full VoxelFlow, DAIN S2DF, MonoNet,
rectify net, the full PWCNet pyramid+decoders (with our correlation
substituted on both sides — the CUDA correlation cannot run here), and
full RRIN with the reference warp monkey-patched off ``.cuda()``. Each
test runs the reference torch module with its own random init, converts
the state_dict through our .pth importer, and pins our functional model's
output against the torch output.
"""
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout unavailable")


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _stub_cuda_extensions():
    """The reference's pybind CUDA extensions are import-time deps of the
    DAIN tier; none of their functions run in these tests."""
    for name in ("filterinterpolation_cuda", "flowprojection_cuda",
                 "depthflowprojection_cuda", "mindepthflowprojection_cuda",
                 "correlation_cuda", "separableconv_cuda",
                 "separableconvflow_cuda", "interpolation_cuda",
                 "interpolationch_cuda"):
        sys.modules.setdefault(name, types.ModuleType(name))


import contextlib


@contextlib.contextmanager
def _cpu_cuda_patch():
    """Neutralize the reference's hardcoded CUDA calls for CPU oracles:
    ``.cuda()`` → identity, ``torch.cuda.device(...)`` → no-op context,
    ``torch.cuda.FloatTensor`` → CPU FloatTensor (PWC warp mask, :188),
    current_device/current_stream/stream/synchronize → no-ops (MetaDAIN
    forward, DAIN.py:508-512,556-583)."""
    import torch
    saved = {n: getattr(torch.cuda, n, None)
             for n in ("FloatTensor", "device", "current_device",
                       "current_stream", "stream", "synchronize")}
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.device = lambda *_a, **_k: contextlib.nullcontext()
    torch.cuda.current_device = lambda: -1
    torch.cuda.current_stream = lambda *_a, **_k: None
    torch.cuda.stream = lambda *_a, **_k: contextlib.nullcontext()
    torch.cuda.synchronize = lambda *_a, **_k: None
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_cuda
        for n, v in saved.items():
            if v is not None:
                setattr(torch.cuda, n, v)


@pytest.fixture(scope="module")
def dain_ref():
    """Reference MetaDAIN on CPU: CUDA extensions stubbed, ``.cuda()``
    neutralized (the PWC nets build a cached grid with .cuda() in
    __init__, PWCNet.py:145-155), numpy<1.24 alias restored."""
    import tempfile
    import torch
    _ref_path()
    _stub_cuda_extensions()
    if not hasattr(np, "int"):
        np.int = int  # PWCNet.py:77 uses np.cumsum(...).astype(np.int)
    with _cpu_cuda_patch():
        from dain.networks.DAIN import MetaDAIN
        torch.manual_seed(7)
        # MegaDepth_model.py:18 runs TrainOptions().parse() at import,
        # which writes ./checkpoints/<name>/opt.txt into the CWD — keep
        # that artifact out of the repo
        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as tmp:
            os.chdir(tmp)
            try:
                net = MetaDAIN(training=False, resume=False)
            finally:
                os.chdir(cwd)
        net.eval()
        yield net


def _convert(net, target, convtranspose_pred=None):
    from meta_interpolation_tpu.core import checkpoint as ckpt
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = ckpt.torch_state_dict_to_pytree(
        sd, convtranspose_pred=convtranspose_pred)
    return ckpt.lossy_merge(target, tree, verbose=True)


# ---------------------------------------------------------------------------
# VoxelFlow — full model (voxel_flow.py:231-534, pure torch, CPU-clean)
# ---------------------------------------------------------------------------

def test_voxelflow_full_matches_reference_torch():
    import torch
    from meta_interpolation_tpu.models import voxelflow

    _ref_path()
    from voxelflow.core.models.voxel_flow import MetaVoxelFlow
    torch.manual_seed(4)
    net = MetaVoxelFlow(types.SimpleNamespace(), resume=False)
    net.eval()

    rs = np.random.RandomState(4)
    # 64-divisible input: the reference pads to x64 with a *centered*
    # reflect split (:360-370); 64x64 keeps padding out of this test
    x0 = (rs.rand(1, 3, 64, 64).astype(np.float32) - 0.5) * 2.0
    x1 = (rs.rand(1, 3, 64, 64).astype(np.float32) - 0.5) * 2.0
    with torch.no_grad(), _cpu_cuda_patch():
        # the trilinear-sampling grid is built with .cuda() (:475-477)
        expected = _to_nhwc(net(torch.from_numpy(x0), torch.from_numpy(x1)))

    merged = _convert(net, voxelflow.init(jax.random.PRNGKey(0)))
    got = voxelflow.apply(merged, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                          jnp.asarray(x1.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# DAIN S2DF context net (S2DF.py:148-360)
# ---------------------------------------------------------------------------

def test_s2df_matches_reference_torch():
    import torch
    from meta_interpolation_tpu.models.dain import s2df

    _ref_path()
    # NOTE: the reference's MetaS2DF_3dense cannot be constructed — its
    # block1 references an undefined `Conv2dLayer` (S2DF.py:207, latent
    # NameError). MetaDAIN actually instantiates the NON-meta S2DF_3dense
    # for ctxNet (DAIN.py:444-445), which is what released dain_base.pth
    # weights contain; identical layer names either way.
    from dain.S2D_models.S2DF import S2DF_3dense
    torch.manual_seed(5)
    net = S2DF_3dense()
    net.eval()

    rs = np.random.RandomState(5)
    x = rs.rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = _to_nhwc(net(torch.from_numpy(x)))

    merged = _convert(net, s2df.init(jax.random.PRNGKey(0)))
    got = s2df.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape[-1] == expected.shape[-1] == 195
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# DAIN rectify net — MetaMultipleBasicBlock_4 (BasicBlock.py:152-215)
# ---------------------------------------------------------------------------

def test_rectify_matches_reference_torch():
    import torch
    from meta_interpolation_tpu.models.dain import rectify

    _ref_path()
    from dain.Resblock.BasicBlock import MetaMultipleBasicBlock_4
    torch.manual_seed(6)
    net = MetaMultipleBasicBlock_4(16, 32)  # small channels for CPU speed
    net.eval()

    rs = np.random.RandomState(6)
    x = rs.rand(1, 16, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = _to_nhwc(net(torch.from_numpy(x)))

    merged = _convert(net, rectify.init(jax.random.PRNGKey(0),
                                        in_channels=16, intermediate=32))
    got = rectify.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# DAIN MonoNet5 filter net (DAIN.py:662-739, via MetaDAIN submodules)
# ---------------------------------------------------------------------------

def test_mononet_matches_reference_torch(dain_ref):
    import torch
    from meta_interpolation_tpu.models.dain import mononet

    net = dain_ref
    rs = np.random.RandomState(8)
    x = rs.rand(1, 6, 64, 64).astype(np.float32)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        temp = net.forward_singlePath(net.initScaleNets_filter, xt, "filter")
        f1 = net.forward_singlePath(net.initScaleNets_filter1, temp, "f1")
        f2 = net.forward_singlePath(net.initScaleNets_filter2, temp, "f2")
    expected1, expected2 = _to_nhwc(f1), _to_nhwc(f2)

    merged = _convert(net, mononet.init(jax.random.PRNGKey(0)))
    got1, got2 = mononet.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got1), expected1, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got2), expected2, rtol=1e-3,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# PWCNet — full pyramid + all decoder levels + context net
# (PWCNet.py:40-319) with OUR correlation substituted on the torch side
# (the CUDA correlation cannot run on CPU; both sides use identical cost
# volumes, so the conv pyramid / decoders / warps / ConvTranspose
# upsamplers are what this pins)
# ---------------------------------------------------------------------------

def test_pwcnet_matches_reference_torch(dain_ref):
    import torch
    from meta_interpolation_tpu.models.dain import pwcnet
    from meta_interpolation_tpu.ops.correlation import correlation

    net = dain_ref.flownets

    class CorrStub(torch.nn.Module):
        def forward(self, a, b):
            av = jnp.asarray(a.detach().numpy().transpose(0, 2, 3, 1))
            bv = jnp.asarray(b.detach().numpy().transpose(0, 2, 3, 1))
            out = np.asarray(correlation(av, bv))
            return torch.from_numpy(
                np.ascontiguousarray(out.transpose(0, 3, 1, 2)))

    orig_corr = net.corr
    net.corr = CorrStub()
    try:
        rs = np.random.RandomState(9)
        x = rs.rand(1, 6, 128, 128).astype(np.float32)
        with torch.no_grad():
            expected = _to_nhwc(net(torch.from_numpy(x)))
    finally:
        net.corr = orig_corr

    def ct_pred(parts):
        return parts[-2].startswith(("deconv", "upfeat"))

    merged = _convert(net, pwcnet.init(jax.random.PRNGKey(0)),
                      convtranspose_pred=ct_pred)
    got = pwcnet.apply(merged,
                       jnp.asarray(x[:, :3].transpose(0, 2, 3, 1)),
                       jnp.asarray(x[:, 3:].transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# RRIN — full model (rrin/model.py:61-151) with warp off .cuda()
# ---------------------------------------------------------------------------

def test_rrin_full_matches_reference_torch():
    import torch
    import torch.nn.functional as F
    from meta_interpolation_tpu.models import rrin as our_rrin

    _ref_path()
    import rrin.model as ref_rrin

    def cpu_warp(img, flow):
        # rrin/model.py:8-21 verbatim math, grid kept on CPU; preserves the
        # half-pixel quirk (normx = 2(x/W - 0.5), align_corners=False)
        _, _, H, W = img.size()
        gridX, gridY = np.meshgrid(np.arange(W), np.arange(H))
        gridX = torch.tensor(gridX, requires_grad=False)
        gridY = torch.tensor(gridY, requires_grad=False)
        u = flow[:, 0, :, :]
        v = flow[:, 1, :, :]
        x = gridX.unsqueeze(0).expand_as(u).float() + u
        y = gridY.unsqueeze(0).expand_as(v).float() + v
        normx = 2 * (x / W - 0.5)
        normy = 2 * (y / H - 0.5)
        grid = torch.stack((normx, normy), dim=3)
        return F.grid_sample(img, grid, align_corners=False)

    orig_warp = ref_rrin.warp
    ref_rrin.warp = cpu_warp
    try:
        torch.manual_seed(10)
        net = ref_rrin.MetaRRIN(resume=False)
        net.eval()
        rs = np.random.RandomState(10)
        x0 = rs.rand(1, 3, 128, 128).astype(np.float32)
        x1 = rs.rand(1, 3, 128, 128).astype(np.float32)
        with torch.no_grad():
            expected = _to_nhwc(net(torch.from_numpy(x0),
                                    torch.from_numpy(x1)))
    finally:
        ref_rrin.warp = orig_warp

    merged = _convert(net, our_rrin.init(jax.random.PRNGKey(0)))
    got = our_rrin.apply(merged, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                         jnp.asarray(x1.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# SuperSloMo — COMPOSED full forward (superslomo/model.py:547-670):
# both UNets, the time-indexed flow/warp coefficient tables, the cached-grid
# backWarp, visibility blend, and the aux dict the Super loss consumes.
# torchvision (an unused import at :2-3) is stubbed; everything that runs
# is pure torch.
# ---------------------------------------------------------------------------

def test_superslomo_full_matches_reference_torch():
    import importlib

    import torch
    from ref_stubs import stub_torchvision
    from meta_interpolation_tpu.models import superslomo as ssm

    _ref_path()
    stub_torchvision()
    ref_mod = importlib.import_module("superslomo.model")

    torch.manual_seed(13)
    net = ref_mod.MetaSuperSloMo("cpu", resume=False)
    net.eval()

    rs = np.random.RandomState(13)
    # 64-divisible input keeps the reflect pad (:567-575) out of play;
    # inputs roughly mean-subtracted like the real pipeline
    x0 = (rs.rand(1, 3, 64, 64).astype(np.float32) - 0.42)
    x1 = (rs.rand(1, 3, 64, 64).astype(np.float32) - 0.42)
    with torch.no_grad():
        ft_ref, aux_ref = net(torch.from_numpy(x0), torch.from_numpy(x1),
                              ind=3)

    merged = _convert(net, ssm.init(jax.random.PRNGKey(0)))
    got, aux = ssm.apply(merged, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                         jnp.asarray(x1.transpose(0, 2, 3, 1)), ind=3)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ft_ref),
                               rtol=1e-3, atol=2e-4)
    for key in ("bidirectional_flow", "warped_intermediate_frames",
                "warped_input_frames"):
        for ours, ref in zip(aux[key], aux_ref[key]):
            np.testing.assert_allclose(np.asarray(ours), _to_nhwc(ref),
                                       rtol=1e-3, atol=2e-4, err_msg=key)


# ---------------------------------------------------------------------------
# SepConv — COMPOSED full forward (sepconv/model.py:252-349) with our
# sepconv op substituted on the torch side (the cupy CUDA kernel cannot run
# on CPU; both sides use identical adaptive-filter values, so this pins the
# encoder-decoder, the four 51-tap kernel subnets, the replicate-pad-to-x128
# protocol, and the two-frame sum/crop composition)
# ---------------------------------------------------------------------------

def test_sepconv_full_matches_reference_torch():
    import importlib

    import torch
    from ref_stubs import stub_cupy
    from meta_interpolation_tpu.models import sepconv as our_sepconv
    from meta_interpolation_tpu.ops import sepconv as our_op

    _ref_path()
    stub_cupy()
    ref_mod = importlib.import_module("sepconv.model")

    def t2j(t):
        return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))

    def j2t(a):
        return torch.from_numpy(
            np.ascontiguousarray(np.asarray(a).transpose(0, 3, 1, 2)))

    class FunctionSepconvStub:
        @staticmethod
        def apply(inp, kv, kh):
            return j2t(our_op.sepconv(t2j(inp), t2j(kv), t2j(kh),
                                      use_pallas=False))

    saved = ref_mod.sepconv
    ref_mod.sepconv = types.SimpleNamespace(
        FunctionSepconv=FunctionSepconvStub)
    try:
        torch.manual_seed(3)
        net = ref_mod.MetaNetwork(resume=False)
        net.eval()
        rs = np.random.RandomState(14)
        # 78x78: 25px replicate margin + 78 = 128 — exactly one x128 tile,
        # minimal CPU cost with the full pad protocol still exercised
        x0 = rs.rand(1, 3, 78, 78).astype(np.float32)
        x1 = rs.rand(1, 3, 78, 78).astype(np.float32)
        with torch.no_grad(), _cpu_cuda_patch():
            # forward builds ReplicationPad2d modules with .cuda() (:261-266)
            expected = _to_nhwc(net(torch.from_numpy(x0),
                                    torch.from_numpy(x1)))
    finally:
        ref_mod.sepconv = saved

    merged = _convert(net, our_sepconv.init(jax.random.PRNGKey(0)))
    got = our_sepconv.apply(merged, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                            jnp.asarray(x1.transpose(0, 2, 3, 1)),
                            use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Per-step MetaBatchNormLayer (model_utils.py:419-535)
# ---------------------------------------------------------------------------

def test_meta_batch_norm_matches_reference_torch():
    import torch
    from meta_interpolation_tpu.models import layers as L

    _ref_path()
    from model_utils import MetaBatchNormLayer

    args = types.SimpleNamespace(
        learnable_bn_gamma=True, learnable_bn_beta=True,
        enable_inner_loop_optimizable_bn_params=False,
        number_of_training_steps_per_iter=3)
    torch.manual_seed(11)
    ref = MetaBatchNormLayer(8, device="cpu", args=args,
                             use_per_step_bn_statistics=True)
    # make per-step affine rows distinct so the num_step indexing is pinned
    with torch.no_grad():
        ref.weight.copy_(torch.rand(3, 8) + 0.5)
        ref.bias.copy_(torch.rand(3, 8) - 0.5)

    ours = L.meta_batch_norm_init(8, 3)
    ours["weight"] = jnp.asarray(ref.weight.detach().numpy())
    ours["bias"] = jnp.asarray(ref.bias.detach().numpy())

    rs = np.random.RandomState(11)
    x = rs.rand(4, 8, 6, 5).astype(np.float32)  # NCHW for torch
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    for step in (0, 2):
        out_ref = ref(torch.from_numpy(x), num_step=step,
                      training=True).detach().numpy()
        out_ours, new_stats = L.meta_batch_norm_apply(ours, x_nhwc,
                                                      num_step=step)
        np.testing.assert_allclose(
            np.asarray(out_ours).transpose(0, 3, 1, 2), out_ref,
            rtol=1e-4, atol=1e-5)
        # the reference's F.batch_norm(training=True) updated its
        # running stats row in place — ours must match
        np.testing.assert_allclose(
            np.asarray(new_stats["running_mean"][step]),
            ref.running_mean[step].detach().numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_stats["running_var"][step]),
            ref.running_var[step].detach().numpy(), rtol=1e-4, atol=1e-6)
        ours = new_stats

    # adapted-params path (params dict overrides the per-step affine)
    w = torch.rand(8) + 0.2
    b = torch.rand(8)
    out_ref = ref(torch.from_numpy(x), num_step=1,
                  params={"weight": w, "bias": b},
                  training=True).detach().numpy()
    out_ours, _ = L.meta_batch_norm_apply(
        ours, x_nhwc, num_step=1,
        adapted={"weight": jnp.asarray(w.numpy()),
                 "bias": jnp.asarray(b.numpy())})
    np.testing.assert_allclose(np.asarray(out_ours).transpose(0, 3, 1, 2),
                               out_ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Per-step BN statistics THROUGH AN EPISODE (VERDICT r2 item 5): the
# episode-threaded stat evolution across 2 inner steps must reproduce the
# torch MetaBatchNormLayer driven through the reference's forward sequence
# (meta_learning_system.py:386-432: per step, support pair A then B, then
# the post-adaptation query — every call F.batch_norm(training=True)), and
# eval must leave the meta-level stats untouched (per-task
# restore_backup_stats, :463-464).
# ---------------------------------------------------------------------------

def test_per_step_bn_stats_episode_matches_reference_torch():
    import torch
    from meta_interpolation_tpu.meta.episode import (EpisodeBuilder,
                                                     EpisodeSpec)
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer
    from meta_interpolation_tpu.models import layers as L

    _ref_path()
    from model_utils import MetaBatchNormLayer

    C, S = 5, 2
    args = types.SimpleNamespace(
        learnable_bn_gamma=True, learnable_bn_beta=True,
        enable_inner_loop_optimizable_bn_params=True,  # flat (C,) affine —
        # the combination our voxelflow per-step mode implements
        number_of_training_steps_per_iter=S)
    torch.manual_seed(21)
    ref = MetaBatchNormLayer(C, device="cpu", args=args,
                             use_per_step_bn_statistics=True)

    rs = np.random.RandomState(21)
    frames = rs.rand(7, 4, 6, C).astype(np.float32)
    scale = (rs.rand(C) + 0.5).astype(np.float32)
    bias = (rs.rand(C) - 0.5).astype(np.float32)

    # our model: pred = per-step-BN(f0) with the flat adaptable affine.
    # The BN input is pure data, so the stat evolution decouples from the
    # affine adaptation (which still runs — SGD on scale/bias).
    def apply_fn(params, f0, f1, num_step=0, bn_state=None):
        p = {"weight": params["scale"], "bias": params["bias"],
             "running_mean": bn_state["running_mean"],
             "running_var": bn_state["running_var"]}
        out, new = L.meta_batch_norm_apply(
            p, f0, num_step=num_step,
            adapted={"weight": params["scale"], "bias": params["bias"]})
        return out, {"running_mean": new["running_mean"],
                     "running_var": new["running_var"]}

    def loss_fn(pred, target, aux=None):
        l = jnp.mean(jnp.abs(pred - target))
        return {"L1": l, "total": l}

    opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=S)
    builder = EpisodeBuilder(apply_fn, loss_fn, opt)
    builder.passes_bn_state = True
    net = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    meta = {"net": net, "lrs": opt.init_lrs(net, 0.01),
            "bn_state": {"running_mean": jnp.zeros((S, C)),
                         "running_var": jnp.ones((S, C))}}
    spec = EpisodeSpec(num_steps=S)
    outer_loss, pred, q_loss, bn = builder.task_episode(
        meta, jnp.asarray(frames), jnp.ones((S,)), spec, training=True)

    # torch oracle: the same sequence of training-mode forwards mutating
    # the per-step rows in place
    x_nchw = frames.transpose(0, 3, 1, 2)
    with torch.no_grad():
        w, b = torch.from_numpy(scale), torch.from_numpy(bias)
        for step in range(S):
            for (i0, _it, _i1) in spec.support_idxs:
                ref(torch.from_numpy(x_nchw[i0][None]), num_step=step,
                    params={"weight": w, "bias": b}, training=True)
        ref(torch.from_numpy(x_nchw[spec.target_idxs[0]][None]),
            num_step=S - 1, params={"weight": w, "bias": b}, training=True)

    np.testing.assert_allclose(np.asarray(bn["running_mean"]),
                               ref.running_mean.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bn["running_var"]),
                               ref.running_var.detach().numpy(),
                               rtol=1e-5, atol=1e-6)

    # eval episode: the meta-level state is not mutated (functional), and
    # the returned per-task state is simply dropped by the system —
    # restore_backup_stats semantics
    before = np.asarray(meta["bn_state"]["running_mean"]).copy()
    builder.task_episode(meta, jnp.asarray(frames), jnp.ones((S,)), spec,
                         training=False)
    np.testing.assert_array_equal(
        np.asarray(meta["bn_state"]["running_mean"]), before)


def test_per_step_bn_affine_episode_matches_reference_torch():
    """The OTHER reference BN combination (VERDICT r3 item 6):
    use_per_step_bn_statistics WITHOUT enable_inner_loop_optimizable_bn_params
    — the affine comes from per-step (S, C) rows ``self.weight[num_step]``
    (model_utils.py:453-461, 504-511), outer-trainable but never in the
    inner-loop weight dict (get_inner_loop_parameter_dict drops norm_layer
    names when the enable flag is off, meta_learning_system.py:222-226)."""
    import torch
    from meta_interpolation_tpu.meta.episode import (EpisodeBuilder,
                                                     EpisodeSpec)
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer
    from meta_interpolation_tpu.models import layers as L

    _ref_path()
    from model_utils import MetaBatchNormLayer

    C, S = 5, 2
    args = types.SimpleNamespace(
        learnable_bn_gamma=True, learnable_bn_beta=True,
        enable_inner_loop_optimizable_bn_params=False,  # per-step affine
        number_of_training_steps_per_iter=S)
    torch.manual_seed(33)
    ref = MetaBatchNormLayer(C, device="cpu", args=args,
                             use_per_step_bn_statistics=True)
    rs = np.random.RandomState(33)
    w_rows = (rs.rand(S, C) + 0.5).astype(np.float32)
    b_rows = (rs.rand(S, C) - 0.5).astype(np.float32)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w_rows))
        ref.bias.copy_(torch.from_numpy(b_rows))

    frames = rs.rand(7, 4, 6, C).astype(np.float32)

    # our model: pred = per-step-BN(f0) with per-step affine rows (the
    # voxelflow wiring: row selected by num_step, passed as the effective
    # affine; rows excluded from inner adaptation via inner_mask)
    def apply_fn(params, f0, f1, num_step=0, bn_state=None):
        w = params["scale"][num_step]
        b = params["bias"][num_step]
        p = {"weight": w, "bias": b,
             "running_mean": bn_state["running_mean"],
             "running_var": bn_state["running_var"]}
        out, new = L.meta_batch_norm_apply(
            p, f0, num_step=num_step, adapted={"weight": w, "bias": b})
        return out, {"running_mean": new["running_mean"],
                     "running_var": new["running_var"]}

    def loss_fn(pred, target, aux=None):
        l = jnp.mean(jnp.abs(pred - target))
        return {"L1": l, "total": l}

    opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=S)
    net = {"scale": jnp.asarray(w_rows), "bias": jnp.asarray(b_rows)}
    mask = jax.tree.map(lambda _: jnp.zeros(()), net)  # never inner-adapted
    builder = EpisodeBuilder(apply_fn, loss_fn, opt, inner_mask=mask)
    builder.passes_bn_state = True
    meta = {"net": net, "lrs": opt.init_lrs(net, 0.01),
            "bn_state": {"running_mean": jnp.zeros((S, C)),
                         "running_var": jnp.ones((S, C))}}
    spec = EpisodeSpec(num_steps=S)
    outer_loss, pred, q_loss, bn = builder.task_episode(
        meta, jnp.asarray(frames), jnp.ones((S,)), spec, training=True)

    # torch oracle: params=None → the layer selects weight[num_step]
    # itself; same call sequence (per step: support A, B; then the query
    # at the last step index — our documented clamp of the reference's
    # latent IndexError)
    x_nchw = frames.transpose(0, 3, 1, 2)
    with torch.no_grad():
        for step in range(S):
            for (i0, _it, _i1) in spec.support_idxs:
                ref(torch.from_numpy(x_nchw[i0][None]), num_step=step,
                    training=True)
        out_ref = ref(torch.from_numpy(x_nchw[spec.target_idxs[0]][None]),
                      num_step=S - 1, training=True).numpy()

    np.testing.assert_allclose(np.asarray(bn["running_mean"]),
                               ref.running_mean.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bn["running_var"]),
                               ref.running_var.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred).transpose(2, 0, 1),
                               out_ref[0], rtol=1e-4, atol=1e-5)

    # the per-step rows must be reachable by the OUTER gradient (they are
    # requires_grad=True meta-parameters in the reference)
    def outer(meta_p):
        loss, _, _, _ = builder.task_episode(
            meta_p, jnp.asarray(frames), jnp.ones((S,)), spec,
            training=True)
        return loss

    g = jax.grad(outer)(meta)
    assert float(jnp.abs(g["net"]["scale"]).max()) > 0.0
    assert float(jnp.abs(g["net"]["bias"]).max()) > 0.0


def test_per_step_bn_sequential_task_fold_matches_reference_torch():
    """batch_size > 1: the reference mutates the SHARED per-step BN stats
    task-by-task within one iteration (meta_learning_system.py:366 loop) —
    momentum compounding, not averaging. Our vmapped per-task episodes +
    episode.fold_bn_states_sequential (closed-form affine composition)
    must equal a sequentially-mutated torch oracle at B=3, both without
    and with MSL (whose per-step query forwards add stat updates)."""
    import torch
    from meta_interpolation_tpu.meta import episode as episode_lib
    from meta_interpolation_tpu.meta.episode import (EpisodeBuilder,
                                                     EpisodeSpec)
    from meta_interpolation_tpu.meta.inner_optimizers import InnerOptimizer
    from meta_interpolation_tpu.models import layers as L

    _ref_path()
    from model_utils import MetaBatchNormLayer

    C, S, B = 5, 2, 3
    rs = np.random.RandomState(7)
    frames = rs.rand(B, 7, 4, 6, C).astype(np.float32)
    scale = (rs.rand(C) + 0.5).astype(np.float32)
    bias = (rs.rand(C) - 0.5).astype(np.float32)

    def apply_fn(params, f0, f1, num_step=0, bn_state=None):
        p = {"weight": params["scale"], "bias": params["bias"],
             "running_mean": bn_state["running_mean"],
             "running_var": bn_state["running_var"]}
        out, new = L.meta_batch_norm_apply(
            p, f0, num_step=num_step,
            adapted={"weight": params["scale"], "bias": params["bias"]})
        return out, {"running_mean": new["running_mean"],
                     "running_var": new["running_var"]}

    def loss_fn(pred, target, aux=None):
        l = jnp.mean(jnp.abs(pred - target))
        return {"L1": l, "total": l}

    for use_msl in (False, True):
        opt = InnerOptimizer(rule="SGD", lr_mode="fixed", num_steps=S)
        builder = EpisodeBuilder(apply_fn, loss_fn, opt)
        builder.passes_bn_state = True
        net = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
        meta = {"net": net, "lrs": opt.init_lrs(net, 0.01),
                "bn_state": {"running_mean": jnp.zeros((S, C)),
                             "running_var": jnp.ones((S, C))}}
        spec = EpisodeSpec(num_steps=S, use_msl=use_msl)
        _, aux = builder.batched_episode(meta, jnp.asarray(frames),
                                         jnp.ones((S,)) / S, spec,
                                         training=True)
        assert aux["bn_state"]["running_mean"].shape == (B, S, C)
        folded = episode_lib.fold_bn_states_sequential(
            meta["bn_state"], aux["bn_state"], spec)

        args = types.SimpleNamespace(
            learnable_bn_gamma=True, learnable_bn_beta=True,
            enable_inner_loop_optimizable_bn_params=True,
            number_of_training_steps_per_iter=S)
        torch.manual_seed(7)
        ref = MetaBatchNormLayer(C, device="cpu", args=args,
                                 use_per_step_bn_statistics=True)
        w, b = torch.from_numpy(scale), torch.from_numpy(bias)
        with torch.no_grad():
            for k in range(B):  # tasks sequentially mutate shared state
                x = frames[k].transpose(0, 3, 1, 2)
                for step in range(S):
                    for (i0, _it, _i1) in spec.support_idxs:
                        ref(torch.from_numpy(x[i0][None]), num_step=step,
                            params={"weight": w, "bias": b}, training=True)
                    if use_msl and step < S - 1:
                        # MSL: per-step query criterion forward
                        ref(torch.from_numpy(x[spec.target_idxs[0]][None]),
                            num_step=step, params={"weight": w, "bias": b},
                            training=True)
                ref(torch.from_numpy(x[spec.target_idxs[0]][None]),
                    num_step=S - 1, params={"weight": w, "bias": b},
                    training=True)
        np.testing.assert_allclose(np.asarray(folded["running_mean"]),
                                   ref.running_mean.detach().numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=f"msl={use_msl}")
        np.testing.assert_allclose(np.asarray(folded["running_var"]),
                                   ref.running_var.detach().numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=f"msl={use_msl}")


# ---------------------------------------------------------------------------
# DAIN — COMPOSED full forward (DAIN.py:495-646) with our native ops
# substituted on the torch side (the CUDA extensions cannot run on CPU;
# both sides use identical projection/filter-interp values, so this pins
# the entire composition: padding, depth/context/filter paths, bidirectional
# PWC flows x div_flow x timestep, depth-weighted projection with eval
# hole-filling, filter interpolation, rectification, unpadding)
# ---------------------------------------------------------------------------

def test_dain_composed_forward_matches_reference_torch(dain_ref):
    import torch
    # NOTE: `import dain.networks.DAIN` resolves the attribute to the DAIN
    # *class* (the package __init__ star-imports shadow the submodule) —
    # grab the real module object from sys.modules
    ref_dain_mod = sys.modules["dain.networks.DAIN"]
    from meta_interpolation_tpu.models.dain import model as our_dain
    from meta_interpolation_tpu.ops.flow_projection import flow_projection
    from meta_interpolation_tpu.ops.filter_interpolation import (
        filter_interpolation)

    def t2j(t):
        return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))

    def j2t(a):
        return torch.from_numpy(
            np.ascontiguousarray(np.asarray(a).transpose(0, 3, 1, 2)))

    class DepthFlowProjStub(torch.nn.Module):
        def __init__(self, requires_grad=True):
            super().__init__()
            self.fill = not requires_grad  # DepthFlowProjectionLayer.py:42

        def forward(self, flow, depth_inv):
            out = flow_projection(t2j(flow), t2j(depth_inv),
                                  fill_hole=self.fill)
            return j2t(out)

    class FilterInterpStub(torch.nn.Module):
        def forward(self, img, offset, filt):
            return j2t(filter_interpolation(t2j(img), t2j(offset),
                                            t2j(filt)))

    from meta_interpolation_tpu.ops.correlation import correlation

    class CorrStub(torch.nn.Module):
        def forward(self, a, b):
            out = np.asarray(correlation(t2j(a), t2j(b)))
            return torch.from_numpy(
                np.ascontiguousarray(out.transpose(0, 3, 1, 2)))

    # float64 on BOTH sides: in f32, flow values within conv-noise (~1e-6)
    # of integer cell boundaries flip floor/scatter decisions between
    # frameworks, producing ~3.5 % locally-large mismatches that are
    # discretization artifacts, not math differences. Doubles make the
    # composition bit-stable.
    import copy
    net = copy.deepcopy(dain_ref).double()
    net.eval()
    rs = np.random.RandomState(12)
    x0 = rs.rand(1, 3, 64, 64)
    x2 = rs.rand(1, 3, 64, 64)

    saved = (ref_dain_mod.DepthFlowProjectionModule,
             ref_dain_mod.FilterInterpolationModule, net.flownets.corr)
    ref_dain_mod.DepthFlowProjectionModule = DepthFlowProjStub
    ref_dain_mod.FilterInterpolationModule = FilterInterpStub
    net.flownets.corr = CorrStub()
    @contextlib.contextmanager
    def enable_x64():
        old = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", old)

    try:
        with torch.no_grad(), _cpu_cuda_patch(), enable_x64():
            # PWC caches a float32 grid at __init__ — redo in doubles;
            # the warp mask is built via torch.cuda.FloatTensor
            # (PWCNet.py:188), so that alias must be double too
            net.flownets.grid = net.flownets.grid.double()
            torch.cuda.FloatTensor = torch.DoubleTensor
            stacked = torch.stack([torch.from_numpy(x0),
                                   torch.from_numpy(x2)])
            _, out_ref = net(stacked)
            expected = _to_nhwc(out_ref)
            assert np.all(np.isfinite(expected)), "oracle non-finite"

            merged = _convert(
                net, jax.tree.map(lambda x: x.astype(jnp.float64),
                                  our_dain.init(jax.random.PRNGKey(0))),
                convtranspose_pred=lambda parts: (
                    "flownets" in parts
                    and parts[-2].startswith(("deconv", "upfeat"))))
            got = our_dain.apply(merged,
                                 jnp.asarray(x0.transpose(0, 2, 3, 1)),
                                 jnp.asarray(x2.transpose(0, 2, 3, 1)),
                                 fill_holes=True)  # no_grad => fillhole
    finally:
        (ref_dain_mod.DepthFlowProjectionModule,
         ref_dain_mod.FilterInterpolationModule,
         net.flownets.corr) = saved
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6,
                               atol=1e-7)
