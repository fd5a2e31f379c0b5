"""LPIPS port tests: torch-oracle round trip + metric properties."""
import jax
import jax.numpy as jnp
import numpy as np

from meta_interpolation_tpu.utils import lpips as L


def _torch_alex():
    import torch
    import torch.nn as nn
    mods = []
    in_ch = 3
    for kind, out_ch, k, s, p in L._ALEX_LAYERS:
        if kind == "conv":
            mods.append(nn.Conv2d(in_ch, out_ch, k, stride=s, padding=p))
            in_ch = out_ch
        elif kind == "relu":
            mods.append(nn.ReLU())
        else:
            mods.append(nn.MaxPool2d(k, s))
    torch.manual_seed(0)
    return nn.Sequential(*mods)


def test_lpips_matches_torch_oracle():
    """Round trip: convert a locally-built torch AlexNet `features` stack
    + random lin weights, then pin our lpips() against a torch
    re-implementation of the lpips pipeline (scaling layer → features at
    module indices 1,4,7,9,11 → unit-normalize → lin → spatial mean)."""
    import torch

    feats = _torch_alex()
    sd = {k: v.detach().numpy() for k, v in feats.state_dict().items()}
    convs = L.load_alexnet_from_torch_state(sd)
    rs = np.random.RandomState(0)
    lin_w = [np.abs(rs.rand(1, c, 1, 1).astype(np.float32)) / c
             for c in L._LIN_CHANNELS]
    lins = L.load_lins_from_torch_state(
        {f"lin{i}.model.1.weight": w for i, w in enumerate(lin_w)})
    params = {"convs": convs, "lins": lins}

    x0 = rs.rand(2, 3, 64, 64).astype(np.float32)
    x1 = rs.rand(2, 3, 64, 64).astype(np.float32)

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def torch_feats(x):
        h = (2 * torch.from_numpy(x) - 1 - shift) / scale
        out = []
        for idx, m in enumerate(feats):
            h = m(h)
            if idx in L._FEATURE_IDXS:
                out.append(h)
        return out

    with torch.no_grad():
        f0 = torch_feats(x0)
        f1 = torch_feats(x1)
        expected = torch.zeros(2)
        for i, (a, b) in enumerate(zip(f0, f1)):
            na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
            nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
            d2 = (na - nb) ** 2
            w = torch.from_numpy(lin_w[i])
            expected += (d2 * w).sum(1).mean((1, 2))

    got = L.lpips(params, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                  jnp.asarray(x1.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_lpips_properties():
    params = L.init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    a = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32))
    d_aa = float(L.lpips(params, a, a)[0])
    d_ab = float(L.lpips(params, a, b)[0])
    d_ba = float(L.lpips(params, b, a)[0])
    assert abs(d_aa) < 1e-6
    assert d_ab > 0
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_eval_lpips_hook_runs():
    from meta_interpolation_tpu.utils.profiling import eval_lpips
    rs = np.random.RandomState(2)
    a = rs.rand(1, 32, 32, 3).astype(np.float32)
    v = eval_lpips(jnp.asarray(a), jnp.asarray(a))
    assert abs(v) < 1e-6
