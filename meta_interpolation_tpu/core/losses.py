"""Loss library — ``"w1*TYPE1+w2*TYPE2"`` spec parser and loss implementations.

Reference: ``/root/reference/loss.py:278-350`` (parser + weighted sum returning
``{type: weighted_loss, ..., 'total': sum}``), with loss types:

  * ``MSE``, ``L1``              — plain pixel losses
  * ``SSIM``                     — DSSIM = (1 - ssim)/2, data-detected range
                                   (loss.py:294, pytorch_msssim/__init__.py:108-131)
  * ``VGG22/33/44/54/P``         — VGG19-feature MSE perceptual loss
                                   (loss.py:19-78); here a flax VGG19 whose
                                   weights can be imported from a torchvision
                                   ``.pth`` (random-init fallback, see VGGFeatures)
  * ``Super``                    — SuperSloMo composite: 204*recn + 102*warp +
                                   0.005*perceptual + smoothness (loss.py:246-274)
  * ``GAN/WGAN/WGAN_GP``         — adversarial loss with an internal
                                   discriminator (loss.py:82-236); the generator
                                   term is pure, discriminator updates happen in
                                   AdversarialState.update_discriminator outside
                                   the jitted inner loop (TPU-design deviation,
                                   documented in the class).

Everything a jitted episode touches is a *pure* function of
``(pred, target, aux)`` built by :func:`make_loss_fn`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def dssim_loss(pred, target):
    """(1 - SSIM)/2 (reference SSIM loss class).

    val_range=None: the reference class never forwards its val_range to
    ssim() (pytorch_msssim/__init__.py:119-131), so the range is detected
    from the data (L=2 for mean-shifted/tanh spaces, 1 for sigmoid) —
    matters because the loss runs on raw model-space tensors."""
    s = metrics.ssim(pred, target, val_range=None)
    return (1.0 - s) / 2.0


def charbonnier_loss(pred, target, epsilon=1e-6):
    """Charbonnier (DAIN's training loss — dain/loss_function.py:14-24)."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + epsilon))


# ---------------------------------------------------------------------------
# VGG19 feature extractor (perceptual losses)
# ---------------------------------------------------------------------------

# torchvision vgg19.features layer table: (type, out_channels); index matters
# because the reference slices by module index (loss.py:24-39).
_VGG19_LAYERS: List[Tuple[str, int]] = [
    ("conv", 64), ("relu", 0), ("conv", 64), ("relu", 0), ("pool", 0),
    ("conv", 128), ("relu", 0), ("conv", 128), ("relu", 0), ("pool", 0),
    ("conv", 256), ("relu", 0), ("conv", 256), ("relu", 0), ("conv", 256),
    ("relu", 0), ("conv", 256), ("relu", 0), ("pool", 0),
    ("conv", 512), ("relu", 0), ("conv", 512), ("relu", 0), ("conv", 512),
    ("relu", 0), ("conv", 512), ("relu", 0), ("pool", 0),
    ("conv", 512), ("relu", 0), ("conv", 512), ("relu", 0), ("conv", 512),
    ("relu", 0), ("conv", 512), ("relu", 0), ("pool", 0),
]
# module-index cut points used by the reference for VGG{22,33,44,54}
_VGG_CUTS = {"22": 8, "33": 16, "44": 26, "54": 35}
# numpy (NOT jnp) so importing this module never initializes the JAX
# backend — the force-CPU-after-import pattern (CLAUDE.md) relies on no
# backend use happening at import time
_VGG_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_VGG_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _init_vgg_params(rng: jax.Array, layers) -> Dict[str, Any]:
    """He-init a VGG conv stack described by a (kind, out_ch) layer table.

    Real perceptual numbers need torchvision weights — import them with
    :func:`load_vgg19_from_torch_state` / :func:`load_vgg16_from_torch_state`.
    The random init keeps the loss *functional* (correct shapes/flow) when
    the pretrained file is absent.
    """
    params = {}
    in_ch = 3
    conv_i = 0
    for kind, out_ch in layers:
        if kind == "conv":
            rng, k1 = jax.random.split(rng)
            fan_in = 3 * 3 * in_ch
            w = jax.random.normal(k1, (3, 3, in_ch, out_ch)) * jnp.sqrt(2.0 / fan_in)
            params[f"conv_{conv_i}"] = {"kernel": w, "bias": jnp.zeros((out_ch,))}
            conv_i += 1
            in_ch = out_ch
    return params


def _load_vgg_from_torch_state(state_dict, layers) -> Dict[str, Any]:
    """Convert a torchvision ``vggNN().features.state_dict()`` to our pytree,
    mapping torchvision module indices to conv ordinals. torch conv weights
    are OIHW; flax kernels are HWIO."""
    params = {}
    conv_i = 0
    for idx, (kind, _c) in enumerate(layers):
        if kind != "conv":
            continue
        wk = f"{idx}.weight"
        if wk not in state_dict:
            break
        w = np.asarray(state_dict[wk])
        b = np.asarray(state_dict[f"{idx}.bias"])
        params[f"conv_{conv_i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
        conv_i += 1
    return params


def init_vgg19_params(rng: jax.Array, max_cut: int = 35) -> Dict[str, Any]:
    """He-init VGG19 conv stack up to torchvision module index ``max_cut``."""
    return _init_vgg_params(rng, _VGG19_LAYERS[:max_cut])


def load_vgg19_from_torch_state(state_dict) -> Dict[str, Any]:
    return _load_vgg_from_torch_state(state_dict, _VGG19_LAYERS)


# Pretrained-weight search path. The reference's perceptual losses are
# *defined* by torchvision weights (loss.py:19-78); with zero egress this
# box cannot download them, so the builder searches these locations for a
# torch state_dict of `vgg19(pretrained=True).features` (file
# vgg19_features.pth) / `vgg16(...).features` (vgg16_features.pth):
#   1. $MIT_VGG_WEIGHTS (a directory)
#   2. ./pretrained_models/
#   3. ~/.cache/meta_interpolation_tpu/weights/
# Save one with:  torch.save(torchvision.models.vgg19(pretrained=True)
#                            .features.state_dict(), 'vgg19_features.pth')
VGG_WEIGHTS_ENV = "MIT_VGG_WEIGHTS"


def _vgg_weight_search_dirs() -> List[str]:
    import os
    dirs = []
    env = os.environ.get(VGG_WEIGHTS_ENV)
    if env:
        dirs.append(env)
    dirs.append("pretrained_models")
    dirs.append(os.path.expanduser("~/.cache/meta_interpolation_tpu/weights"))
    return dirs


def find_pretrained_vgg(name: str) -> Optional[str]:
    """Locate ``{name}.pth`` (name ∈ vgg19_features / vgg16_features)."""
    import os
    for d in _vgg_weight_search_dirs():
        p = os.path.join(d, f"{name}.pth")
        if os.path.isfile(p):
            return p
    return None


def _load_pretrained_or_warn(kind: str):
    """Return converted pretrained params, or None with a LOUD warning —
    training a VGG-term loss against random features silently optimizes
    the wrong objective (VERDICT.md round-1 item 2)."""
    from . import checkpoint as ckpt_lib
    name = f"{kind}_features"
    path = find_pretrained_vgg(name)
    if path is not None:
        sd = ckpt_lib.load_torch_file(path)
        params = (load_vgg19_from_torch_state(sd) if kind == "vgg19"
                  else load_vgg16_from_torch_state(sd))
        print(f"[losses] loaded pretrained {kind} features from {path}")
        return params
    import sys
    print(
        f"\n{'!' * 72}\n"
        f"[losses] WARNING: no pretrained {kind} weights found — the "
        f"perceptual/Super loss will run on RANDOM-INIT features.\n"
        f"         The reference defines these losses by torchvision "
        f"weights (loss.py:19-78); numbers will NOT match it.\n"
        f"         Provide {name}.pth in one of: "
        f"{_vgg_weight_search_dirs()}\n"
        f"         (torch.save(torchvision.models.{kind}(pretrained=True)"
        f".features.state_dict(), '{name}.pth'))\n{'!' * 72}\n",
        file=sys.stderr, flush=True)
    return None


def _conv3x3(x, p):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def vgg19_features(params: Dict[str, Any], x: jnp.ndarray, cut: int,
                   collect: Optional[List[int]] = None):
    """Run the VGG19 stack to module index ``cut``; NHWC input in [0,1].

    Applies the reference's MeanShift normalization first (loss.py:42-44).
    If ``collect`` is given, returns features at those module indices (for the
    multi-layer ``VGGP`` variant, loss.py:33-39,54-70).
    """
    x = (x - _VGG_MEAN) / _VGG_STD
    feats = []
    conv_i = 0
    for idx, (kind, _c) in enumerate(_VGG19_LAYERS[:cut]):
        if kind == "conv":
            x = _conv3x3(x, params[f"conv_{conv_i}"])
            conv_i += 1
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:  # pool
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        if collect is not None and (idx + 1) in collect:
            feats.append(x)
    if collect is not None:
        return feats
    return x


def vgg_perceptual_loss(params, pred, target, conv_index: str):
    """MSE in VGG19 feature space (loss.py:49-78)."""
    if conv_index == "P":
        cuts = [8, 16, 26, 35]
        f_pred = vgg19_features(params, pred, 35, collect=cuts)
        f_tgt = vgg19_features(params, jax.lax.stop_gradient(target), 35, collect=cuts)
        return sum(mse_loss(a, jax.lax.stop_gradient(b)) for a, b in zip(f_pred, f_tgt))
    cut = _VGG_CUTS[conv_index]
    f_pred = vgg19_features(params, pred, cut)
    f_tgt = jax.lax.stop_gradient(vgg19_features(params, target, cut))
    return mse_loss(f_pred, f_tgt)


# ---------------------------------------------------------------------------
# SuperSloMo composite loss
# ---------------------------------------------------------------------------

def superslomo_loss(pred, target, aux: Dict[str, Any],
                    vgg16_params: Optional[Dict[str, Any]] = None):
    """204*recn + 102*warp + 0.005*perceptual + smoothness (loss.py:246-274).

    ``aux`` carries the model intermediates: ``bidirectional_flow`` (F_0_1,
    F_1_0), ``warped_intermediate_frames`` (I_0_t, I_1_t),
    ``warped_input_frames`` (I_0_1, I_1_0), ``I0``, ``I1``. All NHWC; flows
    have channel-last (dx, dy).
    """
    F_0_1, F_1_0 = aux["bidirectional_flow"]
    I_0_t, I_1_t = aux["warped_intermediate_frames"]
    I_0_1, I_1_0 = aux["warped_input_frames"]
    I0, I1 = aux["I0"], aux["I1"]

    recn = l1_loss(pred, target)
    if vgg16_params is not None:
        # VGG16 conv4_3 features — reference uses vgg16 children()[0][:22]
        f_pred = vgg16_features(vgg16_params, pred)
        f_tgt = jax.lax.stop_gradient(vgg16_features(vgg16_params, target))
        prcp = mse_loss(f_pred, f_tgt)
    else:
        prcp = 0.0
    warp = (l1_loss(I_0_t, target) + l1_loss(I_1_t, target)
            + l1_loss(I_0_1, I1) + l1_loss(I_1_0, I0))

    def tv(f):
        return (jnp.mean(jnp.abs(f[:, :, :-1, :] - f[:, :, 1:, :]))
                + jnp.mean(jnp.abs(f[:, :-1, :, :] - f[:, 1:, :, :])))

    smooth = tv(F_1_0) + tv(F_0_1)
    return 204.0 * recn + 102.0 * warp + 0.005 * prcp + smooth


# VGG16 conv stack to conv4_3 (torchvision children()[0][:22])
_VGG16_LAYERS: List[Tuple[str, int]] = [
    ("conv", 64), ("relu", 0), ("conv", 64), ("relu", 0), ("pool", 0),
    ("conv", 128), ("relu", 0), ("conv", 128), ("relu", 0), ("pool", 0),
    ("conv", 256), ("relu", 0), ("conv", 256), ("relu", 0), ("conv", 256),
    ("relu", 0), ("pool", 0),
    ("conv", 512), ("relu", 0), ("conv", 512), ("relu", 0), ("conv", 512),
]


def init_vgg16_params(rng: jax.Array) -> Dict[str, Any]:
    return _init_vgg_params(rng, _VGG16_LAYERS)


def load_vgg16_from_torch_state(state_dict) -> Dict[str, Any]:
    return _load_vgg_from_torch_state(state_dict, _VGG16_LAYERS)


def vgg16_features(params, x):
    """VGG16 to conv4_3 (no trailing relu), NHWC in [0,1]."""
    conv_i = 0
    for kind, _c in _VGG16_LAYERS:
        if kind == "conv":
            x = _conv3x3(x, params[f"conv_{conv_i}"])
            conv_i += 1
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return x


# ---------------------------------------------------------------------------
# Spec parser → pure loss fn
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LossSpec:
    weight: float
    loss_type: str


def parse_loss_spec(spec: str) -> List[LossSpec]:
    """Parse ``"1*L1+0.1*VGG22"`` (reference loss.py:285-298)."""
    out = []
    for term in spec.split("+"):
        weight, loss_type = term.split("*")
        out.append(LossSpec(float(weight), loss_type))
    return out


LossFn = Callable[..., Dict[str, jnp.ndarray]]


def make_loss_fn(spec: str,
                 vgg19_params: Optional[Dict[str, Any]] = None,
                 vgg16_params: Optional[Dict[str, Any]] = None,
                 rng: Optional[jax.Array] = None,
                 patch_size: int = 96) -> LossFn:
    """Build a pure ``loss_fn(pred, target, aux=None) -> {type: w*loss, 'total'}``.

    Mirrors reference Loss.forward (loss.py:325-350): each term is weighted,
    'total' is the sum. Adversarial terms contribute only the generator loss
    here (see module docstring).
    """
    terms = parse_loss_spec(spec)
    needs_vgg19 = any(t.loss_type.startswith("VGG") for t in terms)
    # "SuperNoPrcp" = the Super composite with the perceptual term
    # DROPPED (204*recn + 102*warp + smoothness): with zero egress the
    # VGG16 weights that define the 0.005*prcp term are unavailable, and
    # random-init features are pure noise — this variant trains the
    # reference's default SuperSloMo loss path (loss.py:246-274 minus
    # :263) on honest terms (VERDICT r4 item 7).
    needs_vgg16 = any(t.loss_type == "Super" for t in terms)
    if needs_vgg19 and vgg19_params is None:
        vgg19_params = _load_pretrained_or_warn("vgg19")
    if needs_vgg19 and vgg19_params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        max_cut = max(_VGG_CUTS.get(t.loss_type[3:], 35)
                      for t in terms if t.loss_type.startswith("VGG"))
        vgg19_params = init_vgg19_params(rng, max_cut=max_cut)
    if needs_vgg16 and vgg16_params is None:
        vgg16_params = _load_pretrained_or_warn("vgg16")
    if needs_vgg16 and vgg16_params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vgg16_params = init_vgg16_params(rng)

    def loss_fn(pred, target, aux: Optional[Dict[str, Any]] = None,
                ctx: Optional[Dict[str, Any]] = None):
        """``ctx`` carries traced loss-side parameters — only
        ``{'disc': params}`` is consumed (the GAN type comes from the
        parsed spec term and the patch size from the builder closure) —
        so jit never bakes stale discriminator weights into the
        episode."""
        losses: Dict[str, jnp.ndarray] = {}
        total = 0.0
        for t in terms:
            lt = t.loss_type
            if lt == "MSE":
                val = mse_loss(pred, target)
            elif lt == "L1":
                val = l1_loss(pred, target)
            elif lt == "SSIM":
                val = dssim_loss(pred, target)
            elif lt == "Charb":
                val = charbonnier_loss(pred, target)
            elif lt.startswith("VGG"):
                val = vgg_perceptual_loss(vgg19_params, pred, target, lt[3:])
            elif lt == "SuperNoPrcp":
                # Super composite minus the (VGG16-defined) perceptual
                # term — see needs_vgg16 note above
                val = superslomo_loss(pred, target, aux or {}, None)
            elif "Super" in lt:
                val = superslomo_loss(pred, target, aux or {}, vgg16_params)
            elif "GAN" in lt:
                if ctx is None or "disc" not in ctx:
                    raise ValueError(
                        "adversarial loss needs ctx={'disc': params, ...} — "
                        "wired by SceneAdaptiveInterpolation when --loss "
                        "contains a GAN term")
                from .adversarial import generator_loss
                val = generator_loss(ctx["disc"], pred, lt, patch_size)
            else:
                raise ValueError(f"unknown loss type: {lt}")
            eff = t.weight * val
            losses[lt] = eff
            total = total + eff
        losses["total"] = total
        return losses

    return loss_fn
