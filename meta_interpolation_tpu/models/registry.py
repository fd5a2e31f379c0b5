"""Model registry — dispatch by ``--model`` name.

Replaces the if/elif chain in the reference
(``/root/reference/meta_learning_system.py:49-81``). Each entry carries the
functional init/apply pair plus the per-model data-normalization convention
(``meta_learning_system.py:70-79, 434-447`` and
``data/vimeo_septuplet.py:31-40,73-81``):

  * cain / sepconv / rrin:   frames in [0,1], prediction in [0,1]
  * superslomo:              frames mean-subtracted by (0.429, 0.431, 0.397)
  * voxelflow:               frames normalized (x*255 - 127.5)/127.5
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ModelDef:
    name: str
    init: Callable[..., Any]
    apply: Callable[..., Any]
    # map [0,1] NHWC frames → model input space
    normalize: Callable[[jnp.ndarray], jnp.ndarray]
    # map model output → [0,1] NHWC for metrics/saving
    denormalize: Callable[[jnp.ndarray], jnp.ndarray]
    pad_multiple: int = 128
    # prediction aux: model returns (pred, aux_dict) instead of pred
    returns_aux: bool = False
    # eval-tiling threshold on H*W (experiment_builder.py:103-104); RRIN 3e5
    tile_pixel_limit: float = 5e5
    # optional params→0/1-mask fn restricting inner-loop adaptation
    # (sepconv subnets, DAIN rectify-net-only — SURVEY.md §2.1)
    inner_mask_fn: Optional[Callable[[Any], Any]] = None
    # optional params→bool-mask fn restricting *outer* trainability
    # (DAIN freezes everything but rectifyNet outer-side too,
    # meta_learning_system.py:96-101; sepconv subnets stay outer-trainable)
    outer_mask_fn: Optional[Callable[[Any], Any]] = None
    # optional name_parts→bool predicate marking torch ConvTranspose2d
    # weights in released .pth files (their (in,out,kh,kw) layout needs a
    # different HWIO transpose than Conv2d's (out,in,kh,kw) — see
    # core/checkpoint._convert_leaf). DAIN's PWC deconv/upfeat layers.
    convtranspose_pred: Optional[Callable[[Any], bool]] = None
    # optional num_steps→bn_state fn: per-step BN running statistics for
    # --per_step_bn_statistics (reference MetaBatchNormLayer with
    # use_per_step_bn_statistics, model_utils.py:453-461). A model with
    # this hook accepts apply(..., bn_state=..., num_step=...) and
    # returns (pred, new_bn_state).
    bn_state_init_fn: Optional[Callable[[int], Any]] = None
    # extra apply-kwargs for EVERY forward inside the meta system. DAIN's
    # flow projection fills holes exactly when the flow does not require
    # grad (DepthFlowProjectionLayer.py:42, keyed on the FLOW tensor);
    # under the meta system all flow-producing subnets are frozen
    # (meta_learning_system.py:96-101), so the reference fills holes on
    # every meta forward — support adaptation included — and so do we
    # ({'fill_holes': True}). Standalone apply() keeps the default
    # fill_holes=False, matching a freshly constructed torch MetaDAIN
    # whose flow requires grad (the parity-oracle configuration).
    meta_apply_kwargs: Optional[dict] = None


_REGISTRY: Dict[str, ModelDef] = {}


def register(model_def: ModelDef):
    _REGISTRY[model_def.name] = model_def
    return model_def


def get(name: str) -> ModelDef:
    name = name.lower()
    if name not in _REGISTRY:
        _load_all()
    if name not in _REGISTRY:
        raise NotImplementedError(
            f"Model {name!r} not implemented; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available() -> Tuple[str, ...]:
    _load_all()
    return tuple(sorted(_REGISTRY))


_identity = lambda x: x

# numpy (NOT jnp): no JAX backend init at import time (the
# force-CPU-after-import pattern, CLAUDE.md)
_SSM_MEAN = np.asarray([0.429, 0.431, 0.397], np.float32)


def _ssm_normalize(x):
    return x - _SSM_MEAN


def _ssm_denormalize(x):
    return x + _SSM_MEAN


def _vf_normalize(x):
    # reference keeps 0-255 then Normalize(mean=127.5, std=127.5)
    return (x * 255.0 - 127.5) / 127.5


def _vf_denormalize(x):
    return (x * 127.5 + 127.5) / 255.0


def _import_warn(e: ImportError) -> None:
    """A model failing to import should not block the others, but the
    error must be visible — a swallowed ImportError turns a typo in a
    model module into 'Model X not implemented'."""
    import warnings
    warnings.warn(f"model module failed to import and was skipped: {e!r}")


def _load_all():
    """Import model modules lazily so optional deps never block the rest."""
    from . import cain as _cain  # noqa: F401
    if "cain" not in _REGISTRY:
        register(ModelDef("cain", _cain.init, _cain.apply,
                          _identity, _identity, pad_multiple=128))
    try:
        from . import sepconv as _sepconv
        if "sepconv" not in _REGISTRY:
            register(ModelDef("sepconv", _sepconv.init, _sepconv.apply,
                              _identity, _identity, pad_multiple=128,
                              inner_mask_fn=_sepconv.inner_mask))
    except ImportError as e:
        _import_warn(e)
    try:
        from . import rrin as _rrin
        if "rrin" not in _REGISTRY:
            register(ModelDef("rrin", _rrin.init, _rrin.apply,
                              _identity, _identity, pad_multiple=128,
                              tile_pixel_limit=3e5,
                              inner_mask_fn=_rrin.inner_mask))
    except ImportError as e:
        _import_warn(e)
    try:
        from . import superslomo as _ssm
        if "superslomo" not in _REGISTRY:
            register(ModelDef("superslomo", _ssm.init, _ssm.apply,
                              _ssm_normalize, _ssm_denormalize,
                              pad_multiple=64, returns_aux=True))
    except ImportError as e:
        _import_warn(e)
    try:
        from . import voxelflow as _vf
        if "voxelflow" not in _REGISTRY:
            register(ModelDef("voxelflow", _vf.init, _vf.apply,
                              _vf_normalize, _vf_denormalize, pad_multiple=64,
                              inner_mask_fn=_vf.inner_mask,
                              outer_mask_fn=_vf.outer_mask,
                              bn_state_init_fn=_vf.init_bn_state))
    except ImportError as e:
        _import_warn(e)
    try:
        from .dain import model as _dain

        def _dain_convtranspose(name_parts):
            # MetaDAIN's only ConvTranspose2d layers live in the PWC nets:
            # flownets.deconv{2-6} / flownets.upfeat{3-6}
            # (dain/PWCNet/PWCNet.py:35-38,86-125). VoxelFlow's same-named
            # "deconv" layers are regular convs — hence the flownets guard.
            return (len(name_parts) >= 2 and "flownets" in name_parts
                    and name_parts[-2].startswith(("deconv", "upfeat")))

        if "dain" not in _REGISTRY:
            register(ModelDef("dain", _dain.init, _dain.apply,
                              _identity, _identity, pad_multiple=64,
                              inner_mask_fn=_dain.inner_mask,
                              outer_mask_fn=_dain.outer_mask,
                              convtranspose_pred=_dain_convtranspose,
                              meta_apply_kwargs={"fill_holes": True}))
    except ImportError as e:
        _import_warn(e)
