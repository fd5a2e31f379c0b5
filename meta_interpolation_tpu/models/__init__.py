"""Model zoo — functional VFI backbones.

Each model module exposes
  * ``init(rng, **kwargs) -> params``     (a nested-dict pytree)
  * ``apply(params, frame0, frame1, **kwargs) -> prediction``  (pure)

and registers itself in :mod:`meta_interpolation_tpu.models.registry`. The
params tree mirrors the reference torch ``state_dict`` structure so the
``.pth``-to-pytree converter (core/checkpoint.py) is a mechanical rename.

The reference threads a ``params=dict`` through every nn.Module
(``/root/reference/model_utils.py:272-363``) to make torch modules functional;
in JAX the models are functional by construction, so there is no separate
"Meta" variant — ``apply`` *is* the meta-learnable path.
"""
from . import registry  # noqa: F401
