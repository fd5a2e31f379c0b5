"""Import-time stubs that let the reference's GPU-only model files import
on this CPU-only box.

The reference modules are CUDA-era: ``superslomo/model.py:1-8`` imports
torchvision at module top (used only for its transforms namespace — never
in the Meta forward), and ``sepconv/sepconv_op/sepconv.py:1,242`` imports
cupy and uses ``cupy.util.memoize`` as a decorator at import time (the
actual kernel compilation, ``cupy.cuda.compile_with_cache``, only runs
inside the launched functions). Stubbing both in ``sys.modules`` makes the
full Meta modules constructible for CPU oracle parity tests without
touching the reference checkout.
"""
import sys
import types


def stub_torchvision():
    """Satisfy ``import torchvision`` / ``import torchvision.transforms``
    (reference superslomo/model.py:2-3; neither is used by MetaSuperSloMo's
    forward)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def stub_cupy():
    """Satisfy ``import cupy`` + the module-level ``@cupy.util.memoize``
    decorator (reference sepconv/sepconv_op/sepconv.py:1,242). Kernel
    launches stay unimplemented — tests substitute our op for
    ``FunctionSepconv`` before any forward runs."""
    if "cupy" in sys.modules:
        return
    cp = types.ModuleType("cupy")
    util = types.ModuleType("cupy.util")
    util.memoize = lambda **_kw: (lambda f: f)
    cp.util = util
    cp.cuda = types.ModuleType("cupy.cuda")
    sys.modules["cupy"] = cp
