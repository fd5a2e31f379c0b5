"""Four DAIN filter-interps as ONE jitted program over host-pushed inputs.

If this measures ~sum-of-standalone (~19 ms) the in-model slowness comes
from intermediates (layout/scheduling); if ~90 ms the 4-op program is
inherently slow (HBM contention of the 16-tap materialization).

Run: python scripts/dain_fi4.py [batch]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_interpolation_tpu.core import compile_cache  # noqa: E402

compile_cache.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from meta_interpolation_tpu.ops.filter_interpolation import (  # noqa: E402
    filter_interpolation)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
H, W = 256, 448
DT = jnp.bfloat16
rs = np.random.RandomState(0)

x0 = jnp.asarray(rs.rand(B, H, W, 3), DT)
x2 = jnp.asarray(rs.rand(B, H, W, 3), DT)
ctx0 = jnp.asarray(rs.rand(B, H, W, 196), DT)
ctx2 = jnp.asarray(rs.rand(B, H, W, 196), DT)
off0 = jnp.asarray(rs.rand(B, H, W, 2) * 8 - 4, DT)
off2 = jnp.asarray(rs.rand(B, H, W, 2) * 8 - 4, DT)
filt0 = jnp.asarray(rs.rand(B, H, W, 16), DT)
filt2 = jnp.asarray(rs.rand(B, H, W, 16), DT)


def four(x0, x2, ctx0, ctx2, off0, off2, filt0, filt2):
    a = filter_interpolation(ctx0, off0, filt0)
    b = filter_interpolation(ctx2, off2, filt2)
    c = filter_interpolation(x0, off0, filt0)
    d = filter_interpolation(x2, off2, filt2)
    return a[..., :3] + b[..., :3] + c + d


def marginal_ms(fn, args, iters=8):
    jfn = jax.jit(fn)

    def run(n):
        dep = jnp.zeros((), DT)
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(*((args[0] + dep,) + tuple(args[1:])))
            dep = jnp.ravel(out)[0].astype(DT) * 0
        _ = float(jnp.float32(dep))
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters * 1e3


print(f"batch={B}")
print(f"  ctx-fi alone   "
      f"{marginal_ms(lambda c: filter_interpolation(c, off0, filt0), (ctx0,)):8.2f} ms")
print(f"  frame-fi alone "
      f"{marginal_ms(lambda x: filter_interpolation(x, off0, filt0), (x0,)):8.2f} ms")
print(f"  four-in-one    "
      f"{marginal_ms(four, (x0, x2, ctx0, ctx2, off0, off2, filt0, filt2)):8.2f} ms")
