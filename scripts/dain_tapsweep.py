"""Monolithic DAIN apply with the filter-interp combined-gather threshold
forced to 0 (every call tap-chunked) — isolates whether the B>=2 residual
slowdown is the combined path's index-tensor while-loop rewrite.

Run: python scripts/dain_tapsweep.py [batch]
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

from meta_interpolation_tpu.models.dain import model  # noqa: E402
from meta_interpolation_tpu.ops import filter_interpolation as fi  # noqa: E402

fi._COMBINED_GATHER_BYTES = 0

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H, W = 256, 448
DT = jnp.bfloat16

params = jax.tree.map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
    model.init(jax.random.PRNGKey(0)))
rs = np.random.RandomState(0)
x0_h = jnp.asarray(rs.rand(B, H, W, 3), DT)
x2_h = jnp.asarray(rs.rand(B, H, W, 3), DT)

mono = jax.jit(lambda a, b: model.apply(params, a, b, proj_range=8))


def marginal_ms(fn, iters=6):
    def run(n):
        a = x0_h
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(a, x2_h)
            dep = jnp.ravel(out)[0].astype(DT) * 0
            a = x0_h + dep
        _ = float(jnp.float32(dep))
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters * 1e3


print(f"batch={B} all-tap-chunked mono {marginal_ms(mono):8.2f} ms"
      f" = {B * 1e3 / marginal_ms(mono):6.2f} fps")
