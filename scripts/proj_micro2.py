"""Where do the bounded-projection ms go? kernel-only vs full op, and the
jnp plane construction alone.

Run: python scripts/proj_micro2.py
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

from meta_interpolation_tpu.ops.flow_projection import (  # noqa: E402
    flow_projection)
from meta_interpolation_tpu.ops.flow_projection_pallas import (  # noqa: E402
    flow_projection_bounded)

rs = np.random.RandomState(0)


def marginal_ms(fn, a, b, iters=16):
    jfn = jax.jit(fn)

    def run(n):
        dep = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(a + dep.astype(a.dtype), b)
            dep = jnp.ravel(out)[0].astype(jnp.float32) * 0
        _ = float(dep)
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters * 1e3


for w in (448, 512):
    flow = jnp.asarray(rs.rand(1, 256, w, 2) * 8 - 4, jnp.float32)
    dinv = jnp.asarray(rs.rand(1, 256, w, 1) + 0.5, jnp.float32)
    full = marginal_ms(lambda f, d: flow_projection(f, d, proj_range=8),
                      flow, dinv)
    bounded = marginal_ms(
        lambda f, d: flow_projection_bounded(f, d, max_displacement=8)[0],
        flow, dinv)
    print(f"w={w} full op {full:7.3f} ms   bounded(fwd impl) {bounded:7.3f} ms")
