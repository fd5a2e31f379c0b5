"""Micro-bench bounded flow projection: width 448 vs 512, f32 vs bf16.

Run: python scripts/proj_micro.py
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

rs = np.random.RandomState(0)


def marginal_ms(fn, a, b, iters=16):
    jfn = jax.jit(fn)

    def run(n):
        dep = jnp.zeros((), a.dtype)
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(a + dep, b)
            dep = jnp.ravel(out)[0] * 0
        _ = float(jnp.float32(dep))
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters * 1e3


for w in (448, 512):
    for dt in (jnp.float32, jnp.bfloat16):
        flow = jnp.asarray(rs.rand(1, 256, w, 2) * 8 - 4, dt)
        dinv = jnp.asarray(rs.rand(1, 256, w, 1) + 0.5, dt)
        ms = marginal_ms(lambda f, d: flow_projection(f, d, proj_range=8),
                         flow, dinv)
        print(f"w={w} {jnp.dtype(dt).name:8s} {ms:7.3f} ms")
