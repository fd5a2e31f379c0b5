"""Monolithic DAIN apply with the window-gather filter-interp variant
monkeypatched in — does the one-gather 4x4xC form (720 MB temp) survive
the composed forward without loopifying?

Run: python scripts/dain_wingather.py [batch]
"""
import functools
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fi_micro as fim  # noqa: E402

CS = int(sys.argv[2]) if len(sys.argv) > 2 else 196
model.filter_interpolation = functools.partial(fim.fi_window, cs=CS)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
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


ms = marginal_ms(mono)
print(f"batch={B} win{CS} mono {ms:8.2f} ms = {B * 1e3 / ms:6.2f} fps")
