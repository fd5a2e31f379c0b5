"""Test whether DAIN's composition overhead is producer-fusion/layout:
time the full pipeline with optimization_barrier around gather-op inputs.

Run: python scripts/dain_barrier_test.py [batch]
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
from meta_interpolation_tpu.ops import flow_projection as fp  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
H, W = 256, 448
DT = jnp.bfloat16

params = jax.tree.map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
    model.init(jax.random.PRNGKey(0)))
rs = np.random.RandomState(0)
x0_h = jnp.asarray(rs.rand(B, H, W, 3), DT)
x2_h = jnp.asarray(rs.rand(B, H, W, 3), DT)

orig_fi = fi.filter_interpolation
orig_fp = fp.flow_projection


def barrier_fi(img, flow, filters):
    img, flow, filters = jax.lax.optimization_barrier((img, flow, filters))
    return orig_fi(img, flow, filters)


def barrier_fp(flow, depth_inv=None, **kw):
    if depth_inv is None:
        (flow,) = jax.lax.optimization_barrier((flow,))
    else:
        flow, depth_inv = jax.lax.optimization_barrier((flow, depth_inv))
    return orig_fp(flow, depth_inv, **kw)


def marginal_ms(iters=6):
    jfn = jax.jit(lambda a, b: model.apply(params, a, b, proj_range=8))

    def run(n):
        a = x0_h
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(a, x2_h)
            dep = jnp.ravel(out)[0].astype(DT) * 0
            a = x0_h + dep
        _ = float(jnp.float32(dep))
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters * 1e3


import meta_interpolation_tpu.models.dain.model as m  # noqa: E402

print(f"batch={B}")
print(f"  plain                 {marginal_ms():8.2f} ms")
m.filter_interpolation = barrier_fi
print(f"  barrier filtinterp    {marginal_ms():8.2f} ms")
m.flow_projection = barrier_fp
print(f"  barrier fi+proj       {marginal_ms():8.2f} ms")
m.filter_interpolation = orig_fi
print(f"  barrier proj only     {marginal_ms():8.2f} ms")
m.flow_projection = orig_fp
