"""Split-program DAIN: stage1 = depth/ctx/filters/flows/projection,
stage2 = filter-interp + rectify, as separate jit programs chained through
device-resident intermediates. Compares against the monolithic apply.

Run: python scripts/dain_split.py [batch]
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

from meta_interpolation_tpu.models.dain import (  # noqa: E402
    hourglass, model, mononet, rectify, s2df)
from meta_interpolation_tpu.ops.filter_interpolation import (  # noqa: E402
    filter_interpolation)
from meta_interpolation_tpu.ops.flow_projection import (  # noqa: E402
    flow_projection)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
H, W = 256, 448
DT = jnp.bfloat16

params = jax.tree.map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
    model.init(jax.random.PRNGKey(0)))
rs = np.random.RandomState(0)
x0_h = jnp.asarray(rs.rand(B, H, W, 3), DT)
x2_h = jnp.asarray(rs.rand(B, H, W, 3), DT)


@jax.jit
def stage1(x0, x2):
    both = jnp.concatenate([x0, x2], axis=0)
    log_depth = hourglass.apply(params["depthNet"], both)
    n = x0.shape[0]
    ld0, ld2 = log_depth[:n], log_depth[n:]
    ctx0 = jnp.concatenate([s2df.apply(params["ctxNet"], x0), ld0], axis=-1)
    ctx2 = jnp.concatenate([s2df.apply(params["ctxNet"], x2), ld2], axis=-1)
    filt0, filt2 = mononet.apply(params, jnp.concatenate([x0, x2], axis=-1))
    depth_inv0 = jnp.clip(1e-6 + jnp.exp(-ld0), 0.0, 1e8)
    depth_inv2 = jnp.clip(1e-6 + jnp.exp(-ld2), 0.0, 1e8)
    flow_02 = model._flow_branch(params, x0, x2, model.TIMESTEP)
    flow_20 = model._flow_branch(params, x2, x0, model.TIMESTEP)
    off0 = flow_projection(flow_02, depth_inv0, proj_range=8)
    off2 = flow_projection(flow_20, depth_inv2, proj_range=8)
    return ctx0, ctx2, filt0, filt2, off0, off2


@jax.jit
def stage2(x0, x2, ctx0, ctx2, filt0, filt2, off0, off2):
    ctx0_w = filter_interpolation(ctx0, off0, filt0)
    ctx2_w = filter_interpolation(ctx2, off2, filt2)
    ref0 = filter_interpolation(x0, off0, filt0)
    ref2 = filter_interpolation(x2, off2, filt2)
    coarse = ref0 / 2.0 + ref2 / 2.0
    rect_in = jnp.concatenate([coarse, ref0, ref2, off0, off2,
                               filt0, filt2, ctx0_w, ctx2_w], axis=-1)
    return rectify.apply(params["rectifyNet"], rect_in) + coarse


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


def split(a, b):
    ctx0, ctx2, filt0, filt2, off0, off2 = stage1(a, b)
    return stage2(a, b, ctx0, ctx2, filt0, filt2, off0, off2)


def mono(a, b):
    return model.apply(params, a, b, proj_range=8)


mono_j = jax.jit(mono)
print(f"batch={B}")
print(f"  monolithic  {marginal_ms(mono_j):8.2f} ms")
print(f"  split 2-way {marginal_ms(split):8.2f} ms")
print(f"  stage1 only {marginal_ms(lambda a, b: stage1(a, b)[4]):8.2f} ms")
