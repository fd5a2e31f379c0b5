"""DAIN prefix-pipeline bisect @448x256 — locate the composition overhead.

scripts/dain_profile.py shows components summing to ~64 ms/frame while the
full jitted apply measures ~144 ms. This times nested prefixes of the real
pipeline (each jitted as one program) so consecutive deltas assign the
overhead to a stage *in composition* (layouts, scheduling, fusion breaks).

Run: python scripts/dain_prefix.py [batch]
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

from meta_interpolation_tpu.models import layers  # noqa: E402
from meta_interpolation_tpu.models.dain import (  # noqa: E402
    hourglass, model, mononet, pwcnet, rectify, s2df)
from meta_interpolation_tpu.ops.filter_interpolation import (  # noqa: E402
    filter_interpolation)
from meta_interpolation_tpu.ops.flow_projection import (  # noqa: E402
    flow_projection)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
PROJ_RANGE = None if "--scatter" in sys.argv else 8
H, W = 256, 448
DT = jnp.bfloat16

params = jax.tree.map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
    model.init(jax.random.PRNGKey(0)))
rs = np.random.RandomState(0)
x0_h = jnp.asarray(rs.rand(B, H, W, 3), DT)
x2_h = jnp.asarray(rs.rand(B, H, W, 3), DT)


def pipeline(x0, x2, upto):
    """The stages of model.apply, truncated after `upto`."""
    both = jnp.concatenate([x0, x2], axis=0)
    log_depth = hourglass.apply(params["depthNet"], both)
    n = x0.shape[0]
    ld0, ld2 = log_depth[:n], log_depth[n:]
    if upto == "depth":
        return ld0 + ld2
    ctx0 = jnp.concatenate([s2df.apply(params["ctxNet"], x0),
                            jax.lax.stop_gradient(ld0)], axis=-1)
    ctx2 = jnp.concatenate([s2df.apply(params["ctxNet"], x2),
                            jax.lax.stop_gradient(ld2)], axis=-1)
    filt0, filt2 = mononet.apply(params, jnp.concatenate([x0, x2], axis=-1))
    if upto == "ctx+filt":
        return ctx0[..., :1] + ctx2[..., :1] + filt0[..., :1] + filt2[..., :1]
    depth_inv0 = jnp.clip(1e-6 + jnp.exp(-ld0), 0.0, 1e8)
    depth_inv2 = jnp.clip(1e-6 + jnp.exp(-ld2), 0.0, 1e8)
    flow_02 = model._flow_branch(params, x0, x2, model.TIMESTEP)
    flow_20 = model._flow_branch(params, x2, x0, model.TIMESTEP)
    if upto == "flows":
        return (ctx0[..., :1] + ctx2[..., :1] + filt0[..., :1]
                + filt2[..., :1] + flow_02[..., :1] + flow_20[..., :1])
    off0 = flow_projection(flow_02, depth_inv0, proj_range=PROJ_RANGE)
    off2 = flow_projection(flow_20, depth_inv2, proj_range=PROJ_RANGE)
    if upto == "proj":
        return (ctx0[..., :1] + ctx2[..., :1] + filt0[..., :1]
                + filt2[..., :1] + off0[..., :1] + off2[..., :1])
    ctx0_w = filter_interpolation(ctx0, jax.lax.stop_gradient(off0),
                                  jax.lax.stop_gradient(filt0))
    ctx2_w = filter_interpolation(ctx2, jax.lax.stop_gradient(off2),
                                  jax.lax.stop_gradient(filt2))
    ref0 = filter_interpolation(x0, off0, filt0)
    ref2 = filter_interpolation(x2, off2, filt2)
    coarse = ref0 / 2.0 + ref2 / 2.0
    if upto == "filtinterp":
        return coarse + ctx0_w[..., :3] + ctx2_w[..., :3]
    rect_in = jnp.concatenate([coarse, ref0, ref2, off0, off2,
                               filt0, filt2, ctx0_w, ctx2_w], axis=-1)
    out = rectify.apply(params["rectifyNet"], rect_in) + coarse
    return out


def marginal_ms(upto, iters=8):
    jfn = jax.jit(lambda a, b: pipeline(a, b, upto))

    def run(n):
        a, b = x0_h, x2_h
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(a, b)
            dep = jnp.ravel(out)[0].astype(DT) * 0
            a = x0_h + dep
        _ = float(jnp.float32(dep))
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters * 1e3


prev = 0.0
print(f"\nbatch={B} proj_range={PROJ_RANGE} (ms per call; delta = stage "
      "cost in composition)")
for stage in ["depth", "ctx+filt", "flows", "proj", "filtinterp", "full"]:
    ms = marginal_ms(stage)
    print(f"  {stage:12s} {ms:8.2f} ms   (+{ms - prev:7.2f})")
    prev = ms
