"""DAIN component profile @448x256 — where do the ms/frame go?

BASELINE.md's r2 component breakdown (hourglass 15.6, projection 0.6,
filter-interp ~13, rectify 6.0, PWC 3.8, S2DF 2.8) sums to ~42 ms/frame,
but the measured `bench.py --model dain` throughput is 6.3 fps at batch 4
(~159 ms/frame). This script marginal-times the full apply and each
component at matched batch to locate the gap.

Run: python scripts/dain_profile.py [batch]
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
H, W = 256, 448
DT = jnp.bfloat16

params = jax.tree.map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
    model.init(jax.random.PRNGKey(0)))
rs = np.random.RandomState(0)
x0 = jnp.asarray(rs.rand(B, H, W, 3), DT)
x2 = jnp.asarray(rs.rand(B, H, W, 3), DT)


def marginal_ms(fn, *args, iters=8):
    """Chain iterations through a scalar data dependency; (t2N-tN)/N."""
    jfn = jax.jit(fn)

    def run(n):
        dep = jnp.zeros((), DT)
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(*((args[0] + dep,) + args[1:]))
            dep = jnp.ravel(out)[0].astype(DT) * 0
        _ = float(jnp.float32(dep))
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters * 1e3


# intermediates (shapes as in model.apply; 448x256 needs no x64 pad)
both = jnp.concatenate([x0, x2], axis=0)
ld = jax.jit(hourglass.apply)(params["depthNet"], both)
ld0, ld2 = ld[:B], ld[B:]
ctx0 = jnp.concatenate([jax.jit(s2df.apply)(params["ctxNet"], x0), ld0],
                       axis=-1)
depth_inv0 = jnp.clip(1e-6 + jnp.exp(-ld0), 0.0, 1e8)
filt0, filt2 = jax.jit(mononet.apply)(
    params, jnp.concatenate([x0, x2], axis=-1))
flow = jax.jit(
    lambda p, a, b: model._flow_branch(p, a, b, model.TIMESTEP))(
        params, x0, x2)
off0 = jax.jit(lambda f, d: flow_projection(f, d, proj_range=8))(
    flow, depth_inv0)

rows = []
rows.append(("hourglass (batch 2B)",
             marginal_ms(lambda x: hourglass.apply(params["depthNet"], x),
                         both)))
rows.append(("s2df x1",
             marginal_ms(lambda x: s2df.apply(params["ctxNet"], x), x0)))
rows.append(("mononet",
             marginal_ms(lambda x: mononet.apply(params, x)[0],
                         jnp.concatenate([x0, x2], axis=-1))))
rows.append(("pwc flow branch x1",
             marginal_ms(lambda a: model._flow_branch(params, a, x2,
                                                      model.TIMESTEP), x0)))
rows.append(("flow_projection x1 (R=8)",
             marginal_ms(lambda f: flow_projection(f, depth_inv0,
                                                   proj_range=8), flow)))
rows.append(("flow_projection x1 (scatter)",
             marginal_ms(lambda f: flow_projection(f, depth_inv0), flow)))
rows.append(("filter_interp frame (3ch)",
             marginal_ms(lambda x: filter_interpolation(x, off0, filt0),
                         x0)))
rows.append(("filter_interp ctx (196ch)",
             marginal_ms(lambda c: filter_interpolation(c, off0, filt0),
                         ctx0)))
rect_in = jnp.asarray(rs.rand(B, H, W, model.RECTIFY_IN), DT)
rows.append(("rectify (437ch)",
             marginal_ms(lambda x: rectify.apply(params["rectifyNet"], x),
                         rect_in)))
rows.append(("FULL apply (R=8)",
             marginal_ms(lambda a: model.apply(params, a, x2, proj_range=8),
                         x0)))

total = 0.0
print(f"\nbatch={B}  (ms per call, /B for per-frame)")
for name, ms in rows:
    tag = ""
    if name.startswith(("hourglass",)):
        comp = ms  # already covers both frames
    elif name.startswith(("s2df", "pwc", "flow_projection x1 (R=8)")):
        comp = 2 * ms
        tag = "x2"
    elif name.startswith("filter_interp"):
        comp = 2 * ms
        tag = "x2"
    elif name.startswith(("mononet", "rectify")):
        comp = ms
    else:
        comp = 0.0
    if not name.startswith(("FULL", "flow_projection x1 (scatter)")):
        total += comp
    print(f"  {name:32s} {ms:8.2f} ms  {tag}")
print(f"  {'component sum (pipeline)':32s} {total:8.2f} ms")
