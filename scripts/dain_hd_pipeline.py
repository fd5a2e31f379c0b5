"""DAIN HD cross-tile pipelining (VERDICT r3 item 8).

The HD protocol runs 8 tiles of 544x480 through the full DAIN tier
sequentially (bench.py --hd dain, 0.36 fps monolithic). At 448x256 the
two-program split (stage1 = depth/ctx/filters/flows/projection, stage2 =
filter-interp + rectify) measured ~8 ms FASTER than the monolith
(85.7 vs 93.5 ms — the monolith's composed forward degrades the big
filter-interp gathers; scripts/dain_split.py). Questions at HD tile
shapes:

  1. does the split's win persist per-tile (split-sequential vs monolith)?
  2. does interleaving stage1(tile k+1) between stage2(tile k) calls beat
     plain sequential issue (dispatch-pipelining; the TensorCore itself
     serializes programs, so any gain is scheduling/transfer overlap)?

All runs use the reference protocol semantics (fill_holes=True — under
the meta system every flow subnet is frozen so filling is always on;
proj_range=8).

Run: python scripts/dain_hd_pipeline.py [iters]
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
    hourglass, model, mononet, rectify, s2df)
from meta_interpolation_tpu.ops.filter_interpolation import (  # noqa: E402
    filter_interpolation)
from meta_interpolation_tpu.ops.flow_projection import (  # noqa: E402
    flow_projection)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
H, W = 1088, 1920
TH, TW = 544, 480  # the reference tiling of 1088x1920 under the 5e5 limit
DT = jnp.bfloat16

params = jax.tree.map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
    model.init(jax.random.PRNGKey(0)))
rs = np.random.RandomState(0)
f0 = jnp.asarray(rs.rand(1, H, W, 3), DT)
f1 = jnp.asarray(rs.rand(1, H, W, 3), DT)


def tiles(x):
    return [x[:, i * TH:(i + 1) * TH, j * TW:(j + 1) * TW]
            for i in range(H // TH) for j in range(W // TW)]


@jax.jit
def stage1(x0, x2):
    # model.apply pads to /64 before the down-up subnets (480 is not);
    # reproduce that here so the split runs the monolith's per-tile math
    x0, _ = layers.pad_to_multiple(x0, 64)
    x2, _ = layers.pad_to_multiple(x2, 64)
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
    off0 = flow_projection(flow_02, depth_inv0, fill_hole=True, proj_range=8)
    off2 = flow_projection(flow_20, depth_inv2, fill_hole=True, proj_range=8)
    return ctx0, ctx2, filt0, filt2, off0, off2


@jax.jit
def stage2(x0, x2, ctx0, ctx2, filt0, filt2, off0, off2):
    x0, pads = layers.pad_to_multiple(x0, 64)
    x2, _ = layers.pad_to_multiple(x2, 64)
    ctx0_w = filter_interpolation(ctx0, off0, filt0)
    ctx2_w = filter_interpolation(ctx2, off2, filt2)
    ref0 = filter_interpolation(x0, off0, filt0)
    ref2 = filter_interpolation(x2, off2, filt2)
    coarse = ref0 / 2.0 + ref2 / 2.0
    rect_in = jnp.concatenate([coarse, ref0, ref2, off0, off2,
                               filt0, filt2, ctx0_w, ctx2_w], axis=-1)
    return layers.unpad(rectify.apply(params["rectifyNet"], rect_in)
                        + coarse, pads)


mono_j = jax.jit(lambda a, b: model.apply(params, a, b, proj_range=8,
                                          fill_holes=True))


def frame_mono(a, b):
    return [mono_j(ta, tb) for ta, tb in zip(tiles(a), tiles(b))]


def frame_split_seq(a, b):
    outs = []
    for ta, tb in zip(tiles(a), tiles(b)):
        mid = stage1(ta, tb)
        outs.append(stage2(ta, tb, *mid))
    return outs


def frame_split_interleaved(a, b):
    """Issue stage1(tile k+1) BEFORE stage2(tile k): while the device
    chews on tile k's stage2, the host has already enqueued tile k+1's
    stage1 — any dispatch / transfer latency hides behind compute."""
    ta = tiles(a)
    tb = tiles(b)
    outs = []
    mid = stage1(ta[0], tb[0])
    for k in range(len(ta)):
        nxt = stage1(ta[k + 1], tb[k + 1]) if k + 1 < len(ta) else None
        outs.append(stage2(ta[k], tb[k], *mid))
        mid = nxt
    return outs


def fps(frame_fn, iters=ITERS):
    def run(n):
        a = f0
        t0 = time.perf_counter()
        for _ in range(n):
            outs = frame_fn(a, f1)
            dep = jnp.ravel(outs[-1])[0].astype(DT) * 0
            a = f0 + dep
        _ = float(jnp.float32(dep))
        return time.perf_counter() - t0

    run(1)
    tn = run(iters)
    t2n = run(2 * iters)
    return iters / max(t2n - tn, 1e-9)


print(f"DAIN HD {H}x{W}, {H // TH * (W // TW)} tiles of {TH}x{TW}, bf16, "
      f"fill_holes=True, proj_range=8")
for label, fn in [("monolith sequential (bench anchor)", frame_mono),
                  ("split sequential", frame_split_seq),
                  ("split interleaved s1(k+1)||s2(k)", frame_split_interleaved)]:
    v = fps(fn)
    print(f"  {label:36s} {v:6.3f} fps  ({1e3 / v:7.1f} ms/frame)",
          flush=True)
