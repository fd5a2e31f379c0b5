"""VoxelFlow HD anomaly investigation (VERDICT round-1 weak item 2).

Standalone at 1088x1920 the bounded pallas warp is ~10x faster than the
exact gather (3.9 vs 37 ms), yet the FULL jitted VoxelFlow model measured
~70 ms SLOWER with it (225 vs 152 ms/frame). This script isolates where
the time goes:

  1. times the full model both ways (reproduce),
  2. times the warp both ways standalone at the same shapes,
  3. times the warp with its inputs produced by a conv (producer-layout
     effect: a pallas custom call pins its operands to the default
     layout, which can force whole-tensor relayout copies),
  4. dumps the compiled HLO around the custom call and counts
     copy/transpose/bitcast ops next to it.

Run:  python scripts/hd_anomaly.py
"""
from __future__ import annotations

import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def marginal(fn, *args, iters=6, chain=None):
    import jax.numpy as jnp

    def run(n):
        a = args
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*a)
            if chain is not None:
                a = chain(out, a)
        _ = float(jnp.float32(out if not isinstance(out, tuple) else out[0]
                              ).mean())
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters


def main():
    import jax
    import jax.numpy as jnp
    from meta_interpolation_tpu.core.compile_cache import (
        enable_compilation_cache)
    from meta_interpolation_tpu.models import voxelflow
    from meta_interpolation_tpu.ops import warp as warp_ops

    enable_compilation_cache()
    H, W = 1088, 1920
    jdt = jnp.bfloat16
    params = jax.tree.map(
        lambda x: x.astype(jdt) if x.dtype == jnp.float32 else x,
        voxelflow.init(jax.random.PRNGKey(0)))
    rs = np.random.RandomState(0)
    f0 = jnp.asarray(rs.rand(1, H, W, 3), jdt)
    f1 = jnp.asarray(rs.rand(1, H, W, 3), jdt)

    # 1. full model, both warp paths
    for wr in (None, 8):
        step = jax.jit(lambda p, a, b, wr=wr: voxelflow.apply(
            p, a, b, warp_range=wr))
        dt = marginal(step, params, f0, f1,
                      chain=lambda out, a: (a[0],
                                            jnp.clip(out, -1, 1).astype(jdt),
                                            a[1]))
        print(f"full model warp_range={wr}: {dt * 1e3:.1f} ms/frame",
              flush=True)
        if wr == 8:
            txt = step.lower(params, f0, f1).compile().as_text()
            # context window around each custom-call line
            lines = txt.splitlines()
            idxs = [i for i, l in enumerate(lines) if "custom-call" in l]
            n_copy = sum(1 for l in lines if re.search(
                r"\b(copy|transpose)\(", l))
            print(f"HLO: {len(idxs)} custom-calls, "
                  f"{n_copy} copy/transpose ops total", flush=True)
            for i in idxs[:4]:
                print("  ...", "\n  ".join(lines[max(0, i - 2):i + 2]),
                      flush=True)

    # 2. warp standalone (flow from random array — no producer)
    flow = jnp.asarray((rs.rand(1, H, W, 2) - 0.5) * 8, jdt)
    mask = jnp.asarray(rs.rand(1, H, W, 1), jdt)

    for wr in (None, 8):
        f = jax.jit(lambda a, b, fl, m, wr=wr: warp_ops.voxelflow_sample(
            a, b, fl, m, warp_range=wr))
        dt = marginal(f, f0, f1, flow, mask)
        print(f"voxelflow_sample standalone warp_range={wr}: "
              f"{dt * 1e3:.2f} ms", flush=True)

    # 3. warp with a conv producer feeding the flow (layout effect)
    k = jnp.asarray(rs.rand(3, 3, 3, 3) * 0.1, jdt)

    for wr in (None, 8):
        def g(a, b, m, wr=wr):
            fl = jax.lax.conv_general_dilated(
                a, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., :2]
            return warp_ops.voxelflow_sample(a, b, fl * 4.0, m,
                                             warp_range=wr)
        f = jax.jit(g)
        dt = marginal(f, f0, f1, mask)
        print(f"conv-producer + sample warp_range={wr}: "
              f"{dt * 1e3:.2f} ms", flush=True)


if __name__ == "__main__" and "--swapped" not in sys.argv:
    main()


def probe_swapped():
    """Fix candidate: call the bounded warp on logically H/W-swapped
    tensors so the pallas call's required default layout coincides with
    the W-major physical layout XLA gives HD conv outputs — the inserted
    transposes should become bitcasts."""
    import jax
    import jax.numpy as jnp
    from meta_interpolation_tpu.core.compile_cache import (
        enable_compilation_cache)
    from meta_interpolation_tpu.ops import warp as warp_ops

    enable_compilation_cache()
    H, W = 1088, 1920
    jdt = jnp.bfloat16
    rs = np.random.RandomState(0)
    f0 = jnp.asarray(rs.rand(1, H, W, 3), jdt)
    f1 = jnp.asarray(rs.rand(1, H, W, 3), jdt)
    mask = jnp.asarray(rs.rand(1, H, W, 1), jdt)
    k = jnp.asarray(rs.rand(3, 3, 3, 3) * 0.1, jdt)

    def conv(a):
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def direct(a, b, m):
        fl = conv(a)[..., :2] * 4.0
        return warp_ops.voxelflow_sample(a, b, fl, m, warp_range=8)

    def swapped(a, b, m):
        fl = conv(a)[..., :2] * 4.0
        a_t = jnp.swapaxes(a, 1, 2)
        b_t = jnp.swapaxes(b, 1, 2)
        m_t = jnp.swapaxes(m, 1, 2)
        fl_t = jnp.swapaxes(fl, 1, 2)[..., ::-1]  # (fx,fy) -> (fy,fx)
        out = warp_ops.voxelflow_sample(a_t, b_t, fl_t, m_t, warp_range=8)
        return jnp.swapaxes(out, 1, 2)

    for name, f in (("direct", direct), ("swapped", swapped)):
        g = jax.jit(f)
        dt = marginal(g, f0, f1, mask)
        print(f"conv-producer sample [{name}]: {dt * 1e3:.2f} ms",
              flush=True)
    # numeric equivalence
    da = np.asarray(jax.jit(direct)(f0, f1, mask), np.float32)
    sa = np.asarray(jax.jit(swapped)(f0, f1, mask), np.float32)
    print("max |direct-swapped|:", float(np.abs(da - sa).max()), flush=True)


if __name__ == "__main__" and "--swapped" in sys.argv:
    probe_swapped()
