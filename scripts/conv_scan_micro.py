"""Microbench: 3x3 conv chain with scanned (stacked, dynamically sliced)
weights vs constant unrolled weights, at CAIN serving shapes
(16x32x56x192, K=1728, N=192). Quantifies the scan tax the serving
ablation exposed (conv-only body 17.6 ms vs ~14.5 ms ideal).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = 60


def marginal(fn, *args, iters=8):
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        out = args[0]
        for _ in range(n):
            out = fn(out, *args[1:])
        _ = float(jnp.float32(out).mean())
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

    enable_compilation_cache()
    B, H, W, C = 16, 32, 56, 192
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, H, W, C), jnp.bfloat16)
    ws = jnp.asarray(rs.rand(N_CONVS, 3, 3, C, C) * 0.05, jnp.bfloat16)

    def conv(z, w):
        return jax.lax.conv_general_dilated(
            z, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    flops = 2 * B * H * W * 9 * C * C * N_CONVS

    # 1. scan over stacked weights (the serving path's structure)
    @jax.jit
    def scanned(z, ws):
        def body(c, w):
            return conv(c, w), None
        out, _ = jax.lax.scan(body, z, ws)
        return out

    dt = marginal(scanned, x, ws)
    print(f"scan:        {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)

    # 2. unrolled with the SAME stacked operand (static slices)
    @jax.jit
    def unrolled_sliced(z, ws):
        for i in range(N_CONVS):
            z = conv(z, ws[i])
        return z

    dt = marginal(unrolled_sliced, x, ws)
    print(f"unroll/slice:{dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)

    # 3. unrolled with separate constant weights (baked into the program)
    w_consts = [jnp.asarray(np.asarray(ws[i])) for i in range(N_CONVS)]

    @jax.jit
    def unrolled_const(z):
        for w in w_consts:
            z = conv(z, w)
        return z

    dt = marginal(unrolled_const, x)
    print(f"unroll/const:{dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)

    # 4. scan with lrelu fused after each conv (serving body shape)
    @jax.jit
    def scanned_lrelu(z, ws):
        def body(c, w):
            out = conv(c, w)
            return jnp.where(out >= 0, out, 0.2 * out), None
        out, _ = jax.lax.scan(body, z, ws)
        return out

    dt = marginal(scanned_lrelu, x, ws)
    print(f"scan+lrelu:  {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)

    # 5. single conv, weights constant (peak reference)
    w0 = w_consts[0]

    @jax.jit
    def single(z):
        return conv(z, w0)

    dt = marginal(single, x, iters=60)
    f1 = 2 * B * H * W * 9 * C * C
    print(f"single conv: {dt * 1e3:7.3f} ms  {f1 / dt / 1e12:6.1f} TF/s",
          flush=True)

    # 6. scan at 2x batch (M-dim utilization probe)
    x32 = jnp.concatenate([x, x], axis=0)
    dt = marginal(scanned, x32, ws)
    print(f"scan B=32:   {dt * 1e3:7.3f} ms  "
          f"{2 * flops / dt / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__" and "--shapes" not in sys.argv:
    main()


def probe_shapes():
    """Const-weight conv-chain rate across batch and spatial shapes —
    establishes the honest conv ceiling for the serving roofline."""
    import jax
    import jax.numpy as jnp
    from meta_interpolation_tpu.core.compile_cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    rs = np.random.RandomState(0)

    def conv(z, w):
        return jax.lax.conv_general_dilated(
            z, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for (B, H, W, C, n) in [(16, 32, 56, 192, 30), (32, 32, 56, 192, 30),
                            (64, 32, 56, 192, 30), (16, 32, 64, 192, 30),
                            (16, 64, 56, 192, 30), (128, 32, 56, 192, 20)]:
        x = jnp.asarray(rs.rand(B, H, W, C), jnp.bfloat16)
        w_consts = [jnp.asarray(rs.rand(3, 3, C, C) * 0.05, jnp.bfloat16)
                    for _ in range(n)]

        def chain(z, ws=tuple(w_consts)):
            for w in ws:
                z = conv(z, w)
            return z

        f = jax.jit(chain)
        dt = marginal(f, x, iters=6)
        flops = 2 * B * H * W * 9 * C * C * n
        print(f"const chain B={B} {H}x{W}x{C} n={n}: {dt * 1e3:7.3f} ms "
              f"{flops / dt / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__" and "--shapes" in sys.argv:
    probe_shapes()
