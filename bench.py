"""Benchmark harness — interpolation throughput on the flagship model.

Headline metric (BASELINE.md): interpolated fps at 448x256 on one chip,
target >= 1000. Runs full-size CAIN (42.78M params) in bfloat16, batched,
jit-compiled, with block_until_ready timing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench_cain_interp_fps(height=256, width=448, batch=8, iters=20,
                          warmup=3, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from meta_interpolation_tpu.models import cain

    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params = cain.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jdt), params)
    rs = np.random.RandomState(0)
    f0 = jnp.asarray(rs.rand(batch, height, width, 3), jdt)
    f1 = jnp.asarray(rs.rand(batch, height, width, 3), jdt)

    @jax.jit
    def step(params, f0, f1):
        return cain.apply(params, f0, f1)

    # Timing note: through the axon tunnel block_until_ready can return
    # before execution completes, so we chain iterations through a data
    # dependency and use *marginal* timing — time(2N) − time(N) with a
    # host fetch at the end — which cancels constant tunnel latency.
    def run(n):
        x0, x1 = f0, f1
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(params, x0, x1)
            x1 = x0
            x0 = out  # chain: next iter depends on this one
        _ = float(jnp.float32(out).mean())  # forces full execution
        return time.perf_counter() - t0

    run(warmup)
    t_n = run(iters)
    t_2n = run(2 * iters)
    marginal = max(t_2n - t_n, 1e-9)
    return batch * iters / marginal


def main():
    fps = bench_cain_interp_fps()
    target = 1000.0  # BASELINE.md north star, fps/chip @ 448x256
    print(json.dumps({
        "metric": "cain_interp_fps_448x256_bf16",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / target, 4),
    }))


if __name__ == "__main__":
    main()
