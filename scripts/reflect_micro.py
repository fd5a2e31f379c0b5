"""Measure conv2d_reflect3x3 (zero-SAME conv + border corrections) in CAIN.

Three questions, all at the 448x256 bf16 headline shape:
  1. exact semantics (pad_multiple=128): does replacing the body's 122
     materialized reflect pads with the border-corrected form (same math,
     fp-reassociated — test_cain.py pins equality) recover the measured
     ~5.5 ms/step of pad HBM traffic (BASELINE.md ablations)?
  2. serving shape (pad_multiple=8, packed, batch 128): is "reflect" as
     fast as the zero-pad fuse_pad=True? If so the serving path can keep
     reference boundary math for the body convs and the remaining
     serving deviation is pad_multiple=8 alone.
  3. sanity: fps for the current defaults, same harness as bench.py.

Usage: python scripts/reflect_micro.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_interpolation_tpu.core.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from meta_interpolation_tpu.models import cain  # noqa: E402


def fps(step, params, f0, f1, batch, iters):
    def run(n):
        x0, x1 = f0, f1
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(params, x0, x1)
            x1 = x0
            x0 = out
        _ = float(jnp.float32(out).mean())
        return time.perf_counter() - t0

    run(3)
    t_n = run(iters)
    t_2n = run(2 * iters)
    return batch * iters / max(t_2n - t_n, 1e-9)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    params = cain.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    packed = cain.pack(params)
    rs = np.random.RandomState(0)

    for label, batch, pad, fuse in [
        ("exact reflect-pad (r2 baseline)", 16, 128, False),
        ("exact border-corrected", 16, 128, "reflect"),
        ("serving zero-pad (r2 headline)", 128, 8, True),
        ("serving border-corrected", 128, 8, "reflect"),
        ("serving materialized reflect", 128, 8, False),
        ("serving materialized reflect B16", 16, 8, False),
    ]:
        f0 = jnp.asarray(rs.rand(batch, 256, 448, 3), jnp.bfloat16)
        f1 = jnp.asarray(rs.rand(batch, 256, 448, 3), jnp.bfloat16)

        @jax.jit
        def step(p, a, b, pad=pad, fuse=fuse):
            return cain.apply(p, a, b, pad_multiple=pad, packed_body=packed,
                              fuse_pad=fuse)

        v = fps(step, params, f0, f1, batch, iters)
        print(f"{label:36s} B={batch:3d} pad={pad:3d}: {v:8.1f} fps",
              flush=True)


if __name__ == "__main__":
    main()
