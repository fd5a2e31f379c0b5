"""A/B the DAIN hole-fill implementations at train/inference shapes.

Current: 4x (cummax nearest-valid-index + full-image gather)
Candidate: 4x associative_scan propagating (value, valid) directly —
no gathers. Bit-identical outputs (pinned in tests/test_dain_ops.py).

Context: enabling reference-faithful always-on fillhole on meta forwards
(late r2) dropped DAIN meta-training from 3.6 to 1.78 tasks/s
(bench.py --train dain, round 3) — this micro isolates how much of that
is the fill itself and which form is faster.

Usage: python scripts/fill_micro.py
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

from meta_interpolation_tpu.ops import flow_projection as fp  # noqa: E402


def marginal_ms(fn, args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)

    def run(n):
        t0 = time.perf_counter()
        o = args[0]
        for _ in range(n):
            o = fn(o, *args[1:])
        _ = float(jnp.float32(o).sum())
        return time.perf_counter() - t0

    run(3)
    t_n = run(iters)
    t_2n = run(2 * iters)
    return (t_2n - t_n) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    for (n, h, w) in [(1, 192, 192), (1, 256, 448), (1, 544, 960)]:
        cnt = ((rng.rand(n, h, w) > 0.5) * (1 + rng.rand(n, h, w))
               ).astype(np.float32)
        out = np.where(cnt[..., None] > 0,
                       rng.randn(n, h, w, 2), 0.0).astype(np.float32)
        out, cnt = jnp.asarray(out), jnp.asarray(cnt)
        f_gather = jax.jit(fp._fill_holes_gather)
        f_scan = jax.jit(fp._fill_holes_scan)
        np.testing.assert_allclose(np.asarray(f_gather(out, cnt)),
                                   np.asarray(f_scan(out, cnt)), atol=1e-6)
        tg = marginal_ms(f_gather, (out, cnt))
        ts = marginal_ms(f_scan, (out, cnt))
        print(f"{h}x{w}: gather-fill {tg:7.3f} ms | scan-fill {ts:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
