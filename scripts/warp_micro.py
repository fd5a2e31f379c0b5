"""Exact-gather grid_sample: plain window gather vs row-packed single
segment, marginal-timed at VoxelFlow shapes (448x256 c=3 and HD 1088x1920),
plus a 64-ch feature map (PWC warp shapes).

Run: python scripts/warp_micro.py
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

from meta_interpolation_tpu.ops import warp  # noqa: E402


def marginal_ms(jfn, args, iters=8):
    def run(n):
        dep = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(args[0] + dep.astype(args[0].dtype), *args[1:])
            dep = jnp.ravel(out)[0].astype(jnp.float32) * 0
        _ = float(dep)
        return time.perf_counter() - t0

    run(2)
    tn = run(iters)
    t2n = run(2 * iters)
    return (t2n - tn) / iters * 1e3


def main():
    rs = np.random.RandomState(0)
    shapes = [("448x256 c3", (1, 256, 448, 3)),
              ("448x256 c64", (1, 256, 448, 64)),
              ("HD c3", (1, 1088, 1920, 3))]
    for name, shp in shapes:
        n, h, w, c = shp
        img = jnp.asarray(rs.rand(*shp), jnp.bfloat16)
        grid = jnp.asarray(rs.rand(n, h, w, 2) * 2.2 - 1.1, jnp.float32)

        # correctness both paths (f32)
        img32 = img.astype(jnp.float32)
        warp._ROW_PACKED = False
        ref = np.asarray(warp.grid_sample(img32, grid))
        warp._ROW_PACKED = True
        got = np.asarray(warp.grid_sample(img32, grid))
        md = np.abs(got - ref).max()
        assert md < 1e-5, (name, md)

        res = {}
        for packed in (False, True):
            warp._ROW_PACKED = packed
            fn = jax.jit(lambda im, g: warp.grid_sample(im, g))
            res[packed] = marginal_ms(fn, (img, grid))
        print(f"{name:14s} plain {res[False]:7.2f} ms   "
              f"packed {res[True]:7.2f} ms")


if __name__ == "__main__":
    main()
