"""CAIN serving-mode ablation — itemize the non-conv overhead.

Round-1 roofline (BASELINE.md): serving mode measures 811 fps @448x256
(batch 16, bf16, pad_multiple=8, fuse_pad, packed weights) while the
conv-only floor at those shapes is ~1050 fps. This script times variants of
the serving path to attribute the ~4.5 ms/batch-16 gap (CA chain, residual
adds, reduce passes, weight streams, scan overhead) so the fix targets the
real cost. Run on the TPU:  python scripts/ablate_serving.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(step, params, f0, f1, iters=12, warmup=3):
    import jax.numpy as jnp

    def run(n):
        x0, x1 = f0, f1
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(params, x0, x1)
            x1 = x0
            x0 = out
        _ = float(jnp.float32(out).mean())
        return time.perf_counter() - t0

    run(warmup)
    t_n = run(iters)
    t_2n = run(2 * iters)
    return max(t_2n - t_n, 1e-9) / iters  # seconds per batch


def main():
    import jax
    import jax.numpy as jnp
    from meta_interpolation_tpu.core.compile_cache import (
        enable_compilation_cache)
    from meta_interpolation_tpu.models import cain, layers

    enable_compilation_cache()
    batch, height, width = 16, 256, 448
    params = cain.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    packed = cain.pack(params)
    rs = np.random.RandomState(0)
    f0 = jnp.asarray(rs.rand(batch, height, width, 3), jnp.bfloat16)
    f1 = jnp.asarray(rs.rand(batch, height, width, 3), jnp.bfloat16)

    orig_ca = cain._ca_layer
    orig_rcab = cain._rcab
    orig_interp = cain._interpolation

    def serving_step():
        @jax.jit
        def step(p, a, b):
            return cain.apply(p, a, b, pad_multiple=8, packed_body=packed,
                              fuse_pad=True)
        return step

    results = {}

    def measure(name):
        t = timeit(serving_step(), params, f0, f1)
        fps = batch / t
        results[name] = (t * 1e3, fps)
        print(json.dumps({"variant": name, "ms_per_batch": round(t * 1e3, 3),
                          "fps": round(fps, 1)}), flush=True)

    # 1. baseline
    measure("full_serving")

    # 2. CA -> identity (removes reduce pass + MLP + scale multiply)
    cain._ca_layer = lambda p, x: x
    measure("no_ca")
    cain._ca_layer = orig_ca

    # 3. CA without the full-tensor mean: stats from an 8x8 corner
    #    (keeps MLP + scale multiply, kills ~98% of the reduce read)
    def ca_corner(p, x):
        y = jnp.mean(x[:, :8, :8, :], axis=(1, 2), keepdims=True)
        y = jax.nn.relu(cain._dense_1x1(p["conv_du"]["0"], y))
        y = jax.nn.sigmoid(cain._dense_1x1(p["conv_du"]["2"], y))
        return x * y
    cain._ca_layer = ca_corner
    measure("ca_corner_stats")
    cain._ca_layer = orig_ca

    # 4. no residual adds inside RCABs (keeps CA)
    def rcab_nores(p, x, slope=0.2, fuse_pad=False):
        out = cain._conv_norm(p["body"]["0"], x, fuse_pad=fuse_pad)
        out = layers.leaky_relu(out, slope)
        out = cain._conv_norm(p["body"]["2"], out, fuse_pad=fuse_pad)
        return cain._ca_layer(p["body"]["3"], out)
    cain._rcab = rcab_nores
    measure("no_rcab_residual")
    cain._rcab = orig_rcab

    # 5. conv-only RCAB (no CA, no residual, keeps lrelu)
    def rcab_convonly(p, x, slope=0.2, fuse_pad=False):
        out = cain._conv_norm(p["body"]["0"], x, fuse_pad=fuse_pad)
        out = layers.leaky_relu(out, slope)
        return cain._conv_norm(p["body"]["2"], out, fuse_pad=fuse_pad)
    cain._rcab = rcab_convonly
    measure("rcab_conv_only")
    cain._rcab = orig_rcab

    # 6. body identity — fixed overhead (sub_mean, shuffles, head/tail convs)
    def interp_passthrough(p, x0, x1, n_resgroups, n_resblocks,
                           packed_body=None, fuse_pad=False):
        x = jnp.concatenate([x0, x1], axis=-1)
        x = layers.conv2d(p["headConv"], x, padding=1)
        return layers.conv2d(p["tailConv"], x, padding=1)
    cain._interpolation = interp_passthrough
    measure("body_identity")
    cain._interpolation = orig_interp

    # 7. scan unroll=2 (weight-stream double-buffering depth)
    def interp_unroll(p, x0, x1, n_resgroups, n_resblocks,
                      packed_body=None, fuse_pad=False):
        x = jnp.concatenate([x0, x1], axis=-1)
        x = layers.conv2d(p["headConv"], x, padding=1)

        def rcab_body(z, rp):
            return cain._rcab(rp, z, fuse_pad=fuse_pad), None

        def group_body(z, gp):
            res, _ = jax.lax.scan(rcab_body, z, gp["rcabs"], unroll=2)
            res = cain._conv_norm(gp["tail"], res, fuse_pad=fuse_pad)
            return res + z, None

        res, _ = jax.lax.scan(group_body, x, packed_body)
        res = res + x
        return layers.conv2d(p["tailConv"], res, padding=1)
    cain._interpolation = interp_unroll
    measure("scan_unroll2")
    cain._interpolation = orig_interp

    # 8. fully unrolled RCAB scan (unroll=n_resblocks)
    def interp_unroll_full(p, x0, x1, n_resgroups, n_resblocks,
                           packed_body=None, fuse_pad=False):
        x = jnp.concatenate([x0, x1], axis=-1)
        x = layers.conv2d(p["headConv"], x, padding=1)

        def rcab_body(z, rp):
            return cain._rcab(rp, z, fuse_pad=fuse_pad), None

        def group_body(z, gp):
            res, _ = jax.lax.scan(rcab_body, z, gp["rcabs"], unroll=12)
            res = cain._conv_norm(gp["tail"], res, fuse_pad=fuse_pad)
            return res + z, None

        res, _ = jax.lax.scan(group_body, x, packed_body)
        res = res + x
        return layers.conv2d(p["tailConv"], res, padding=1)
    cain._interpolation = interp_unroll_full
    measure("scan_unroll12")
    cain._interpolation = orig_interp

    print("\n--- summary (ms/batch-16) ---")
    for k, (ms, fps) in results.items():
        print(f"{k:24s} {ms:7.3f} ms  {fps:7.1f} fps")


if __name__ == "__main__":
    main()
