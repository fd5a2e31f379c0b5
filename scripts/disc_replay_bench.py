"""Measure the --disc_per_forward discriminator-replay cost (VERDICT r4
item 6).

Three timings at the GAN preset shape (full-size CAIN, crop 256, the
reference's D patch 96), marginal protocol (time(2N) - time(N)):

  1. batched default cadence: ONE batched D update per outer iteration
     (the documented deviation);
  2. scan replay (r5): the reference per-criterion-call cadence as one
     lax.scan program — B*(S*P+Sq+1) strictly-sequential single-task
     updates in a single dispatch;
  3. host-loop replay (r4 form): the same updates as separately
     dispatched jitted calls through the ~700 us tunnel — what the scan
     replaced.

Usage: python scripts/disc_replay_bench.py [B] [S] [--msl]
Defaults B=8 S=3 --msl (the VERDICT's ~80-update example:
8*(3*2+2+1) = 72 updates/iteration).
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

from meta_interpolation_tpu.core.adversarial import (  # noqa: E402
    AdversarialState, build_replay_sequence)


def marginal(fn, iters=6, warmup=2):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(out)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    run(warmup)
    tn = run(iters)
    t2n = run(2 * iters)
    return max(t2n - tn, 1e-9) / iters


def main():
    argv = sys.argv[1:]
    nums = [int(a) for a in argv if a.isdigit()]
    B = nums[0] if nums else 8
    S = nums[1] if len(nums) > 1 else 3
    msl = "--msl" in argv or not argv
    P, crop = 2, 256
    sq = (S - 1) if (msl and S > 1) else 0
    n_upd = B * (S * P + sq + 1)

    adv = AdversarialState.create(jax.random.PRNGKey(0), "GAN")
    rs = np.random.RandomState(0)
    sp = jnp.asarray(rs.rand(B, S, P, crop, crop, 3), jnp.float32)
    qp = (jnp.asarray(rs.rand(B, sq, crop, crop, 3), jnp.float32)
          if sq else None)
    final = jnp.asarray(rs.rand(B, crop, crop, 3), jnp.float32)
    frames = jnp.asarray(rs.rand(B, 7, crop, crop, 3), jnp.float32)
    fakes, reals = build_replay_sequence(sp, qp, final, frames, [2, 4], 3)
    assert fakes.shape[0] == n_upd, (fakes.shape, n_upd)
    keys = jax.random.split(jax.random.PRNGKey(1), n_upd)

    upd = adv.jitted_update()
    seq = adv.jitted_sequential_update()
    p0, o0 = adv.params, adv.opt_state

    # 1. batched default: one update on the (B, ...) query preds
    def batched(_):
        p, o, loss = upd(p0, o0, final, frames[:, 3],
                         jax.random.PRNGKey(2))
        return loss

    # 2. scan replay (one dispatch)
    def scan_replay(_):
        p, o, losses = seq(p0, o0, fakes, reals, keys)
        return losses

    # 3. host-loop replay (r4 form: n_upd dispatches)
    def host_loop(_):
        p, o = p0, o0
        loss = None
        for i in range(n_upd):
            p, o, loss = upd(p, o, fakes[i], reals[i], keys[i])
        return loss

    t_b = marginal(batched)
    t_s = marginal(scan_replay)
    t_h = marginal(host_loop, iters=3)
    print(f"B={B} S={S} msl={msl} -> {n_upd} D updates/outer-iter, "
          f"crop {crop}, patch {adv.patch_size}")
    print(f"  batched default (1 update, batch {B}): {t_b * 1e3:8.1f} ms/iter")
    print(f"  scan replay     ({n_upd} upd, 1 dispatch): "
          f"{t_s * 1e3:8.1f} ms/iter  ({t_s / n_upd * 1e3:.2f} ms/update)")
    print(f"  host-loop replay({n_upd} dispatches):      "
          f"{t_h * 1e3:8.1f} ms/iter  ({t_h / n_upd * 1e3:.2f} ms/update)")
    print(f"  scan saves {(t_h - t_s) * 1e3:.1f} ms/iter vs the host loop "
          f"({(t_h - t_s) / n_upd * 1e6:.0f} us/update dispatch+sync cost)")


if __name__ == "__main__":
    main()
