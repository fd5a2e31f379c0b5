"""Filter-interp gather formulations, marginal-timed at DAIN ctx shapes.

Variants:
  taps    — current production path (per-tap take_along_axis, slabbed)
  win196  — one lax.gather of whole 4x4xC windows (row = 6.3 KB, 16x fewer
            DMAs, ~720 MB temp — loopify risk)
  win49   — window gather channel-slabbed to 49 (temp ~180 MB)
  win24   — window gather channel-slabbed to 24 (temp ~90 MB)
  rows98  — 4 row-slice gathers (1,4,1,cs), cs=98 (temp ~90 MB)

Each runs standalone and in a "stage2-like" program (2 ctx + 2 frame calls
+ a reduction) to include composition memory pressure.

Run: python scripts/fi_micro.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_interpolation_tpu.core import compile_cache  # noqa: E402

compile_cache.enable_compilation_cache()

import jax  # noqa: E402
import jax.lax as lax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from meta_interpolation_tpu.ops import filter_interpolation as fi_mod  # noqa: E402

H, W, C = 256, 448, 196
FS = 4


def _common(img, flow, filters):
    n, h, w, c = img.shape
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x2 = xs + fx
    y2 = ys + fy
    valid = ((x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1)
             & (jnp.abs(fx) < w / 2.0) & (jnp.abs(fy) < h / 2.0))
    x2i = jnp.floor(x2).astype(jnp.int32)
    y2i = jnp.floor(y2).astype(jnp.int32)
    alpha = (x2 - x2i).astype(img.dtype)[..., None]
    beta = (y2 - y2i).astype(img.dtype)[..., None]
    ix_l = x2i - 1
    iy_t = y2i - 1
    wg = []
    for j in range(FS):
        wrow = (1.0 - beta) if j < 2 else beta
        for i in range(FS):
            wcol = (1.0 - alpha) if i < 2 else alpha
            wg.append(filters[..., j * FS + i, None] * wrow * wcol)
    wgts = jnp.stack(wg, axis=3)  # (n,h,w,16,1)
    return valid, iy_t, ix_l, wgts


def fi_window(img, flow, filters, cs):
    n, h, w, c = img.shape
    valid, iy_t, ix_l, wgts = _common(img, flow, filters)
    pad = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="edge")
    b_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None],
                             (n, h, w))
    starts = jnp.stack([b_idx, jnp.clip(iy_t + 1, 0, h - 1),
                        jnp.clip(ix_l + 1, 0, w - 1)],
                       axis=-1).reshape(n * h * w, 3)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    outs = []
    for c0 in range(0, c, cs):
        sl = pad[..., c0:c0 + cs]
        vals = lax.gather(sl, starts, dnums,
                          slice_sizes=(1, FS, FS, sl.shape[-1]),
                          mode=lax.GatherScatterMode.CLIP)
        vals = vals.reshape(n, h, w, FS * FS, -1)
        outs.append(jnp.sum(vals * wgts, axis=3))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)
    return jnp.where(valid[..., None], out, img)


def fi_rows(img, flow, filters, cs):
    n, h, w, c = img.shape
    valid, iy_t, ix_l, wgts = _common(img, flow, filters)
    pad = jnp.pad(img, ((0, 0), (1, 2), (0, 0), (0, 0)), mode="edge")
    b_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None],
                             (n, h, w))
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    wgts = wgts.reshape(n, h, w, FS, FS, 1)
    outs = []
    for c0 in range(0, c, cs):
        sl = pad[..., c0:c0 + cs]
        acc = 0
        for i in range(FS):
            col = jnp.clip(ix_l + i, 0, w - 1)
            starts = jnp.stack([b_idx, jnp.clip(iy_t + 1, 0, h - 1), col],
                               axis=-1).reshape(n * h * w, 3)
            vals = lax.gather(sl, starts, dnums,
                              slice_sizes=(1, FS, 1, sl.shape[-1]),
                              mode=lax.GatherScatterMode.CLIP)
            vals = vals.reshape(n, h, w, FS, -1)
            acc = acc + jnp.sum(vals * wgts[:, :, :, :, i], axis=3)
        outs.append(acc)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)
    return jnp.where(valid[..., None], out, img)


def fi_packed(img, flow, filters, cs=None):
    """Row-packed single-segment window gather: pack rows y..y+3 into
    channels (shifted-copy concat), flatten (W, 4c) into one axis, then
    each 4x4xC window is ONE contiguous 16c-element slice — 1 gathered
    row per pixel vs the window gather's 4 segments."""
    n, h, w, c = img.shape
    cs = cs or c
    valid, iy_t, ix_l, wgts = _common(img, flow, filters)
    # weights reordered i-major to match the packed element order [i][j][c]
    wgts_ij = wgts.reshape(n, h, w, FS, FS, 1)  # [j][i]
    wgts_p = jnp.transpose(wgts_ij, (0, 1, 2, 4, 3, 5)).reshape(
        n, h, w, FS * FS, 1)
    pad = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="edge")
    pw = w + 3
    b_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None],
                             (n, h, w))
    row = jnp.clip(iy_t + 1, 0, h - 1)
    col = jnp.clip(ix_l + 1, 0, w - 1)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1, 2))
    outs = []
    for c0 in range(0, c, cs):
        sl = pad[..., c0:c0 + cs]
        cw = sl.shape[-1]
        packed = jnp.concatenate([sl[:, k:k + h] for k in range(FS)],
                                 axis=-1)  # (n, h, pw, 4cw)
        flat = packed.reshape(n, h, pw * FS * cw)
        starts = jnp.stack([b_idx, row, col * (FS * cw)],
                           axis=-1).reshape(n * h * w, 3)
        vals = lax.gather(flat, starts, dnums,
                          slice_sizes=(1, 1, FS * FS * cw),
                          mode=lax.GatherScatterMode.CLIP)
        # packed element order: [i (w-pos)][j (row)][c]
        vals = vals.reshape(n, h, w, FS * FS, cw)
        outs.append(jnp.sum(vals * wgts_p, axis=3))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)
    return jnp.where(valid[..., None], out, img)


VARIANTS = {
    "taps": lambda im, fl, ft: fi_mod.filter_interpolation(im, fl, ft),
    "win196": functools.partial(fi_window, cs=196),
    "win49": functools.partial(fi_window, cs=49),
    "win24": functools.partial(fi_window, cs=24),
    "rows98": functools.partial(fi_rows, cs=98),
    "packed196": functools.partial(fi_packed, cs=196),
    "packed98": functools.partial(fi_packed, cs=98),
}


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
    DT = jnp.bfloat16
    ctx = jnp.asarray(rs.rand(1, H, W, C), DT)
    frame = jnp.asarray(rs.rand(1, H, W, 3), DT)
    flow0 = jnp.asarray(rs.rand(1, H, W, 2) * 12 - 6, DT)
    flow2 = jnp.asarray(rs.rand(1, H, W, 2) * 12 - 6, DT)
    filt0 = jnp.asarray(rs.rand(1, H, W, 16), DT)
    filt2 = jnp.asarray(rs.rand(1, H, W, 16), DT)

    args = sys.argv[1:]
    nocheck = "--nocheck" in args
    args = [a for a in args if a != "--nocheck"]
    only = args or list(VARIANTS)

    if not nocheck:
        # correctness vs production first (f32 — bf16 differs only by
        # accumulation order). Each f32 compile is slow through the tunnel.
        # Only the production taps path is test-pinned
        # (tests/test_dain_ops.py); the script-local variants are checked
        # ONLY here, so --nocheck runs them entirely unchecked — timing-only,
        # at the user's risk.
        ctx32, fl32, ft32 = (x.astype(jnp.float32)
                             for x in (ctx, flow0, filt0))
        ref = np.asarray(fi_mod.filter_interpolation(ctx32, fl32, ft32),
                         np.float32)
        for name, fn in VARIANTS.items():
            if name == "taps" or name not in only:
                continue
            got = np.asarray(fn(ctx32, fl32, ft32), np.float32)
            md = np.abs(got - ref).max()
            print(f"{name:8s} max|diff| vs taps = {md:.3e}")
            assert md < 1e-4, name
    for name in only:
        fn = VARIANTS[name]
        solo = marginal_ms(jax.jit(fn), (ctx, flow0, filt0))

        def stage2(c0, c2, f0, f2, fl0, fl2, ft0, ft2):
            a = fn(c0, fl0, ft0)
            b = fn(c2, fl2, ft2)
            r0 = fn(f0, fl0, ft0)
            r2 = fn(f2, fl2, ft2)
            return (jnp.mean(a, -1, keepdims=True)
                    + jnp.mean(b, -1, keepdims=True) + r0 / 2 + r2 / 2)

        comp = marginal_ms(jax.jit(stage2),
                           (ctx, ctx, frame, frame, flow0, flow2,
                            filt0, filt2))
        print(f"{name:8s} solo(ctx) {solo:7.2f} ms   stage2-like "
              f"{comp:7.2f} ms")


if __name__ == "__main__":
    main()
