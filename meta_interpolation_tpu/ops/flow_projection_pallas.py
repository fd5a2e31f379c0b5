"""Pallas TPU kernel for bounded flow projection.

Scatter-free reformulation of ``ops/flow_projection.flow_projection`` for
flows bounded by R pixels: a target cell (Y, X) can only receive
contributions from sources within the (2R+2)² window around it, so the
scatter-average becomes a static shift-and-select sweep (the same trick as
``ops/warp_pallas`` — XLA scatters on TPU serialize; this is dense VPU
work on VMEM-resident tiles).

Semantics (reference ``flowprojection_cuda_kernel.cu:28-135`` /
``depthflowprojection_cuda_kernel.cu:40-110``): every in-bounds source
(y, x) lands at (x+fx, y+fy) and adds (−fx, −fy)·wv and wv to each of the
4 clamped integer neighbors; a second pass divides by the count. Exact for
|fy|,|fx| ≤ R (sources displaced farther are dropped by this kernel —
callers pick R ≥ the model's flow range).

Membership test in the shifted frame: per row-offset d the kernel
precomputes, for each source pixel, its target-row hit mask against the
output row (hy ∈ {0,1,2} — 2 when both clamped neighbors coincide) and its
column displacements dxl/dxr = ix_{l,r} − x_src; after a static column
shift by e the column hit is simply dxl == −e (dxr == −e).

Layout mirrors ops/sepconv.py: plane-leading (N, P, H, W) blocks,
full-width rows, Element row halos; W % 128 == 0, H % 8 == 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _make_kernel(r, h, ht, w_clip, w, halo_rows, col_off):
    """Kernel over in_ref (1, 5, ht+2·halo, w+2·col_off) planes
    [y2, x2, cfy, cfx, wv] (zero-padded — fake sources carry wv=0) →
    out_ref (1, 3, ht, w) planes [acc_fx, acc_fy, cnt]."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    side = 2 * r + 2

    def kernel(in_ref, out_ref):
        blk = in_ref[0]
        n_rows = blk.shape[1]
        n_cols = blk.shape[2]
        row0 = pl.program_id(1) * ht

        # absolute output-row index of each local row, (ht, n_cols)
        # (Mosaic iota is integer-only; cast after)
        y_out = (lax.broadcasted_iota(jnp.int32, (ht, n_cols), 0)
                 .astype(jnp.float32) + jnp.float32(row0))
        # absolute source column of each local column (pad offset removed)
        x_src = (lax.broadcasted_iota(jnp.int32, (ht, n_cols), 1)
                 .astype(jnp.float32) - jnp.float32(col_off))

        def body_d(i, acc):
            d = i - (r + 1)  # source row = output row + d, d ∈ [−r−1, r]
            rows = pltpu.roll(blk, (n_rows - (d + halo_rows)) % n_rows,
                              1)[:, :ht, :]
            y2 = rows[0]
            iy_t = jnp.clip(jnp.floor(y2), 0.0, h - 1.0)
            iy_b = jnp.minimum(iy_t + 1.0, h - 1.0)
            hy = ((iy_t == y_out).astype(jnp.float32)
                  + (iy_b == y_out).astype(jnp.float32))
            x2 = rows[1]
            # clip against the TRUE image width (w may be lane-padded)
            ix_l = jnp.clip(jnp.floor(x2), 0.0, w_clip - 1.0)
            ix_r = jnp.minimum(ix_l + 1.0, w_clip - 1.0)
            dxl = ix_l - x_src
            dxr = ix_r - x_src
            s = jnp.stack([hy, dxl, dxr, rows[2], rows[3], rows[4]])

            acc_d = jnp.zeros_like(acc)
            for e in range(-r - 1, r + 1):
                win = pltpu.roll(s, n_cols - (e + col_off), 2)[:, :, :w]
                ef = jnp.float32(-e)
                hx = ((win[1] == ef).astype(jnp.float32)
                      + (win[2] == ef).astype(jnp.float32))
                m = win[0] * hx
                acc_d = acc_d + jnp.stack(
                    [win[4] * m, win[3] * m, win[5] * m])
            return acc + acc_d

        out_ref[0] = lax.fori_loop(
            0, side, body_d, jnp.zeros((3, ht, w), out_ref.dtype))

    return kernel


def flow_projection_bounded(flow: jnp.ndarray, depth_inv=None,
                            max_displacement: int = 8,
                            interpret: bool = False):
    """Bounded-flow projection forward.

    flow: (N, H, W, 2) channel-last (fx, fy); depth_inv: (N, H, W, 1) or
    None. Returns (out, cnt): the averaged projected flow (N, H, W, 2) and
    the raw count plane (N, H, W) for hole filling.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if flow.dtype != jnp.float32:
        out, cnt = flow_projection_bounded(
            flow.astype(jnp.float32),
            None if depth_inv is None else depth_inv.astype(jnp.float32),
            max_displacement, interpret)
        return out.astype(flow.dtype), cnt.astype(flow.dtype)

    n, h, w, _ = flow.shape
    r = max_displacement
    fx = flow[..., 0]
    fy = flow[..., 1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x2 = xs + fx
    y2 = ys + fy
    valid = ((x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1))
    weight = depth_inv[..., 0] if depth_inv is not None else jnp.ones_like(fx)
    wv = jnp.where(valid, weight, 0.0)
    planes = jnp.stack([y2, x2, -fy * wv, -fx * wv, wv], axis=1)  # (n,5,h,w)

    if not interpret:
        assert h % 8 == 0, (h, w)
    # wide (HD) frames: small row tiles keep the halo'd 5-plane block +
    # per-d stacked planes inside VMEM
    ht = 32 if (h % 32 == 0 and w <= 1024) else 8
    halo_rows = _round8(r + 1) + 8
    col_off = 128
    # lane-align the kernel width: right-pad to the next ×128 (padded
    # sources carry wv=0, padded output columns are sliced off)
    w128 = ((w + 127) // 128) * 128 if not interpret else w
    planes = jnp.pad(planes, ((0, 0), (0, 0), (halo_rows, halo_rows),
                              (col_off, col_off + (w128 - w))))

    grid = (n, h // ht)
    kernel = _make_kernel(r, h, ht, w, w128, halo_rows, col_off)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, h, w128), jnp.float32),
        compiler_params=(None if interpret else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=64 * 2**20)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(5),
                          pl.Element(ht + 2 * halo_rows),
                          pl.Element(w128 + 2 * col_off)),
                         lambda b, i: (b, 0, i * ht, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, ht, w128), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes)
    out = out[..., :w]
    acc = jnp.stack([out[:, 0], out[:, 1]], axis=-1)  # (n,h,w,2) (fx,fy)
    cnt = out[:, 2]
    proj = jnp.where(cnt[..., None] > 0,
                     acc / jnp.maximum(cnt[..., None], 1e-12), acc)
    return proj, cnt
