"""Pallas TPU kernel for the bounded bilinear warp.

Same math as ``ops/warp.grid_sample_bounded`` (exact for samples within R
pixels of their output location), but as a Pallas kernel: the image tile
(+R-row halo) and the coordinate fields stay VMEM-resident across the
(2R+2)² shift-select accumulation, so there is no giant XLA fusion graph
(which compiles pathologically server-side) and HBM traffic is O(HWC).

Layout mirrors ops/sepconv.py: C-leading (N, C, H, W) blocks, full-width
rows, 8-aligned Element row halos. Constraints: W % 128 == 0, H % 8 == 0
(the models' pad-to-×64/×128 guarantees this); columns are padded by
128 ≥ 2R+1 for lane alignment.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _col_tile(w: int, cap: int = 640) -> int:
    """Largest 128-multiple ≤ cap dividing w (w is a 128-multiple)."""
    t = min(w, cap)
    t -= t % 128
    while t >= 128 and w % t:
        t -= 128
    return max(t, 128)


def _warp_kernel(img_ref, dy0_ref, dx0_ref, fy_ref, fx_ref, out_ref,
                 *, r, ht, w, halo_rows, col_off, c):
    """img_ref: (1, C, ht+2*halo_rows, w+2*col_off) edge-padded rows/cols;
    coordinate refs: (1, ht, w); out_ref: (1, C, ht, w).

    The row sweep is a ``fori_loop`` of ``pltpu.roll`` (one dynamic rotate
    per d — only 2R+2 of them); the column sweep inside is python-unrolled
    so every column shift is a *static immediate* (a dynamic lane-rotate
    lowers to a log-step select chain; the same restructure measured 3.5×
    on the sepconv kernel). wy is hoisted out of the column loop.
    Unaligned static slices spill registers and a fully-unrolled sweep's
    live temporaries OOM the scoped-VMEM stack allocator — hence
    roll + offset-0 slices, fori on rows only.
    """
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    dy0 = dy0_ref[0]
    dx0 = dx0_ref[0]
    fy = fy_ref[0]
    fx = fx_ref[0]

    blk = img_ref[0]
    n_rows = blk.shape[1]
    n_cols = blk.shape[2]
    side = 2 * r + 2

    wx_all = []
    for e in range(-r, r + 2):
        wx_all.append((jnp.where(dx0 == e, 1.0 - fx, 0.0)
                       + jnp.where(dx0 == e - 1, fx, 0.0)
                       ).astype(out_ref.dtype))

    def body(i, acc):
        d = i - r
        wy = (jnp.where(dy0 == d, 1.0 - fy, 0.0)
              + jnp.where(dy0 == d - 1, fy, 0.0)).astype(out_ref.dtype)
        rows = pltpu.roll(blk, (n_rows - (d + halo_rows)) % n_rows,
                          1)[:, :ht, :]
        # Σ_e wx_e·win_e first, then one multiply by wy (the rank-1
        # factorization of the bilinear weights)
        term = jnp.zeros((c, ht, w), out_ref.dtype)
        for j, e in enumerate(range(-r, r + 2)):
            win = pltpu.roll(rows, n_cols - (e + col_off), 2)[:, :, :w]
            term = term + wx_all[j][None] * win
        return acc + wy[None] * term

    out_ref[0] = lax.fori_loop(0, side, body,
                               jnp.zeros((c, ht, w), out_ref.dtype))


def warp_bounded_pallas(img: jnp.ndarray, dy0: jnp.ndarray, dx0: jnp.ndarray,
                        fy: jnp.ndarray, fx: jnp.ndarray, r: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Accumulate Σ wy·wx·shift(img) with VMEM-resident tiles.

    img: (N, H, W, C) NHWC; dy0/dx0: int32 (N, H, W) floor displacements
    (pre-clipped to [−r, r−1]); fy/fx: fractional parts. Returns NHWC.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic rotate supports 32-bit data only — run the kernel in f32
    if img.dtype != jnp.float32:
        out = warp_bounded_pallas(img.astype(jnp.float32), dy0, dx0, fy, fx,
                                  r, interpret)
        return out.astype(img.dtype)

    n, h, w, c = img.shape
    assert w % 128 == 0 and h % 8 == 0, (h, w)
    ht = 32 if h % 32 == 0 else 8
    # 2-D tiling: wide (HD) frames are split along W as well — full-width
    # rows at 1920 wide made the per-tap rolls and the wx precompute blow
    # VMEM (and ht=8 full-width tiles measured SLOWER than the exact
    # gather); the column halo of 128 ≥ r+1 comes from the pre-padding
    wt = _col_tile(w)
    halo_rows = _round8(r + 1) + 8  # covers d ∈ [−r, r+1] with 8-alignment
    col_off = 128                   # column pad ≥ r+1, lane-aligned

    img_cl = jnp.transpose(img, (0, 3, 1, 2))
    img_cl = jnp.pad(img_cl, ((0, 0), (0, 0), (halo_rows, halo_rows),
                              (col_off, col_off)), mode="edge")

    dy0 = dy0.astype(jnp.int32)
    dx0 = dx0.astype(jnp.int32)
    fy = fy.astype(jnp.float32)
    fx = fx.astype(jnp.float32)

    grid = (n, h // ht, w // wt)
    kernel = functools.partial(_warp_kernel, r=r, ht=ht, w=wt,
                               halo_rows=halo_rows, col_off=col_off, c=c)
    cspec = pl.BlockSpec((1, ht, wt), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), img.dtype),
        compiler_params=(None if interpret else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=64 * 2**20)),
        grid=grid,
        in_specs=[
            # a BlockSpec must be all-Element or all-Blocked; the halo'd
            # input uses Element on every dim (offsets in elements)
            pl.BlockSpec((pl.Element(1), pl.Element(c),
                          pl.Element(ht + 2 * halo_rows),
                          pl.Element(wt + 2 * col_off)),
                         lambda b, i, j: (b, 0, i * ht, j * wt),
                         memory_space=pltpu.VMEM),
            cspec, cspec, cspec, cspec,
        ],
        out_specs=pl.BlockSpec((1, c, ht, wt),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_cl, dy0, dx0, fy, fx)
    return jnp.transpose(out, (0, 2, 3, 1))
