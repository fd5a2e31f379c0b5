"""Filter interpolation — warp-by-flow + local 4×4 adaptive filter with
bilinear quadrant weighting (DAIN).

Reference: ``/root/reference/dain/my_package/FilterInterpolation/
filterinterpolation_cuda_kernel.cu:28-160``. For each output pixel (y, x)
with flow (fx, fy), the sample point is (x2, y2) = (x+fx, y+fy). When the
point is in-bounds (and |fx| < w/2, |fy| < h/2), a 4×4 window anchored at
(⌊y2⌋−1, ⌊x2⌋−1) is gathered from the source (border-clamped) and combined
with the per-pixel 16-channel filter; the window splits into TL/TR/BL/BR
quadrants at the integer boundary of (x2, y2), weighted by the bilinear
factors ((1−α)(1−β), α(1−β), (1−α)β, αβ). Out-of-range pixels pass the
source through unchanged (:153-157).

Key simplification: with filter_size=4 the quadrant assignment is static —
window rows/cols {0,1} are the T/L half, {2,3} the B/R half — so the op is
16 gathers with closed-form weights. XLA lowers the gathers to TPU
dynamic-slices; autodiff provides the reference's three backward kernels
(input scatter-add, flow via α/β, filter via gathered products).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

FILTER_SIZE = 4

# combined-16-tap-gather temporary size above which the op accumulates
# tap-by-tap instead (see below); tests monkeypatch this to pin both paths.
# 32 MB: at batch 4 the combined path's s32 index tensor (29 MB) already
# triggers XLA's while-loop gather rewrite
_COMBINED_GATHER_BYTES = 32 * 2**20

# per-gather temporary cap for the tap-chunked branch: channels are slabbed
# so a single tap's gathered values never exceed this at any batch/tile
# size (180 MB tap temps at batch 4 loopified just like the combined path)
_TAP_SLAB_BYTES = 48 * 2**20


def filter_interpolation(img: jnp.ndarray, flow: jnp.ndarray,
                         filters: jnp.ndarray) -> jnp.ndarray:
    """img: (N,H,W,C); flow: (N,H,W,2) (fx,fy); filters: (N,H,W,16)."""
    n, h, w, c = img.shape
    fs = FILTER_SIZE
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
    ix_l = x2i + 1 - fs // 2  # window col origin (⌊x2⌋ − 1)
    iy_t = y2i + 1 - fs // 2

    flat = img.reshape(n, h * w, c)

    idxs = []
    wgts = []
    for j in range(fs):
        row = jnp.clip(iy_t + j, 0, h - 1)
        wrow = (1.0 - beta) if j < fs // 2 else beta
        for i in range(fs):
            col = jnp.clip(ix_l + i, 0, w - 1)
            wcol = (1.0 - alpha) if i < fs // 2 else alpha
            idxs.append(row * w + col)
            wgts.append(filters[..., j * fs + i, None] * wrow * wcol)

    if n * h * w * fs * fs * c * img.dtype.itemsize <= _COMBINED_GATHER_BYTES:
        # single combined gather for all 16 taps (16 separate
        # take_along_axis calls measured ~25% slower standalone —
        # per-gather launch overhead on TPU), one weighted reduction
        idx = jnp.stack(idxs, axis=1).reshape(n, -1, 1)
        vals = jnp.take_along_axis(flat, idx,
                                   axis=1).reshape(n, fs * fs, h, w, c)
        out = jnp.sum(vals * jnp.stack(wgts, axis=1), axis=1)
    else:
        # wide-channel inputs (DAIN ctx: 196 ch → the combined gather is a
        # ~720 MB temporary): under memory pressure XLA rewrites that
        # gather into a serialized while-loop of dynamic-update-slices
        # (measured +80 ms inside the composed DAIN forward, HLO
        # %wide.body.*.sunk) — accumulate tap-by-tap, slabbing channels so
        # the per-gather temporary stays under _TAP_SLAB_BYTES at any
        # batch/tile size, keeping the normal gather emitter in play
        cs = max(1, min(c, _TAP_SLAB_BYTES
                        // (n * h * w * img.dtype.itemsize)))
        slabs = []
        for c0 in range(0, c, cs):
            sl = flat[:, :, c0:c0 + cs]
            acc = jnp.zeros((n, h, w, sl.shape[-1]), img.dtype)
            for idx_t, w_t in zip(idxs, wgts):
                vals = jnp.take_along_axis(sl, idx_t.reshape(n, -1, 1),
                                           axis=1)
                acc = acc + vals.reshape(n, h, w, -1) * w_t
            slabs.append(acc)
        out = slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs, -1)

    return jnp.where(valid[..., None], out, img)
