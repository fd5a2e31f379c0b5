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
closed-form weights times a gathered 4×4 window. Autodiff provides the
reference's three backward kernels (input scatter-add, flow via α/β,
filter via gathered products).

TPU formulation: ONE ``lax.gather`` of whole (4, 4, C) windows from an
edge-padded copy of the source. TPU gathers cost per gathered *row*
(~7-10 ns independent of row width), so fetching 4-row windows is ~4×
fewer DMAs than the 16 per-tap row gathers this op previously issued —
measured 93.5 → 88.1 ms on the composed DAIN forward at 448×256 (and the
~720 MB window temporary survives composition without XLA's while-loop
gather rewrite, unlike same-sized per-tap index tensors). Channels are
slabbed so the window temporary stays under ``_WINDOW_SLAB_BYTES`` at
large batch/tile sizes where a single gather temp would risk OOM or
loopification.
"""
from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

FILTER_SIZE = 4

# per-gather cap on the (N*H*W, 4, 4, cs) window temporary; channels are
# slabbed above it. 768 MB accommodates the full 196-ch DAIN ctx gather at
# batch-1 448×256 (~720 MB — measured fastest unslabbed); tests monkeypatch
# this to pin the multi-slab path.
_WINDOW_SLAB_BYTES = 768 * 2**20

# A "row-packed" single-segment gather (window rows packed into channels,
# flattened (W, 4c) axis so each 4×4×C window is ONE contiguous slice) was
# measured ~34× SLOWER on chip than this window gather (scripts/fi_micro.py
# at DAIN ctx shapes: stage2-like 27.4 ms taps vs 934 ms packed196) — the 4×
# packed-copy materialization + strided flat gather defeats the per-segment
# DMA saving — and was removed.


def filter_interpolation(img: jnp.ndarray, flow: jnp.ndarray,
                         filters: jnp.ndarray) -> jnp.ndarray:
    """img: (N,H,W,C); flow: (N,H,W,2) (fx,fy); filters: (N,H,W,16)."""
    n, h, w, c = img.shape
    fs = FILTER_SIZE
    # coordinate math at >= f32 (bf16 flows upcast; f64 stays f64 so
    # double-precision parity oracles run the whole pipeline in doubles)
    ct = jnp.promote_types(flow.dtype, jnp.float32)
    fx = flow[..., 0].astype(ct)
    fy = flow[..., 1].astype(ct)
    xs = jnp.arange(w, dtype=ct)[None, None, :]
    ys = jnp.arange(h, dtype=ct)[None, :, None]
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

    wgts = []
    for j in range(fs):
        wrow = (1.0 - beta) if j < fs // 2 else beta
        for i in range(fs):
            wcol = (1.0 - alpha) if i < fs // 2 else alpha
            wgts.append(filters[..., j * fs + i, None] * wrow * wcol)
    wgts = jnp.stack(wgts, axis=3)  # (N,H,W,16,1)

    # Edge padding (1 top/left, 2 bottom/right) makes the window gather's
    # border clamping identical to the reference's per-tap index clip: at
    # valid pixels iy_t ∈ [−1, h−2] / ix_l ∈ [−1, w−2] (validity bounds
    # y2 ∈ [0, h−1]), so every window row/col lands inside the padded
    # extent and out-of-range taps replicate the border pixel. Invalid
    # pixels pass the source through via the final `where` in both
    # formulations, so their (clamped) window contents are irrelevant.
    pad = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="edge")
    b_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None, None],
                             (n, h, w))
    row = jnp.clip(iy_t + 1, 0, h - 1)
    col = jnp.clip(ix_l + 1, 0, w - 1)

    cs = max(1, min(c, _WINDOW_SLAB_BYTES
                    // (n * h * w * fs * fs * img.dtype.itemsize)))
    outs = []
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    starts = jnp.stack([b_idx, row, col],
                       axis=-1).reshape(n * h * w, 3)
    for c0 in range(0, c, cs):
        sl = pad[..., c0:c0 + cs]
        vals = lax.gather(sl, starts, dnums,
                          slice_sizes=(1, fs, fs, sl.shape[-1]),
                          mode=lax.GatherScatterMode.CLIP)
        vals = vals.reshape(n, h, w, fs * fs, -1)
        outs.append(jnp.sum(vals * wgts, axis=3))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)

    return jnp.where(valid[..., None], out, img)
