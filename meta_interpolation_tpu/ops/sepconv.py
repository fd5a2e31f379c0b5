"""Adaptive separable convolution — the SepConv hot op.

Semantics (reference ``sepconv/sepconv_op/sepconv.py:5-30`` cupy kernel):

    out(n, y, x, c) = Σ_{k<F} Σ_{l<F} in(n, y+k, x+l, c) · kv(n, y, x, k) · kh(n, y, x, l)

with filter size F=51: a per-pixel rank-1 (vertical ⊗ horizontal) 51×51
filter applied to a replication-padded input. The reference implements
forward + three backward CUDA kernels (gradInput :32-63, gradVertical
:138-163, gradHorizontal :165-190); here:

  * :func:`sepconv_ref` — pure-jnp shift-and-accumulate reference
    (correct everywhere, used for tests and as the CPU path);
  * :func:`sepconv` — Pallas TPU kernels with a custom VJP.

TPU kernel design: blocks are C-leading (N, C, H, W) with **full-width**
rows so every BlockSpec satisfies the Mosaic (8, 128) tiling rule:
W is a multiple of 128 (the model pads to ×128), row tiles are 8-aligned,
and the overlapping input halo uses ``pl.Element`` row indexing with a
56-row halo (≥ F−1 = 50, rounded up to ×8). The input tile and both
kernel-map tiles stay resident in VMEM across the full F² multiply-
accumulate, so HBM traffic is O(HWC) instead of the O(F²·HWC) a naive
lowering would generate. The op is inherently VPU-bound (per-pixel kernels
defeat the MXU's shared-weight model): F²+F ≈ 2652 MACs/pixel/channel.

Public layout: NHWC activations, (N, H, W, F) kernel maps (channel-last;
the reference uses (N, F, H, W)); layout conversion happens inside.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

F_TAPS = 51  # default filter size (reference uses 51 everywhere)
_HALO = 56   # F-1=50 rounded up to a multiple of 8


# ---------------------------------------------------------------------------
# jnp reference (tests / CPU fallback)
# ---------------------------------------------------------------------------

def sepconv_ref(inp: jnp.ndarray, kv: jnp.ndarray, kh: jnp.ndarray
                ) -> jnp.ndarray:
    """Shift-and-accumulate reference.

    inp: (N, H+F-1, W+F-1, C); kv/kh: (N, H, W, F) → out (N, H, W, C).
    """
    n, hp, wp, c = inp.shape
    f = kv.shape[-1]
    h = hp - f + 1
    w = wp - f + 1

    def body_k(k, acc):
        rows = jax.lax.dynamic_slice(inp, (0, k, 0, 0), (n, h, wp, c))

        def body_l(l, acc_h):
            win = jax.lax.dynamic_slice(rows, (0, 0, l, 0), (n, h, w, c))
            return acc_h + win * kh[..., l, None]

        acc_h = jax.lax.fori_loop(0, f, body_l,
                                  jnp.zeros((n, h, w, c), inp.dtype))
        return acc + acc_h * kv[..., k, None]

    return jax.lax.fori_loop(0, f, body_k,
                             jnp.zeros((n, h, w, c), inp.dtype))


# ---------------------------------------------------------------------------
# Pallas TPU kernels (C-leading, full-width blocks)
# ---------------------------------------------------------------------------

def _fwd_kernel(inp_ref, kv_ref, kh_ref, out_ref, *, f, ht, w, wpad, c):
    """One (batch, row-tile) program.

    inp_ref: (1, C, ht+HALO, w+wpad) — rows [i*ht, i*ht+ht+HALO)
    kv_ref/kh_ref: (1, f, ht, w); out_ref: (1, C, ht, w)

    Tap windows are produced by ``pltpu.roll`` + offset-0 slices: Mosaic
    lowers rolls to cheap rotates, whereas unaligned static slices generate
    per-tap relayout copies that spill registers (measured: 229 MB of spill
    slots for the F²-unrolled slice form).

    Loop structure exploits the rank-1 (vertical ⊗ horizontal) factorization:
    the outer k-loop (fori) does ONE row-roll of the halo'd block (F rolls
    total instead of F²), the inner l-loop is python-unrolled so all F
    column shifts are *static immediates* — a dynamic lane-rotate lowers to
    a log-step select chain, and switching the inner shifts to immediates
    measured 3.5× on the whole op (9.3 → 2.7 ms at 384×512×3). kv[k]
    multiplies once per k (saves the per-tap (ht,w) kv·kh product too).
    Fully unrolling k as well spills 97 MB of live rows — fori it stays.
    """
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    blk = inp_ref[0]
    n_rows = blk.shape[1]
    n_cols = blk.shape[2]

    def body_k(k, acc):
        # dynamic rotate: shift by (n−k) moves content up by k, so [:ht]
        # are rows k..
        rows = pltpu.roll(blk, (n_rows - k) % n_rows, 1)[:, :ht, :]
        acc_h = rows[:, :, :w] * kh_ref[0, 0][None]
        for l in range(1, f):
            win = pltpu.roll(rows, n_cols - l, 2)[:, :, :w]
            acc_h = acc_h + win * kh_ref[0, l][None]
        return acc + acc_h * kv_ref[0, k][None]

    out_ref[0] = lax.fori_loop(0, f, body_k,
                               jnp.zeros((c, ht, w), out_ref.dtype))


def _row_tile(h: int, cap: int = 32) -> int:
    """Largest 8-multiple ≤ cap dividing h (h is a multiple of 8 by
    construction)."""
    t = min(h, cap)
    t -= t % 8
    while t >= 8 and h % t:
        t -= 8
    return max(t, 8)


def _to_cl(x):  # NHWC → NCHW
    return jnp.transpose(x, (0, 3, 1, 2))


def _from_cl(x):  # NCHW → NHWC
    return jnp.transpose(x, (0, 2, 3, 1))


def _pallas_forward(inp, kv, kh, f, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic rotate supports 32-bit data only — run the kernel in f32
    out_dtype = inp.dtype
    if out_dtype != jnp.float32:
        out = _pallas_forward(inp.astype(jnp.float32),
                              kv.astype(jnp.float32),
                              kh.astype(jnp.float32), f, interpret)
        return out.astype(out_dtype)

    n, hp, wp, c = inp.shape
    h, w = hp - f + 1, wp - f + 1
    if not interpret:
        assert w % 128 == 0 and h % 8 == 0, (
            f"pallas sepconv needs W%128==0 and H%8==0, got {h}x{w}")
    # wide (HD) frames: drop the row tile so the double-buffered
    # (f, ht, w) kernel-map blocks stay inside VMEM
    cap = 32 if w <= 1024 else 8
    ht = (_row_tile(h, cap) if not interpret
          else (min(h, 8) if h % 8 == 0 else h))
    wpad = 128 if not interpret else f - 1  # lane alignment (≥ f-1)

    inp_cl = _to_cl(inp)  # (n, c, hp, wp)
    inp_cl = jnp.pad(inp_cl, ((0, 0), (0, 0), (0, h + _HALO - hp),
                              (0, w + wpad - wp)))
    kv_cl = jnp.transpose(kv, (0, 3, 1, 2))  # (n, f, h, w)
    kh_cl = jnp.transpose(kh, (0, 3, 1, 2))

    grid = (n, h // ht)
    kernel = functools.partial(_fwd_kernel, f=f, ht=ht, w=w, wpad=wpad, c=c)
    # the restructured kernel keeps rows/acc_h live alongside the
    # double-buffered kernel-map tiles — needs a bit over the 16 MB default
    cparams = (None if interpret else
               pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), inp.dtype),
        compiler_params=cparams,
        grid=grid,
        in_specs=[
            # all-Element halo'd input block (mixed Element/Blocked specs
            # are rejected by Mosaic)
            pl.BlockSpec((pl.Element(1), pl.Element(c),
                          pl.Element(ht + _HALO), pl.Element(w + wpad)),
                         lambda b, i: (b, 0, i * ht, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, ht, w), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, ht, w), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, ht, w), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(inp_cl, kv_cl, kh_cl)
    return _from_cl(out)


def _grad_kernels_kernel(inp_ref, g_ref, kv_ref, kh_ref, gkv_ref, gkh_ref,
                         *, f, ht, w, wpad):
    """Fused gradVertical + gradHorizontal (reference :138-190).

    gkv(k) = Σ_l kh_l ⊙ gw(k,l);  gkh(l) = Σ_k kv_k ⊙ gw(k,l)
    with gw(k,l) = Σ_c g_c ⊙ win(k,l)_c.

    Same loop structure as _fwd_kernel: fori over k with ONE dynamic
    row-roll, python-static immediate column shifts inside (a dynamic
    lane-rotate lowers to a log-step select chain — immediates measured
    ~3× on the forward). gkv accumulates in registers per k and is stored
    once; gkh accumulates via ref writes across k iterations.
    """
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    g = g_ref[0]              # (C, ht, w)
    gkh_ref[0] = jnp.zeros((f, ht, w), gkh_ref.dtype)
    blk = inp_ref[0]
    n_rows = blk.shape[1]
    n_cols = blk.shape[2]

    def body_k(k, _):
        rows = pltpu.roll(blk, (n_rows - k) % n_rows, 1)[:, :ht, :]
        kv_k = kv_ref[0, k]
        gw = jnp.sum(rows[:, :, :w] * g, axis=0)
        gkv_k = gw * kh_ref[0, 0]
        gkh_ref[0, 0] += gw * kv_k
        for l in range(1, f):
            win = pltpu.roll(rows, n_cols - l, 2)[:, :, :w]
            gw = jnp.sum(win * g, axis=0)      # (ht, w)
            gkv_k = gkv_k + gw * kh_ref[0, l]
            gkh_ref[0, l] += gw * kv_k
        gkv_ref[0, k] = gkv_k
        return 0

    lax.fori_loop(0, f, body_k, 0)


def _pallas_grad_kernels(inp, g, kv, kh, f, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if inp.dtype != jnp.float32:
        gkv, gkh = _pallas_grad_kernels(
            inp.astype(jnp.float32), g.astype(jnp.float32),
            kv.astype(jnp.float32), kh.astype(jnp.float32), f, interpret)
        return gkv.astype(kv.dtype), gkh.astype(kh.dtype)

    n, hp, wp, c = inp.shape
    h, w = kv.shape[1], kv.shape[2]
    ht = (_row_tile(h, cap=16 if w <= 1024 else 8) if not interpret
          else (min(h, 8) if h % 8 == 0 else h))
    wpad = 128 if not interpret else f - 1

    inp_cl = jnp.pad(_to_cl(inp), ((0, 0), (0, 0), (0, h + _HALO - hp),
                                   (0, w + wpad - wp)))
    g_cl = _to_cl(g)
    kv_cl = jnp.transpose(kv, (0, 3, 1, 2))
    kh_cl = jnp.transpose(kh, (0, 3, 1, 2))

    grid = (n, h // ht)
    kernel = functools.partial(_grad_kernels_kernel, f=f, ht=ht, w=w,
                               wpad=wpad)
    kspec = pl.BlockSpec((1, f, ht, w), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM)
    gkv, gkh = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, f, h, w), inp.dtype),
                   jax.ShapeDtypeStruct((n, f, h, w), inp.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(c),
                          pl.Element(ht + _HALO), pl.Element(w + wpad)),
                         lambda b, i: (b, 0, i * ht, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, ht, w), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            kspec, kspec,
        ],
        out_specs=(kspec, kspec),
        interpret=interpret,
    )(inp_cl, g_cl, kv_cl, kh_cl)
    return (jnp.transpose(gkv, (0, 2, 3, 1)),
            jnp.transpose(gkh, (0, 2, 3, 1)))


def _grad_input_ref(g, kv, kh, hp, wp):
    """Pure-jnp gradInput (used as the actual backward; see note in
    _sepconv_bwd)."""
    n, h, w, c = g.shape
    f = kv.shape[-1]

    def body_k(k, acc):
        def body_l(l, acc2):
            contrib = g * (kv[..., k] * kh[..., l])[..., None]
            cur = jax.lax.dynamic_slice(acc2, (0, k, l, 0), (n, h, w, c))
            return jax.lax.dynamic_update_slice(acc2, cur + contrib,
                                                (0, k, l, 0))

        return jax.lax.fori_loop(0, f, body_l, acc)

    return jax.lax.fori_loop(0, f, body_k,
                             jnp.zeros((n, hp, wp, c), g.dtype))


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _tpu_shapes_ok(kv) -> bool:
    h, w = kv.shape[1], kv.shape[2]
    return (w % 128 == 0) and (h % 8 == 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sepconv(inp: jnp.ndarray, kv: jnp.ndarray, kh: jnp.ndarray,
            use_pallas: bool = True) -> jnp.ndarray:
    """out(y,x,c) = Σ_k Σ_l in(y+k, x+l, c)·kv(y,x,k)·kh(y,x,l).

    inp: (N, H+F-1, W+F-1, C); kv/kh: (N, H, W, F).
    """
    return _sepconv_fwd_impl(inp, kv, kh, use_pallas)


def _sepconv_fwd_impl(inp, kv, kh, use_pallas):
    if (not use_pallas or jax.default_backend() != "tpu"
            or not _tpu_shapes_ok(kv)):
        return sepconv_ref(inp, kv, kh)
    return _pallas_forward(inp, kv, kh, kv.shape[-1])


def _sepconv_fwd(inp, kv, kh, use_pallas):
    return _sepconv_fwd_impl(inp, kv, kh, use_pallas), (inp, kv, kh)


def _sepconv_bwd(use_pallas, res, g):
    inp, kv, kh = res
    f = kv.shape[-1]
    hp, wp = inp.shape[1], inp.shape[2]
    h, w = kv.shape[1], kv.shape[2]
    on_tpu = (use_pallas and jax.default_backend() == "tpu"
              and _tpu_shapes_ok(kv))
    if on_tpu:
        gkv, gkh = _pallas_grad_kernels(inp, g, kv, kh, f)
        # gradInput stays on the shift-accumulate jnp path: it is the same
        # O(F²) loop but with static shifts, which XLA fuses well, and the
        # padded-halo pallas variant buys little for the extra complexity.
        gin = _grad_input_ref(g, kv, kh, hp, wp)
    else:
        n, _, _, c = inp.shape

        def body_k(k, carry):
            gkv, gkh = carry
            rows = jax.lax.dynamic_slice(inp, (0, k, 0, 0), (n, h, wp, c))

            def body_l(l, inner):
                gkv_k, gkh = inner
                win = jax.lax.dynamic_slice(rows, (0, 0, l, 0), (n, h, w, c))
                gw = jnp.sum(win * g, axis=-1)
                return gkv_k + gw * kh[..., l], gkh.at[..., l].add(gw * kv[..., k])

            gkv_k, gkh = jax.lax.fori_loop(
                0, f, body_l, (jnp.zeros((n, h, w), inp.dtype), gkh))
            return gkv.at[..., k].set(gkv_k), gkh

        gkv, gkh = jax.lax.fori_loop(
            0, f, body_k, (jnp.zeros_like(kv), jnp.zeros_like(kh)))
        gin = _grad_input_ref(g, kv, kh, hp, wp)
    return gin, gkv, gkh


sepconv.defvjp(_sepconv_fwd, _sepconv_bwd)


def separable_conv_flow(kv: jnp.ndarray, kh: jnp.ndarray) -> jnp.ndarray:
    """Flow field implied by 1-D adaptive kernels — the weighted centroid of
    each kernel minus its center.

    Reference ``separableconvflow_cuda_kernel.cu:60-90`` (DAIN's
    SeparableConvFlowLayer): flow_y = Σ_k k·kv[k]/Σ_k kv[k] − (F−1)/2 (same
    for flow_x from kh); −2000 sentinel where the kernel sums to zero.

    kv/kh: (N, H, W, F) → (N, H, W, 2) channel-last (fx, fy).
    """
    f = kv.shape[-1]
    taps = jnp.arange(f, dtype=kv.dtype)
    center = (f - 1) / 2.0

    def centroid(k):
        s = jnp.sum(k, axis=-1)
        c = jnp.sum(k * taps, axis=-1) / jnp.where(s == 0, 1.0, s) - center
        return jnp.where(jnp.abs(s) > 0, c, -2000.0)

    return jnp.stack([centroid(kh), centroid(kv)], axis=-1)
