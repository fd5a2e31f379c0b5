"""Adaptive separable convolution — the SepConv hot op.

Semantics (reference ``sepconv/sepconv_op/sepconv.py:5-30`` cupy kernel):

    out(n, y, x, c) = Σ_{k<F} Σ_{l<F} in(n, y+k, x+l, c) · kv(n, y, x, k) · kh(n, y, x, l)

with filter size F=51: a per-pixel rank-1 (vertical ⊗ horizontal) 51×51
filter applied to a replication-padded input. The reference implements
forward + three backward CUDA kernels (gradInput :32-63, gradVertical
:138-163, gradHorizontal :165-190); here:

  * :func:`sepconv_ref` — pure-jnp shift-and-accumulate reference
    (correct everywhere, used for tests and as the CPU path);
  * :func:`sepconv` — Pallas TPU kernel with a custom VJP. The kernel keeps
    the input tile (+F−1 halo) and both kernel maps resident in VMEM and
    runs the F² multiply-accumulate entirely on-chip, so HBM traffic is
    O(HWC) instead of the O(F²·HWC) a naive XLA lowering would generate.

The op is inherently VPU-bound (per-pixel kernels defeat the MXU's shared-
weight model): F²+F ≈ 2652 MACs/pixel/channel.

Layout: NHWC activations; kernel maps are (N, H, W, F) channel-last (the
reference uses (N, F, H, W); the torch→pytree converter and the model emit
channel-last directly).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

F_TAPS = 51  # default filter size (reference uses 51 everywhere)


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
# Pallas TPU kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(inp_ref, kv_ref, kh_ref, out_ref, *, f: int, ht: int, wt: int):
    """One (batch, h-tile, w-tile) program.

    Block shapes (leading batch block of 1 squeezed by indexing):
      inp_ref: (1, ht+f-1, wt+f-1, C) — input tile with halo
      kv_ref/kh_ref: (1, ht, wt, f)
      out_ref: (1, ht, wt, C)
    """
    import jax.lax as lax

    inp = inp_ref[0]          # (ht+f-1, wt+f-1, C)
    kv = kv_ref[0]            # (ht, wt, f)
    kh = kh_ref[0]
    c = inp.shape[-1]

    def body_k(k, acc):
        rows = lax.dynamic_slice(inp, (k, 0, 0), (ht, wt + f - 1, c))

        def body_l(l, acc_h):
            win = lax.dynamic_slice(rows, (0, l, 0), (ht, wt, c))
            return acc_h + win * kh[:, :, l][..., None]

        acc_h = lax.fori_loop(0, f, body_l, jnp.zeros((ht, wt, c), inp.dtype))
        return acc + acc_h * kv[:, :, k][..., None]

    out_ref[0] = lax.fori_loop(0, f, body_k,
                               jnp.zeros((ht, wt, c), inp.dtype))


def _pallas_forward(inp, kv, kh, f, ht, wt, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp, wp, c = inp.shape
    h, w = hp - f + 1, wp - f + 1
    assert h % ht == 0 and w % wt == 0, (h, w, ht, wt)
    grid = (n, h // ht, w // wt)

    kernel = functools.partial(_fwd_kernel, f=f, ht=ht, wt=wt)
    # input tiles overlap by f-1 (halo) → Element (elementwise-offset)
    # indexing on H/W; kernel-map and output tiles are plain Blocked.
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), inp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, pl.Element(ht + f - 1), pl.Element(wt + f - 1), c),
                         lambda b, i, j: (b, i * ht, j * wt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, wt, f),
                         lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, wt, f),
                         lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, wt, c),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(inp, kv, kh)


def _grad_kernels_kernel(inp_ref, g_ref, kv_ref, kh_ref, gkv_ref, gkh_ref,
                         *, f: int, ht: int, wt: int):
    """Fused gradVertical + gradHorizontal (reference :138-190).

    gkv(y,x,k) = Σ_c g(y,x,c) · Σ_l in(y+k, x+l, c) · kh(y,x,l)
    gkh(y,x,l) = Σ_c g(y,x,c) · Σ_k in(y+k, x+l, c) · kv(y,x,k)
    """
    import jax.lax as lax

    inp = inp_ref[0]
    g = g_ref[0]              # (ht, wt, C)
    kv = kv_ref[0]
    kh = kh_ref[0]
    c = inp.shape[-1]

    def body_k(k, carry):
        gkv, gkh = carry
        rows = lax.dynamic_slice(inp, (k, 0, 0), (ht, wt + f - 1, c))

        def body_l(l, inner):
            gkv_k, gkh = inner
            win = lax.dynamic_slice(rows, (0, l, 0), (ht, wt, c))
            gw = jnp.sum(win * g, axis=-1)          # (ht, wt)
            gkv_k = gkv_k + gw * kh[:, :, l]
            gkh = gkh.at[:, :, l].add(gw * kv[:, :, k])
            return gkv_k, gkh

        gkv_k, gkh = lax.fori_loop(
            0, f, body_l, (jnp.zeros((ht, wt), inp.dtype), gkh))
        gkv = gkv.at[:, :, k].set(gkv_k)
        return gkv, gkh

    gkv, gkh = lax.fori_loop(
        0, f, body_k,
        (jnp.zeros((ht, wt, f), inp.dtype), jnp.zeros((ht, wt, f), inp.dtype)))
    gkv_ref[0] = gkv
    gkh_ref[0] = gkh


def _pallas_grad_kernels(inp, g, kv, kh, f, ht, wt, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp, wp, c = inp.shape
    h, w = hp - f + 1, wp - f + 1
    grid = (n, h // ht, w // wt)
    kernel = functools.partial(_grad_kernels_kernel, f=f, ht=ht, wt=wt)
    kspec = pl.BlockSpec((1, ht, wt, f), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, h, w, f), inp.dtype),
                   jax.ShapeDtypeStruct((n, h, w, f), inp.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, pl.Element(ht + f - 1), pl.Element(wt + f - 1), c),
                         lambda b, i, j: (b, i * ht, j * wt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, wt, c),
                         lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            kspec, kspec,
        ],
        out_specs=(kspec, kspec),
        interpret=interpret,
    )(inp, g, kv, kh)


def _grad_input_ref(g, kv, kh, hp, wp):
    """gradInput (reference :32-63) via the transpose relation:
    gin(y', x') = Σ_{k,l} g(y'-k, x'-l) · kv(y'-k, x'-l, k) · kh(y'-k, x'-l, l).

    Implemented as scatter-free gather over a zero-padded product tensor:
    accumulated with dynamic_update_slice over shifted windows (XLA handles
    the read-modify-write race-free; the reference needs atomicAdd here).
    """
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


def _grad_input_kernel(g_ref, kv_ref, kh_ref, gin_ref, *, f, ht, wt):
    """Pallas gradInput: each program owns an input tile (+halo) and gathers
    all (k,l) contributions from the output-side product tensor."""
    import jax.lax as lax

    # g/kv/kh blocks carry a halo of f-1 on top/left (padded outside).
    g = g_ref[0]              # (ht+f-1, wt+f-1, C)
    kv = kv_ref[0]            # (ht+f-1, wt+f-1, f)
    kh = kh_ref[0]
    c = g.shape[-1]

    def body_k(k, acc):
        # output rows y = y' - k → slice at offset (f-1-k)
        def body_l(l, acc2):
            gs = lax.dynamic_slice(g, (f - 1 - k, f - 1 - l, 0), (ht, wt, c))
            kvs = lax.dynamic_slice(kv, (f - 1 - k, f - 1 - l, 0),
                                    (ht, wt, f))[:, :, k]
            khs = lax.dynamic_slice(kh, (f - 1 - k, f - 1 - l, 0),
                                    (ht, wt, f))[:, :, l]
            return acc2 + gs * (kvs * khs)[..., None]

        return lax.fori_loop(0, f, body_l, acc)

    gin_ref[0] = lax.fori_loop(0, f, body_k,
                               jnp.zeros((ht, wt, c), g.dtype))


def _pallas_grad_input(g, kv, kh, hp, wp, f, ht, wt, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = g.shape
    # pad g/kv/kh with f-1 zeros on every side so halo reads are in-bounds;
    # input-tile (y',x') at offset (i*ht, j*wt) reads padded range
    # [i*ht, i*ht+ht+f-1).
    pad = ((0, 0), (f - 1, f - 1), (f - 1, f - 1), (0, 0))
    gp = jnp.pad(g, pad)
    kvp = jnp.pad(kv, pad)
    khp = jnp.pad(kh, pad)
    assert hp % ht == 0 and wp % wt == 0
    grid = (n, hp // ht, wp // wt)
    kernel = functools.partial(_grad_input_kernel, f=f, ht=ht, wt=wt)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c), g.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, pl.Element(ht + f - 1), pl.Element(wt + f - 1), c),
                         lambda b, i, j: (b, i * ht, j * wt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pl.Element(ht + f - 1), pl.Element(wt + f - 1), f),
                         lambda b, i, j: (b, i * ht, j * wt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pl.Element(ht + f - 1), pl.Element(wt + f - 1), f),
                         lambda b, i, j: (b, i * ht, j * wt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, wt, c),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gp, kvp, khp)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _pick_tiles(h: int, w: int) -> Tuple[int, int]:
    """Largest tile dims ≤(64, 128) that divide (h, w)."""
    def pick(dim, cap):
        t = min(dim, cap)
        while dim % t:
            t -= 1
        return t
    return pick(h, 64), pick(w, 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sepconv(inp: jnp.ndarray, kv: jnp.ndarray, kh: jnp.ndarray,
            use_pallas: bool = True) -> jnp.ndarray:
    """out(y,x,c) = Σ_k Σ_l in(y+k, x+l, c)·kv(y,x,k)·kh(y,x,l).

    inp: (N, H+F-1, W+F-1, C); kv/kh: (N, H, W, F).
    """
    return _sepconv_fwd_impl(inp, kv, kh, use_pallas)


def _sepconv_fwd_impl(inp, kv, kh, use_pallas):
    if not use_pallas or jax.default_backend() != "tpu":
        return sepconv_ref(inp, kv, kh)
    f = kv.shape[-1]
    h, w = kv.shape[1], kv.shape[2]
    ht, wt = _pick_tiles(h, w)
    return _pallas_forward(inp, kv, kh, f, ht, wt)


def _sepconv_fwd(inp, kv, kh, use_pallas):
    return _sepconv_fwd_impl(inp, kv, kh, use_pallas), (inp, kv, kh)


def _sepconv_bwd(use_pallas, res, g):
    inp, kv, kh = res
    f = kv.shape[-1]
    hp, wp = inp.shape[1], inp.shape[2]
    h, w = kv.shape[1], kv.shape[2]
    on_tpu = use_pallas and jax.default_backend() == "tpu"
    if on_tpu:
        ht, wt = _pick_tiles(h, w)
        gkv, gkh = _pallas_grad_kernels(inp, g, kv, kh, f, ht, wt)
        hti, wti = _pick_tiles(hp, wp)
        gin = _pallas_grad_input(g, kv, kh, hp, wp, f, hti, wti)
    else:
        # reference-math fallbacks in pure jnp
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
