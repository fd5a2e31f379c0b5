"""Shared functional layers (NHWC, TPU-friendly).

These replace the reference's meta-layer library
(``/root/reference/model_utils.py``): plain functions over ``{'kernel','bias'}``
pytrees instead of ``params=``-threaded nn.Modules. All activations keep NHWC
layout (XLA's preferred TPU conv layout); kernels are HWIO.

Initialization matches torch defaults (kaiming-uniform a=sqrt(5) for conv
weight, uniform ±1/sqrt(fan_in) bias) so random-init training dynamics are
comparable with the reference.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (torch nn.Conv2d default semantics)
# ---------------------------------------------------------------------------

def conv_init(rng: jax.Array, in_ch: int, out_ch: int, ksize,
              bias: bool = True) -> Params:
    """Init a conv layer the way torch does (kaiming_uniform(a=√5))."""
    if isinstance(ksize, int):
        ksize = (ksize, ksize)
    k_rng, b_rng = jax.random.split(rng)
    fan_in = in_ch * ksize[0] * ksize[1]
    # kaiming_uniform with a=sqrt(5) → bound = sqrt(6 / ((1 + a^2) * fan_in))
    bound = math.sqrt(6.0 / (6.0 * fan_in))
    kernel = jax.random.uniform(k_rng, (ksize[0], ksize[1], in_ch, out_ch),
                                minval=-bound, maxval=bound)
    p: Params = {"kernel": kernel}
    if bias:
        b_bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(b_rng, (out_ch,), minval=-b_bound,
                                       maxval=b_bound)
    return p


def linear_init(rng: jax.Array, in_f: int, out_f: int, bias: bool = True) -> Params:
    k_rng, b_rng = jax.random.split(rng)
    bound = math.sqrt(6.0 / (6.0 * in_f))
    p: Params = {"kernel": jax.random.uniform(k_rng, (in_f, out_f),
                                              minval=-bound, maxval=bound)}
    if bias:
        b_bound = 1.0 / math.sqrt(in_f)
        p["bias"] = jax.random.uniform(b_rng, (out_f,), minval=-b_bound,
                                       maxval=b_bound)
    return p


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------

# --- episode-fast batched-weight convs --------------------------------------
#
# Under the episode vmap, per-task adapted weights turn every conv into an
# XLA feature-grouped conv, measured ~7x slower than dense on TPU v5e. A
# jax.custom_vmap rule rewrites the (both-operands-batched) case as 9
# tap-wise batched einsums, which run near dense-conv speed.
#
# jax.custom_vmap functions only become reverse-differentiable AFTER a vmap
# has expanded them (grad-of-vmap works; vmap-of-grad and plain grad fail
# with "Linearization failed"), so this path is OFF by default and enabled
# by the episode builder exactly around the vmapped episode trace, with
# inner-gradient lambdas re-disabling it (see meta/episode.py).

_EPISODE_FAST_CONV = [False]  # trace-time switch, single-threaded tracing
FAST_BATCHED_CONV_ENABLED = True  # global kill switch (tests / debugging)


class episode_fast_conv:
    """Context manager toggling the batched-weight fast-conv trace path.

    Modes: ``False`` (plain lax.conv), ``True``/``"vmap"`` (custom_vmap +
    custom_vjp tap-einsum rewrite — first-order only), ``"einsum"`` (pure
    tap-einsum formulation with NO custom rules — differentiable at every
    order and vmap-native, used inside second-order inner-grad lambdas
    where the double-backward would otherwise lower per-task weight
    cotangents to XLA grouped convs)."""

    def __init__(self, enable=True):
        self.enable = enable

    def __enter__(self):
        self.prev = _EPISODE_FAST_CONV[0]
        mode = self.enable
        if mode is True:
            mode = "vmap"
        if not FAST_BATCHED_CONV_ENABLED:
            mode = False
        _EPISODE_FAST_CONV[0] = mode

    def __exit__(self, *exc):
        _EPISODE_FAST_CONV[0] = self.prev


def _conv3x3_einsum(x, kernel, pad: int):
    """3x3 conv as 9 tap einsums — pure jnp, every derivative order is
    again einsums, and vmap batches them natively (never a grouped
    conv). Slower than lax.conv for dense forwards (K=C per tap instead
    of 9C), so only the second-order episode path routes here."""
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho, wo = x.shape[1] - 2, x.shape[2] - 2
    out = 0.0
    for dy in range(3):
        for dx in range(3):
            out = out + jnp.einsum(
                "nhwc,co->nhwo", x[:, dy:dy + ho, dx:dx + wo, :],
                kernel[dy, dx],
                preferred_element_type=jnp.promote_types(x.dtype,
                                                         jnp.float32))
    return out.astype(x.dtype)


def _conv3x3_raw(x, kernel, pad: int):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _make_fast_conv3x3(pad: int):
    @jax.custom_batching.custom_vmap
    def conv(x, kernel):
        return _conv3x3_raw(x, kernel, pad)

    @conv.def_vmap
    def rule(axis_size, in_batched, x, kernel):
        x_b, k_b = in_batched
        if x_b and k_b:
            # per-task weights: 9 tap-wise batched matmuls (near dense
            # speed; the conv batching rule's grouped conv is ~7x slower
            # on TPU)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad),
                                (0, 0)))
            ho, wo = x.shape[2] - 2, x.shape[3] - 2
            out = 0.0
            for dy in range(3):
                for dx in range(3):
                    sl = x[:, :, dy:dy + ho, dx:dx + wo, :]
                    out = out + jnp.einsum(
                        "tbhwc,tco->tbhwo", sl, kernel[:, dy, dx],
                        preferred_element_type=jnp.promote_types(
                            x.dtype, jnp.float32))
            return out.astype(x.dtype), True
        if x_b and not k_b:
            t, b = x.shape[0], x.shape[1]
            o = _conv3x3_raw(x.reshape((t * b,) + x.shape[2:]), kernel, pad)
            return o.reshape((t, b) + o.shape[1:]), True
        # kernel batched, x shared: broadcast x into the task axis
        xb = jnp.broadcast_to(x, (axis_size,) + x.shape)
        return rule(axis_size, (True, True), xb, kernel)

    return conv


_conv3x3_valid = _make_fast_conv3x3(0)
_conv3x3_same = _make_fast_conv3x3(1)
_conv3x3_full = _make_fast_conv3x3(2)


def _weight_grad_3x3(x, ct, pad: int):
    """d(conv3x3(x, W))/dW as 9 tap einsums — vmaps to batched einsums
    natively (no grouped-conv lowering), so it needs no custom rule."""
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho, wo = ct.shape[1], ct.shape[2]
    taps = [[jnp.einsum("nhwc,nhwo->co", x[:, dy:dy + ho, dx:dx + wo, :], ct,
                        preferred_element_type=jnp.promote_types(
                            x.dtype, jnp.float32))
             for dx in range(3)] for dy in range(3)]
    return jnp.stack([jnp.stack(r) for r in taps]).astype(x.dtype)


def _make_fast_conv3x3_ad(pad: int):
    """custom_vjp wrapper whose fwd/bwd are built from the custom_vmap
    convs. custom_vmap alone cannot be linearized (vmap-of-grad fails);
    with the VJP supplied explicitly, jax.grad inside the episode vmap
    simply vmaps fwd and bwd, where the custom_vmap rules apply. The bwd
    itself is NOT differentiable under vmap — second-order episodes keep
    the fast path disabled (meta/episode.py)."""
    inner = _conv3x3_valid if pad == 0 else _conv3x3_same

    @jax.custom_vjp
    def conv(x, kernel):
        return inner(x, kernel)

    def fwd(x, kernel):
        return inner(x, kernel), (x, kernel)

    def bwd(res, ct):
        x, kernel = res
        ct = ct.astype(x.dtype)
        w_t = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
        # input grad: full correlation with the rotated kernel
        dx_conv = _conv3x3_full if pad == 0 else _conv3x3_same
        dx = dx_conv(ct, w_t)
        dw = _weight_grad_3x3(x, ct, pad)
        return dx, dw

    conv.defvjp(fwd, bwd)
    return conv


_conv3x3_valid_ad = _make_fast_conv3x3_ad(0)
_conv3x3_same_ad = _make_fast_conv3x3_ad(1)


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1,
           padding="SAME", dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """NHWC conv. ``padding``: 'SAME' | 'VALID' | int | ((t,b),(l,r))."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    kernel = p["kernel"].astype(x.dtype)
    if (_EPISODE_FAST_CONV[0] and kernel.ndim == 4 and kernel.shape[0] == 3
            and kernel.shape[1] == 3 and stride == 1 and dilation == 1
            and groups == 1 and padding in ("VALID", "SAME", ((1, 1), (1, 1)))):
        # episode trace: route through the custom-vmap conv so per-task
        # adapted weights avoid XLA's grouped-conv lowering
        if _EPISODE_FAST_CONV[0] == "einsum":
            out = _conv3x3_einsum(x, kernel,
                                  0 if padding == "VALID" else 1)
        else:
            fast = (_conv3x3_valid_ad if padding == "VALID"
                    else _conv3x3_same_ad)
            out = fast(x, kernel)
    else:
        # no preferred_element_type: the TPU MXU accumulates bf16 dots in
        # f32 internally either way, and an f32-out + downcast pair breaks
        # the conv transpose rule's dtype agreement under jax.grad
        out = jax.lax.conv_general_dilated(
            x, kernel, (stride, stride), padding,
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def conv2d_transpose(p: Params, x: jnp.ndarray, stride: int = 2,
                     padding: int = 1) -> jnp.ndarray:
    """Transposed conv matching torch ConvTranspose2d(k, stride, padding).

    Kernel stored HWIO: (kh, kw, in_ch, out_ch) with in_ch = x's channels
    (torch ConvTranspose2d weight (in, out, kh, kw) transposed (2,3,0,1)).
    Implemented as an lhs-dilated conv with a spatially flipped kernel.
    """
    kernel = p["kernel"].astype(x.dtype)
    kh, kw = kernel.shape[0], kernel.shape[1]
    # out = (in−1)·s + k − 2p  (torch, output_padding=0) ⇒ symmetric
    # (k−1−p) padding around the s-dilated input
    pad_h = kh - 1 - padding
    pad_w = kw - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, (0, 1)),
        (1, 1), ((pad_h, pad_h), (pad_w, pad_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def reflect_pad(x: jnp.ndarray, pad) -> jnp.ndarray:
    """Reflection pad NHWC. ``pad``: int or (left, right, top, bottom)."""
    if isinstance(pad, int):
        l = r = t = b = pad
    else:
        l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="reflect")


def conv2d_reflect3x3(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 conv with 1-px reflect padding, WITHOUT materializing
    the padded tensor.

    ``conv(reflect_pad(x))`` costs a full extra HBM round trip per call on
    TPU (XLA lowers the reflect pad to rev+concat it cannot fuse into the
    conv; CAIN's body has 122 of them — measured +5.5 ms per batch-16 step
    at 448×256, BASELINE.md ablations). Same math, restructured: a zero-
    ``SAME`` conv (padding fused into XLA's conv, free) plus analytic
    border corrections — for the 1-px reflect halo, the missing
    contribution to output row 0 is exactly ``Σ_dx x[1, j+dx]·k[0, dx]``
    (row -1 reflects to row 1), a (N,W,3C)@(3C,O) matmul; same for the
    bottom row / left / right columns, with the four corner terms
    (counted by both a row and a column fix) subtracted once. ~2 % extra
    FLOPs, zero extra full-tensor traffic. Identical math to
    ``conv2d(p, reflect_pad(x,1), padding='VALID')`` up to fp summation
    order (pinned by test at f32 tolerance).
    """
    k = p["kernel"].astype(x.dtype)  # (3, 3, C, O)
    assert k.shape[0] == 3 and k.shape[1] == 3, "3x3 kernels only"
    n, h, w, c = x.shape
    o = k.shape[3]
    # route through conv2d (bias added at the end, after the corrections)
    # so the episode's batched-weight fast-conv path still applies
    out = conv2d({"kernel": k}, x, padding=((1, 1), (1, 1)))

    def line_fix(line, k3, length):
        # line (N, L, C), k3 (3, C, O): Σ_dx line_pad[i+dx-1] @ k3[dx]
        # with 1-px reflect padding of the line itself (covers the
        # corner-of-the-halo reflect-both positions).
        lp = jnp.concatenate(
            [line[:, 1:2], line, line[:, length - 2:length - 1]], axis=1)
        stacked = jnp.concatenate(
            [lp[:, 0:length], lp[:, 1:length + 1], lp[:, 2:length + 2]],
            axis=-1)  # (N, L, 3C), dx-major blocks matching k3.reshape
        return stacked @ k3.reshape(3 * c, o)

    def corner(py, px, ky, kx):
        return x[:, py, px, :] @ k[ky, kx]

    top = line_fix(x[:, 1], k[0], w)
    top = top.at[:, 0].add(-corner(1, 1, 0, 0))
    top = top.at[:, w - 1].add(-corner(1, w - 2, 0, 2))
    bot = line_fix(x[:, h - 2], k[2], w)
    bot = bot.at[:, 0].add(-corner(h - 2, 1, 2, 0))
    bot = bot.at[:, w - 1].add(-corner(h - 2, w - 2, 2, 2))
    left = line_fix(x[:, :, 1], k[:, 0], h)
    right = line_fix(x[:, :, w - 2], k[:, 2], h)

    # combine as ONE fusable elementwise mask-add — row/col .at[] updates
    # lower to dynamic-update-slices XLA copies the whole tensor for
    # (measured 4 extra full round trips per conv, slower than the pad
    # this kernel removes); the masked form is a single fused HBM pass
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    zero = jnp.zeros((), out.dtype)
    corr = (jnp.where(ii == 0, top[:, None], zero)
            + jnp.where(ii == h - 1, bot[:, None], zero)
            + jnp.where(jj == 0, left[:, :, None], zero)
            + jnp.where(jj == w - 1, right[:, :, None], zero))
    out = out + corr
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def replicate_pad(x: jnp.ndarray, pad) -> jnp.ndarray:
    if isinstance(pad, int):
        l = r = t = b = pad
    else:
        l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


def leaky_relu(x, negative_slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope)


def avg_pool(x: jnp.ndarray, window: int = 2, stride: Optional[int] = None) -> jnp.ndarray:
    stride = stride or window
    out = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                (1, window, window, 1), (1, stride, stride, 1),
                                "VALID")
    return out / (window * window)


def max_pool(x: jnp.ndarray, window: int = 2, stride: Optional[int] = None) -> jnp.ndarray:
    stride = stride or window
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1), (1, stride, stride, 1),
                                 "VALID")


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC → N11C (reference AdaptiveAvgPool2d(1))."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def _upsample2_1d(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact ×2 bilinear upsample along one spatial axis, align_corners=False.

    torch half-pixel sampling at exactly ×2 reduces to a fixed 2-tap
    stencil: out[2i] = 0.25·x[i−1] + 0.75·x[i], out[2i+1] = 0.75·x[i] +
    0.25·x[i+1] (edge-clamped) — O(HWC) on the VPU instead of the dense
    (out×in) interpolation matmul (O(H²WC): the top decoder level of a
    256×512 UNet spends ~2.7 GF on the matrix form, ~25 MF on this).
    """
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xe = jnp.pad(x, pad, mode="edge")
    n = x.shape[axis]
    xm1 = jax.lax.slice_in_dim(xe, 0, n, axis=axis)
    xp1 = jax.lax.slice_in_dim(xe, 2, n + 2, axis=axis)
    even = 0.25 * xm1 + 0.75 * x
    odd = 0.75 * x + 0.25 * xp1
    inter = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return inter.reshape(shape).astype(x.dtype)


def upsample_bilinear(x: jnp.ndarray, scale: int = 2,
                      align_corners: bool = False) -> jnp.ndarray:
    """Bilinear ×scale upsample matching torch Upsample(mode='bilinear')."""
    n, h, w, c = x.shape
    if scale == 2 and not align_corners:
        return _upsample2_1d(_upsample2_1d(x, 1), 2)
    out_h, out_w = h * scale, w * scale
    return resize_bilinear(x, (out_h, out_w), align_corners)


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool
                   ) -> np.ndarray:
    """1-D linear interpolation as an (out, in) dense matrix.

    TPU note: gather-based resize lowers to slow generic gathers; a dense
    interpolation matrix turns the resize into two small matmuls that ride
    the MXU (the matrix is tiny: out×in for one axis). Weights match torch
    F.interpolate(mode='bilinear') for both align_corners settings.
    """
    m = np.zeros((out_size, in_size), np.float32)
    if align_corners and out_size > 1:
        pos = np.linspace(0.0, in_size - 1.0, out_size)
    else:
        pos = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    pos = np.clip(pos, 0, in_size - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = pos - lo
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    wh = jnp.asarray(_resize_matrix(h, out_h, align_corners), x.dtype)
    ww = jnp.asarray(_resize_matrix(w, out_w, align_corners), x.dtype)
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    out = jnp.einsum("oh,nhwc->nowc", wh, x,
                     preferred_element_type=acc_t)
    out = jnp.einsum("pw,nowc->nopc", ww, out,
                     preferred_element_type=acc_t)
    return out.astype(x.dtype)


def pixel_shuffle(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """PixelShuffle for scale ≥1 (up) or <1 (down) — reference
    model_utils.py:202-228, NHWC formulation.

    scale ≥ 1: (N,H,W,C) → (N, H*s, W*s, C/s²)
    scale < 1: (N,H,W,C) → (N, H*s, W*s, C/s²) with s<1, i.e. space→depth.

    Channel ordering matches the torch reference so converted weights are
    bit-compatible: torch up-shuffle views C as (C_out, s, s) and interleaves
    (h, s_h, w, s_w); down-shuffle packs blocks as (b_h, b_w, C).
    """
    n, h, w, c = x.shape
    if scale >= 1:
        s = int(scale)
        oc = c // (s * s)
        # torch NCHW: view (N, oc, s, s, H, W) → permute (N, oc, H, s, W, s)
        # NHWC equivalent: channels are laid out as (oc, s, s)
        xv = x.reshape(n, h, w, oc, s, s)
        xv = xv.transpose(0, 1, 4, 2, 5, 3)  # N, H, s_h, W, s_w, oc
        return xv.reshape(n, h * s, w * s, oc)
    else:
        b = int(round(1.0 / scale))
        oh, ow = h // b, w // b
        # torch down: view (N, C, oh, b, ow, b) → permute (N, C, b, b, oh, ow)
        # → out channels laid out as (C, b_h, b_w) in NCHW → NHWC channels
        # ordering (c, b_h, b_w)
        xv = x.reshape(n, oh, b, ow, b, c)
        xv = xv.transpose(0, 1, 3, 5, 2, 4)  # N, oh, ow, C, b_h, b_w
        return xv.reshape(n, oh, ow, c * b * b)


def sub_mean(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Subtract per-image per-channel spatial mean (model_utils.py:11-15)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    return x - mean, mean


def pad_to_multiple(x: jnp.ndarray, multiple: int = 128) -> Tuple[jnp.ndarray, Tuple[int, int, int, int]]:
    """Reflect-pad H,W up to the next multiple (model_utils.py:17-28).

    Returns (padded, (left, right, top, bottom)) — crop with
    :func:`unpad`. Pad amounts are python ints (shapes are static under jit).
    """
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    l, r = pw // 2, pw - pw // 2
    t, b = ph // 2, ph - ph // 2
    if ph == 0 and pw == 0:
        return x, (0, 0, 0, 0)
    return reflect_pad(x, (l, r, t, b)), (l, r, t, b)


def unpad(x: jnp.ndarray, pads: Tuple[int, int, int, int]) -> jnp.ndarray:
    l, r, t, b = pads
    h, w = x.shape[1], x.shape[2]
    return x[:, t:h - b if b else h, l:w - r if r else w, :]


# ---------------------------------------------------------------------------
# Norm layers
# ---------------------------------------------------------------------------

def batch_norm_init(ch: int) -> Params:
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,)),
            "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}


def batch_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Frozen (eval-mode) batch norm using stored running stats.

    VoxelFlow permanently freezes its BN (voxel_flow.py:283-284,352-355), so
    the functional form is a fixed affine transform. ``mean``/``var`` live in
    the params tree but are excluded from inner-loop adaptation by the
    trainable-mask machinery (meta/episode.py) unless
    ``enable_inner_loop_optimizable_bn_params`` is set.
    """
    inv = jax.lax.rsqrt(p["var"].astype(x.dtype) + eps)
    return (x - p["mean"].astype(x.dtype)) * inv * p["scale"].astype(x.dtype) \
        + p["bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Per-step meta batch norm (reference MetaBatchNormLayer,
# model_utils.py:419-535)
# ---------------------------------------------------------------------------

def meta_batch_norm_init(ch: int, num_steps: int,
                         per_step: bool = True) -> Params:
    """Params of the reference MetaBatchNormLayer with
    ``use_per_step_bn_statistics``: per-inner-step running stats AND
    per-step affine (weight ones / bias zeros), shapes (num_steps, C)
    (model_utils.py:453-461). ``per_step=False`` gives the flat variant
    (:463-469 — note the reference inits running_var to ZEROS there, a
    quirk we reproduce)."""
    if per_step:
        return {"weight": jnp.ones((num_steps, ch)),
                "bias": jnp.zeros((num_steps, ch)),
                "running_mean": jnp.zeros((num_steps, ch)),
                "running_var": jnp.ones((num_steps, ch))}
    return {"weight": jnp.ones((ch,)), "bias": jnp.zeros((ch,)),
            "running_mean": jnp.zeros((ch,)),
            "running_var": jnp.zeros((ch,))}


def meta_batch_norm_apply(p: Params, x: jnp.ndarray, num_step: int = 1,
                          adapted: Optional[Params] = None,
                          momentum: float = 0.1, eps: float = 1e-5,
                          per_step: bool = True):
    """Functional MetaBatchNormLayer.forward (model_utils.py:482-525).

    The reference always calls ``F.batch_norm(..., training=True)``
    (:519-521): normalization uses the BATCH statistics, and the
    per-step running stats are updated in place with ``momentum`` (torch
    updates running_var with the UNBIASED batch variance). Functionally:
    returns ``(out, new_stats)`` where new_stats carries the updated
    running_mean/var rows — the caller decides whether to persist them
    (training) or drop them (eval; the reference's
    backup/restore_backup_stats pair, :515-517, :528-533).

    ``adapted``: optional {'weight','bias'} from the inner-loop weight
    dict — when given they override the per-step affine rows, matching
    ``params is not None`` in the reference (:484-489).
    """
    if adapted is not None:
        weight, bias = adapted["weight"], adapted["bias"]
    elif per_step:
        weight, bias = p["weight"][num_step], p["bias"][num_step]
    else:
        weight, bias = p["weight"], p["bias"]

    axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    mean = jnp.mean(x, axes)
    var = jnp.mean((x - mean) ** 2, axes)  # biased — normalization path
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * inv * weight + bias

    var_unbiased = var * (n / max(n - 1, 1))
    new_stats = dict(p)
    if per_step:
        new_stats["running_mean"] = p["running_mean"].at[num_step].set(
            (1 - momentum) * p["running_mean"][num_step] + momentum * mean)
        new_stats["running_var"] = p["running_var"].at[num_step].set(
            (1 - momentum) * p["running_var"][num_step]
            + momentum * var_unbiased)
    else:
        new_stats["running_mean"] = ((1 - momentum) * p["running_mean"]
                                     + momentum * mean)
        new_stats["running_var"] = ((1 - momentum) * p["running_var"]
                                    + momentum * var_unbiased)
    return out, new_stats
