"""CAIN — Channel Attention Is All You Need for VFI (the flagship backbone).

Reference: ``/root/reference/cain/model.py:10-118`` +
``/root/reference/model_utils.py:931-1053``.

Architecture (depth=3): PixelShuffle ×1/8 space→depth on both frames (3→192
channels), concat → headConv 3×3 → 5 residual groups × 12 RCAB channel-
attention blocks (reflect-pad 3×3 convs, LeakyReLU(0.2), CA reduction 16) →
tailConv 3×3 → PixelShuffle ×8 depth→space. Global mean-shift trick:
subtract per-frame spatial mean, add back the average of both means
(cain/model.py:70-94). Inputs padded to a ×128 grid with reflection
(model_utils.py:17-28).

TPU notes: everything is 3×3 convs over a (H/8, W/8, 192) tensor — XLA maps
these straight onto the MXU; at 448×256 input the working set after shuffling
is 56×32×192, small enough that the whole body stays fused in VMEM-friendly
tiles. bfloat16-safe.

Param tree mirrors the torch state_dict
(``encoder.interpolate.body.{g}.body.{b}...``) so checkpoint conversion is a
rename (core/checkpoint.py).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import layers
from .layers import Params


def _xavier_conv(rng, in_ch, out_ch, k):
    """xavier_uniform weight + zero bias (reference MetaConv2dLayer:329-333)."""
    fan_in = in_ch * k * k
    fan_out = out_ch * k * k
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    kernel = jax.random.uniform(rng, (k, k, in_ch, out_ch), minval=-bound,
                                maxval=bound)
    return {"kernel": kernel, "bias": jnp.zeros((out_ch,))}


def _init_ca_layer(rng, ch: int, reduction: int) -> Params:
    r1, r2 = jax.random.split(rng)
    return {"conv_du": {
        "0": _xavier_conv(r1, ch, ch // reduction, 1),
        "2": _xavier_conv(r2, ch // reduction, ch, 1),
    }}


def _init_conv_norm(rng, in_ch, out_ch, k) -> Params:
    return {"conv": _xavier_conv(rng, in_ch, out_ch, k)}


def _init_rcab(rng, ch: int, reduction: int) -> Params:
    r0, r2, r3 = jax.random.split(rng, 3)
    # body indices follow MetaSequential(ConvNorm, act, ConvNorm, CALayer)
    return {"body": {
        "0": _init_conv_norm(r0, ch, ch, 3),
        "2": _init_conv_norm(r2, ch, ch, 3),
        "3": _init_ca_layer(r3, ch, reduction),
    }}


def _init_residual_group(rng, n_resblocks: int, ch: int, reduction: int) -> Params:
    rngs = jax.random.split(rng, n_resblocks + 1)
    body = {str(i): _init_rcab(rngs[i], ch, reduction) for i in range(n_resblocks)}
    body[str(n_resblocks)] = _init_conv_norm(rngs[-1], ch, ch, 3)
    return {"body": body}


def init(rng: jax.Array, depth: int = 3, n_resgroups: int = 5,
         n_resblocks: int = 12, reduction: int = 16, **_unused) -> Params:
    ch = 3 * (4 ** depth)
    if ch // reduction < 1:
        # a 0-channel CA conv builds silently and SIGFPEs XLA CPU later;
        # the torch reference fails the same way (weight [0, C, 1, 1])
        raise ValueError(
            f"channel attention reduction {reduction} exceeds {ch} channels "
            f"at depth={depth}; lower --depth or pass a smaller reduction")
    r_head, r_body, r_tail = jax.random.split(rng, 3)
    g_rngs = jax.random.split(r_body, n_resgroups)
    interpolate = {
        "headConv": _xavier_conv(r_head, ch * 2, ch, 3),
        "body": {str(g): _init_residual_group(g_rngs[g], n_resblocks, ch, reduction)
                 for g in range(n_resgroups)},
        "tailConv": _xavier_conv(r_tail, ch, ch, 3),
    }
    return {"encoder": {"interpolate": interpolate}}


def _conv_norm(p: Params, x, k: int = 3, fuse_pad=False):
    """Reflect-pad conv (reference MetaConvNorm, model_utils.py:821-848).

    ``fuse_pad``: each materialized reflect pad is an extra HBM round-trip
    XLA cannot fuse into the conv; the body has 122 of them. Two ways to
    avoid that traffic:

    - ``"reflect"``: SAME-math fast path — zero-``SAME`` conv (pad fused
      into XLA's conv) + analytic border corrections
      (layers.conv2d_reflect3x3). Identical to the reference's reflect
      pad up to fp summation order; safe wherever the padded form is.
    - ``True``: serving-mode approximation — plain zero ``SAME`` padding.
      The conv boundary context changes (same deviation class as
      ``pad_multiple=8``) — and because the CA layers pool globally, the
      border difference couples into EVERY pixel, so serving-vs-exact
      deviation is small-but-global on trained weights and unbounded on
      random init (measured: random-init serving-vs-exact PSNR ≈ 9 dB —
      meaningless as a quality signal). Always validate serving-mode
      PSNR on the trained checkpoint.
    """
    if fuse_pad == "reflect" and k == 3:
        return layers.conv2d_reflect3x3(p["conv"], x)
    if fuse_pad is True:
        return layers.conv2d(p["conv"], x, padding=k // 2)
    x = layers.reflect_pad(x, k // 2)
    return layers.conv2d(p["conv"], x, padding="VALID")


def _dense_1x1(p: Params, y):
    """1x1 conv on a [N,1,1,C] tensor == dense matmul.

    Numerically identical to conv2d but stays a plain (batched) matmul
    under jax.vmap — the conv batching rule folds the task axis into a
    grouped conv that XLA's SPMD partitioner mis-shards.
    """
    w = p["kernel"][0, 0].astype(y.dtype)  # mixed-precision: follow conv2d
    return jnp.einsum("nhwc,co->nhwo", y, w) + p["bias"].astype(y.dtype)


def _ca_layer(p: Params, x):
    y = layers.global_avg_pool(x)
    y = jax.nn.relu(_dense_1x1(p["conv_du"]["0"], y))
    y = jax.nn.sigmoid(_dense_1x1(p["conv_du"]["2"], y))
    return x * y


def _rcab(p: Params, x, slope: float = 0.2, fuse_pad: bool = False):
    out = _conv_norm(p["body"]["0"], x, fuse_pad=fuse_pad)
    out = layers.leaky_relu(out, slope)
    out = _conv_norm(p["body"]["2"], out, fuse_pad=fuse_pad)
    out = _ca_layer(p["body"]["3"], out)
    return out + x


def _stack_body(p: Params, n_resgroups: int, n_resblocks: int):
    """Stack the (identically-shaped) per-group params for lax.scan.

    Returns {"rcabs": leaves [G, B, ...], "tail": leaves [G, ...]}.
    """
    groups = [p["body"][str(g)] for g in range(n_resgroups)]
    rcab_stacks = [
        jax.tree.map(lambda *xs: jnp.stack(xs),
                     *[g["body"][str(i)] for i in range(n_resblocks)])
        for g in groups]
    rcabs = jax.tree.map(lambda *xs: jnp.stack(xs), *rcab_stacks)
    tails = jax.tree.map(lambda *xs: jnp.stack(xs),
                         *[g["body"][str(n_resblocks)] for g in groups])
    return {"rcabs": rcabs, "tail": tails}


def pack(params: Params, n_resgroups: int = 5, n_resblocks: int = 12) -> Params:
    """Pre-stack the body weights for serving.

    ``apply`` stacks the per-RCAB weights for its scan on every call (a
    per-call concat of ~80 MB of kernels). For inference loops where the
    params don't change, pack once and pass the result as ``packed_body``.
    """
    return _stack_body(params["encoder"]["interpolate"], n_resgroups,
                       n_resblocks)


def boundary_fuse(first_blocks: int = 1, all_groups: bool = False,
                  n_resgroups: int = 5, n_resblocks: int = 12):
    """Serving operating point: reflect-math only the first
    ``first_blocks`` RCABs of the first residual group — group index 0
    of ``n_resgroups``; all group numbering here is 0-based — (or of
    every group with ``all_groups=True``), zero-fuse the rest of the
    body.

    Rationale (measured, BASELINE.md round-4 pareto): the zero-fuse
    quality cost concentrates in the EARLIEST body convs — reflect on the
    first residual group alone recovers 0.95 of the 1.88 dB while whole
    extra reflect groups cost ~58 fps each (~2.3 fps per conv). RCAB
    granularity buys the first-layer border fidelity at single-digit fps
    cost, keeping the operating point above the 1000-fps line.
    """
    blockwise = (["reflect"] * first_blocks
                 + [True] * (n_resblocks + 1 - first_blocks))
    if all_groups:
        return [list(blockwise) for _ in range(n_resgroups)]
    return [blockwise] + [True] * (n_resgroups - 1)


def parse_fuse_spec(spec: str, n_resgroups: int = 5, n_resblocks: int = 12):
    """Parse a ``--fuse_groups`` token into a ``cain.apply`` fuse_pad value.

    The CLI surface for the serving graph menu (VERDICT r4 item 4 — the
    best measured operating points were script-level model-kwarg patches
    before):

      * ``exact``            -> ``False``  (materialized reflect pads,
        reference-exact; same as ``--fuse_pad false``)
      * ``zero``             -> ``True``   (zero-SAME fused body convs)
      * ``reflect``          -> ``"reflect"`` (border-corrected fused
        convs — exact math, fp-reassociated)
      * per-group letter string of length ``n_resgroups`` over
        ``R`` (reflect) / ``Z`` (zero-fuse) / ``X`` (exact), groups
        listed first-to-last (0-based index = string position):
        ``RZZZZ`` = reflect group 0, zero-fuse groups 1-4
      * ``bwJ`` (e.g. ``bw1``, ``bw2``) -> :func:`boundary_fuse` (J):
        reflect the first J RCABs of group 0, zero-fuse the rest
      * ``bwJxG`` with G == n_resgroups (e.g. ``bw1x5``) ->
        ``boundary_fuse(J, all_groups=True)``
    """
    import re

    low = spec.lower()
    if low in ("exact", "false"):
        return False
    if low in ("zero", "true"):
        return True
    if low == "reflect":
        return "reflect"
    m = re.fullmatch(r"bw(\d+)(?:x(\d+))?", low)
    if m:
        j = int(m.group(1))
        if not 1 <= j <= n_resblocks:
            raise ValueError(f"--fuse_groups {spec!r}: bwJ needs "
                             f"1 <= J <= {n_resblocks}")
        if m.group(2) is not None:
            if int(m.group(2)) != n_resgroups:
                raise ValueError(
                    f"--fuse_groups {spec!r}: bwJxG supports only "
                    f"G == n_resgroups ({n_resgroups})")
            return boundary_fuse(j, all_groups=True,
                                 n_resgroups=n_resgroups,
                                 n_resblocks=n_resblocks)
        return boundary_fuse(j, n_resgroups=n_resgroups,
                             n_resblocks=n_resblocks)
    letters = {"R": "reflect", "Z": True, "X": False}
    if all(c in letters for c in spec):
        if len(spec) != n_resgroups:
            raise ValueError(
                f"--fuse_groups {spec!r}: per-group letter strings need "
                f"exactly {n_resgroups} letters (one per residual group)")
        return [letters[c] for c in spec]
    raise ValueError(
        f"--fuse_groups {spec!r}: expected exact|zero|reflect, an R/Z/X "
        f"letter string of length {n_resgroups}, bwJ, or bwJx{n_resgroups}")


def _interpolation(p: Params, x0, x1, n_resgroups: int, n_resblocks: int,
                   packed_body=None, fuse_pad: bool = False):
    x = jnp.concatenate([x0, x1], axis=-1)
    x = layers.conv2d(p["headConv"], x, padding=1)

    # Body as a nested scan over stacked group/RCAB weights. Same math as
    # the unrolled loop (torch-parity suite pins it), but XLA compiles ONE
    # RCAB body instead of n_resgroups*n_resblocks copies: compile time
    # drops ~20x and the scheduler double-buffers the weight streams
    # (measured 25.1 -> 20.3 ms per batch-16 step at 448x256 on v5e).
    def make_group_body(mode):
        def rcab_body(z, rp):
            return _rcab(rp, z, fuse_pad=mode), None

        def group_body(z, gp):
            res, _ = jax.lax.scan(rcab_body, z, gp["rcabs"])
            res = _conv_norm(gp["tail"], res, fuse_pad=mode)
            return res + z, None

        return group_body

    def run_group_blockwise(z, gp, modes):
        # per-RCAB fuse modes inside one group: n_resblocks RCAB entries
        # + one tail-conv entry. Consecutive equal-mode RCABs share one
        # scan segment (the group-level trick one level down).
        assert len(modes) == n_resblocks + 1, (modes, n_resblocks)
        res = z
        b = 0
        while b < n_resblocks:
            c = b
            while c < n_resblocks and modes[c] == modes[b]:
                c += 1
            seg = jax.tree.map(lambda a: a[b:c], gp["rcabs"])

            def rcab_body(zz, rp, _m=modes[b]):
                return _rcab(rp, zz, fuse_pad=_m), None

            res, _ = jax.lax.scan(rcab_body, res, seg)
            b = c
        res = _conv_norm(gp["tail"], res, fuse_pad=modes[-1])
        return res + z

    stacked = (packed_body if packed_body is not None
               else _stack_body(p, n_resgroups, n_resblocks))
    if isinstance(fuse_pad, (list, tuple)):
        # per-group fuse modes (serving ablation): consecutive groups with
        # the same mode share one scan segment — same math as the scalar
        # form when all modes agree (pinned by test). An entry may itself
        # be a list of n_resblocks+1 per-RCAB modes (last = group tail
        # conv) for sub-group boundary-fuse ablations.
        assert len(fuse_pad) == n_resgroups, (fuse_pad, n_resgroups)
        res = x
        g = 0
        while g < n_resgroups:
            if isinstance(fuse_pad[g], (list, tuple)):
                gp = jax.tree.map(lambda a: a[g], stacked)
                res = run_group_blockwise(res, gp, fuse_pad[g])
                g += 1
                continue
            h = g
            while h < n_resgroups and \
                    not isinstance(fuse_pad[h], (list, tuple)) and \
                    fuse_pad[h] == fuse_pad[g]:
                h += 1
            seg = jax.tree.map(lambda a: a[g:h], stacked)
            res, _ = jax.lax.scan(make_group_body(fuse_pad[g]), res, seg)
            g = h
    else:
        res, _ = jax.lax.scan(make_group_body(fuse_pad), x, stacked)
    res = res + x
    return layers.conv2d(p["tailConv"], res, padding=1)


def apply(params: Params, frame0: jnp.ndarray, frame1: jnp.ndarray,
          depth: int = 3, n_resgroups: int = 5, n_resblocks: int = 12,
          pad_multiple: int = 128, packed_body=None, fuse_pad: bool = False,
          apron: int = 0, **_unused) -> jnp.ndarray:
    """CAIN forward. NHWC [0,1] frames → NHWC interpolated midpoint frame.

    Mirrors MetaCAIN.forward (cain/model.py:70-94): sub-mean → pad×128 →
    shuffle-down → interpolate → shuffle-up → unpad → add mean average.

    ``pad_multiple`` defaults to the reference's 128 (model_utils.py:17-28)
    for bit-parity; all eval/parity paths use it. The architecture itself
    only needs divisibility by 2**depth, so ``pad_multiple=2**depth`` is an
    opt-in serving mode — at 448x256 it removes all padding (-12.5% FLOPs,
    +11% fps). It changes the boundary context the convs see (reflections
    at the true image border instead of 32-64 px further out), so outputs
    differ from the reference near borders; validate PSNR on your trained
    checkpoint before serving with it. ``packed_body``: pre-stacked body
    weights from ``pack`` to skip per-call weight restacking in inference
    loops. ``fuse_pad``: serving-mode option replacing the body's 122
    reflect pads with zero padding fused into the convs (see _conv_norm);
    a list/tuple of ``n_resgroups`` modes applies per residual group
    (serving ablation); a group's entry may itself be a list of
    ``n_resblocks + 1`` per-RCAB modes (last entry = the group's tail
    conv) for sub-group boundary-fuse operating points. ``apron``: reflect-pad the input by this many
    pixels before the ``pad_multiple`` grid pad and crop after — a
    cheaper partial stand-in for the reference's wide x128 reflect canvas
    on the pad-8 path (at 448x256, apron=32 on W coincides width-wise with
    the x128 pad). Keep the apron a multiple of 2**depth at pad_multiple=8
    so the canvas stays shuffle-aligned.
    """
    x1, m1 = layers.sub_mean(frame0)
    x2, m2 = layers.sub_mean(frame1)
    if apron:
        a4 = (apron, apron, apron, apron)
        x1 = layers.reflect_pad(x1, a4)
        x2 = layers.reflect_pad(x2, a4)
    x1, pads = layers.pad_to_multiple(x1, pad_multiple)
    x2, _ = layers.pad_to_multiple(x2, pad_multiple)

    scale = 1.0 / (2 ** depth)
    f1 = layers.pixel_shuffle(x1, scale)
    f2 = layers.pixel_shuffle(x2, scale)
    feats = _interpolation(params["encoder"]["interpolate"], f1, f2,
                           n_resgroups, n_resblocks, packed_body=packed_body,
                           fuse_pad=fuse_pad)
    out = layers.pixel_shuffle(feats, float(2 ** depth))
    out = layers.unpad(out, pads)
    if apron:
        out = out[:, apron:-apron, apron:-apron, :]
    return out + (m1 + m2) / 2.0
