"""DAIN composed forward — depth-aware frame interpolation.

Reference: ``/root/reference/dain/networks/DAIN.py:423-846`` (MetaDAIN).
Pipeline (timestep 0.5):

  1. pad both frames to ×64 reflect (:517-535);
  2. depth: HourGlass log-depth for both frames (:557-559); context:
     S2DF_3dense features concat log-depth (stop-gradient on depth,
     :561-566); filters: MonoNet5 trunk + two branches → two 16-ch 4×4
     adaptive filter maps (:567-569);
  3. flow: PWCNet on (f0,f2) and (f2,f0), scaled by div_flow=20 × timestep
     and bilinearly ×4-upsampled (:647-659);
  4. depth-weighted flow projection of both flows (inverse depth
     1e-6 + 1/exp(log_depth), :572, :585-587 → ops/flow_projection.py);
  5. filter interpolation of frames and contexts at the projected flows
     (:593-596 → ops/filter_interpolation.py); average of both warped
     frames = coarse output;
  6. rectify: MultipleBasicBlock_4 on the 437-ch stack of [coarse, warped0,
     warped2, flows, filters, contexts] adds a residual (:598-608) — the
     only component that receives adapted params in the inner loop.

Training loss: the reference returns charbonnier part_loss on the rectified
output directly (:625-640, dain/loss_function.py:62-84); the episode engine
consumes it via ``returns_loss`` (losses['total'] = charbonnier).

The reference's dual CUDA streams (:556-583) are degenerate (both the
current stream) — under XLA the whole graph is one program and the
scheduler overlaps the depth/context/filter path with the flow path
automatically.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import layers
from ..layers import Params
from ...ops.filter_interpolation import filter_interpolation
from ...ops.flow_projection import flow_projection
from . import hourglass, mononet, pwcnet, rectify, s2df

DIV_FLOW = 20.0
TIMESTEP = 0.5
CTX_CH = s2df.CTX_CHANNELS  # 195
# coarse(3) + ref0(3) + ref2(3) + off0(2) + off2(2) + filt0(16) + filt2(16)
# + 2 × (ctx 195 + log_depth 1) = 437 (the reference counts the same total
# as 3+3+3+2*1+2*2+16*2+2*195 at DAIN.py:449)
RECTIFY_IN = 9 + 4 + 32 + 2 * (CTX_CH + 1)


def init(rng: jax.Array, **_kw) -> Params:
    r_d, r_c, r_m, r_p, r_r = jax.random.split(rng, 5)
    return {
        "depthNet": hourglass.init(r_d),
        "ctxNet": s2df.init(r_c),
        **mononet.init(r_m),
        "flownets": pwcnet.init(r_p),
        "rectifyNet": rectify.init(r_r, in_channels=437),
    }


def inner_mask(params: Params) -> Params:
    """Only rectifyNet adapts in the inner loop (reference
    meta_learning_system.py:96-101)."""
    def mk(name, sub):
        val = 1.0 if name == "rectifyNet" else 0.0
        return jax.tree.map(lambda x: jnp.full((), val, jnp.float32), sub)

    return {name: mk(name, sub) for name, sub in params.items()}


def outer_mask(params: Params) -> Params:
    """requires_grad=False on everything but rectifyNet — outer loop too."""
    def mk(name, sub):
        val = name == "rectifyNet"
        return jax.tree.map(lambda x: val, sub)

    return {name: mk(name, sub) for name, sub in params.items()}


def _flow_branch(params, im1, im2, time_offset):
    """forward_flownets (:647-659): quarter-res PWC flow × div_flow ×
    time_offset, bilinear ×4 upsample (align_corners=False)."""
    flow = pwcnet.apply(params["flownets"], im1, im2)
    flow = DIV_FLOW * flow * time_offset
    n, h, w, c = flow.shape
    return layers.resize_bilinear(flow, (h * 4, w * 4), align_corners=False)


def apply(params: Params, frame0: jnp.ndarray, frame1: jnp.ndarray,
          proj_range=None, fill_holes: bool = False, **_kw) -> jnp.ndarray:
    """Interpolate the midpoint of (frame0, frame1); NHWC [0,1].

    ``proj_range``: optional pixel bound enabling the bounded TPU
    flow-projection kernel (exact for |t·DIV_FLOW·flow| ≤ R; the scatter
    path measured ~10 ms per 256×448 projection, the bounded kernel
    ~0.3 ms). None = exact scatter (default; parity tests use it).

    ``fill_holes``: directional hole filling in the flow projections —
    the reference enables it exactly when the FLOW tensor does not
    require grad (DepthFlowProjectionLayer.py:42 ``fillhole = 1 if
    requires_grad == False``; DAIN.py:745 keys on input.requires_grad).
    Under the meta system every flow-producing subnet is frozen
    (meta_learning_system.py:96-101), so the flow never requires grad
    and the reference fills holes on EVERY meta forward — adaptation
    included (its backward ignores the fill, reproduced by
    ops/flow_projection._fill_holes_no_grad); the episode engine passes
    fill_holes=True through ModelDef.meta_apply_kwargs. The standalone
    default (False) matches a freshly constructed torch MetaDAIN whose
    flow requires grad — the parity-oracle configuration."""
    x0, pads = layers.pad_to_multiple(frame0, 64)
    x2, _ = layers.pad_to_multiple(frame1, 64)

    # depth + context + filters (stream s1 in the reference)
    both = jnp.concatenate([x0, x2], axis=0)
    log_depth = hourglass.apply(params["depthNet"], both)
    n = x0.shape[0]
    ld0, ld2 = log_depth[:n], log_depth[n:]
    ctx0 = jnp.concatenate([s2df.apply(params["ctxNet"], x0),
                            jax.lax.stop_gradient(ld0)], axis=-1)
    ctx2 = jnp.concatenate([s2df.apply(params["ctxNet"], x2),
                            jax.lax.stop_gradient(ld2)], axis=-1)
    filt0, filt2 = mononet.apply(params, jnp.concatenate([x0, x2], axis=-1))

    # inverse depth 1e-6 + 1/exp(log_depth) (:572). The clamp guards exp
    # overflow with untrained weights (NaN in projection otherwise);
    # pretrained log-depth magnitudes are ≪ the 1e8 ceiling, so released
    # weights are unaffected.
    depth_inv0 = jnp.clip(1e-6 + jnp.exp(-ld0), 0.0, 1e8)
    depth_inv2 = jnp.clip(1e-6 + jnp.exp(-ld2), 0.0, 1e8)

    # bidirectional flow (stream s2)
    flow_02 = _flow_branch(params, x0, x2, TIMESTEP)
    flow_20 = _flow_branch(params, x2, x0, TIMESTEP)

    # depth-weighted projection t→0 / t→1
    off0 = flow_projection(flow_02, depth_inv0, fill_hole=fill_holes,
                           proj_range=proj_range)
    off2 = flow_projection(flow_20, depth_inv2, fill_hole=fill_holes,
                           proj_range=proj_range)

    # filter interpolation of contexts (detached offsets/filters, :756-757)
    ctx0_w = filter_interpolation(ctx0, jax.lax.stop_gradient(off0),
                                  jax.lax.stop_gradient(filt0))
    ctx2_w = filter_interpolation(ctx2, jax.lax.stop_gradient(off2),
                                  jax.lax.stop_gradient(filt2))
    # ... and of the frames (:766-769)
    ref0 = filter_interpolation(x0, off0, filt0)
    ref2 = filter_interpolation(x2, off2, filt2)
    coarse = ref0 / 2.0 + ref2 / 2.0

    rect_in = jnp.concatenate([coarse, ref0, ref2, off0, off2,
                               filt0, filt2, ctx0_w, ctx2_w], axis=-1)
    out = rectify.apply(params["rectifyNet"], rect_in) + coarse

    return layers.unpad(out, pads)


def charbonnier_loss(pred, target, epsilon=1e-8):
    """DAIN training charbonnier (dain/loss_function.py:14-24, eps 1e-8 at
    DAIN.py:638)."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + epsilon))
