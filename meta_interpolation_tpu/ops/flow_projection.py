"""Flow projection — scatter-average of negated flow, optionally
depth-weighted, with directional hole filling.

Reference kernels:
  * ``flowprojection_cuda_kernel.cu:28-135`` — each source pixel (y,x) with
    flow (fx,fy) lands at (x+fx, y+fy); if in-bounds, −fx/−fy are
    atomicAdd-ed into the 4 integer neighbors (clamped) together with a
    count; a second pass divides by count where count>0.
  * depth-weighted variant (``depthflowprojection_cuda_kernel.cu:40-110``):
    contributions and counts scaled by the inverse-depth weight
    (DepthFlowProjectionLayer).
  * ``FlowFillhole_kernelfunc`` (:141-235, eval-only): for hole pixels
    (count==0), average the flow of the nearest valid pixel in each of the
    four axis directions.

TPU formulation: ``jnp.ndarray.at[].add`` scatter-adds — XLA makes these
deterministic and race-free (the reference needs CUDA atomics), and
autodiff through scatter-add gives exactly the reference's backward
(gather of grad_output at the 4 neighbors, scaled by the weight).
Hole filling uses nearest-valid-index propagation via cumulative max —
O(H+W) scans instead of the reference's per-pixel while loops.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def flow_projection(flow: jnp.ndarray,
                    depth_inv: Optional[jnp.ndarray] = None,
                    fill_hole: bool = False,
                    proj_range: Optional[int] = None) -> jnp.ndarray:
    """Project flow t→0 onto the target grid.

    flow: (N, H, W, 2) channel-last (fx, fy); depth_inv: (N, H, W, 1)
    optional inverse-depth weights. Returns (N, H, W, 2).

    ``proj_range``: optional pixel bound enabling the TPU fast path
    (ops/flow_projection_pallas.py) — XLA lowers the scatter-adds below to
    serialized per-element updates (~10 ms per 256×448 projection); the
    bounded kernel sweeps the (2R+2)² source window with static shifts
    instead. Exact for |flow| ≤ R; None = exact scatter (default, used by
    all parity tests). The fast path's backward falls back to the scatter
    formulation's VJP.
    """
    n, h, w, _ = flow.shape
    if proj_range is not None and jax.default_backend() == "tpu" \
            and h % 8 == 0:
        out = _flow_projection_fast(flow, depth_inv, fill_hole, proj_range)
        return out
    fx = flow[..., 0]
    fy = flow[..., 1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x2 = xs + fx
    y2 = ys + fy
    valid = ((x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1))

    ix_l = jnp.clip(jnp.floor(x2).astype(jnp.int32), 0, w - 1)
    iy_t = jnp.clip(jnp.floor(y2).astype(jnp.int32), 0, h - 1)
    ix_r = jnp.minimum(ix_l + 1, w - 1)
    iy_b = jnp.minimum(iy_t + 1, h - 1)

    weight = depth_inv[..., 0] if depth_inv is not None else jnp.ones_like(fx)
    wv = jnp.where(valid, weight, 0.0)

    acc = jnp.zeros((n, h, w, 2), flow.dtype)
    cnt = jnp.zeros((n, h, w), flow.dtype)
    contrib = jnp.stack([-fx * wv, -fy * wv], axis=-1)

    b_idx = jnp.arange(n)[:, None, None] * jnp.ones((1, h, w), jnp.int32)
    for iy, ix in ((iy_t, ix_l), (iy_t, ix_r), (iy_b, ix_l), (iy_b, ix_r)):
        acc = acc.at[b_idx, iy, ix].add(contrib)
        cnt = cnt.at[b_idx, iy, ix].add(wv)

    out = jnp.where(cnt[..., None] > 0, acc / jnp.maximum(cnt[..., None], 1e-12),
                    acc)
    if fill_hole:
        out = _fill_holes_no_grad(out, cnt)
    return out


def min_depth_flow_projection(flow: jnp.ndarray, depth_inv: jnp.ndarray,
                              fill_hole: bool = False) -> jnp.ndarray:
    """Z-buffer flow projection variant (``mindepthflowprojection_cuda_
    kernel.cu:29-115``): each target cell keeps the −flow of the source with
    the *largest* inverse-depth weight (nearest surface wins) instead of
    averaging. The reference writes only the top-left neighbor (the other
    three are commented out, :93-108) — preserved.

    The CUDA version's non-atomic read-modify-write races on ties; here the
    winner is the max-weight source per cell (ties share the average of the
    tied flows) — deterministic, same intent.
    """
    n, h, w, _ = flow.shape
    fx, fy = flow[..., 0], flow[..., 1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x2, y2 = xs + fx, ys + fy
    valid = ((x2 >= 0) & (y2 >= 0) & (x2 <= w - 1) & (y2 <= h - 1))
    ix = jnp.clip(jnp.floor(x2).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.floor(y2).astype(jnp.int32), 0, h - 1)
    wv = jnp.where(valid, depth_inv[..., 0], 0.0)

    b_idx = jnp.arange(n)[:, None, None] * jnp.ones((1, h, w), jnp.int32)
    cell_max = jnp.zeros((n, h, w), flow.dtype).at[b_idx, iy, ix].max(wv)
    winner = valid & (wv >= cell_max[b_idx, iy, ix]) & (wv > 0)

    contrib = jnp.stack([-fx, -fy], axis=-1) * winner[..., None]
    acc = jnp.zeros((n, h, w, 2), flow.dtype).at[b_idx, iy, ix].add(contrib)
    n_win = jnp.zeros((n, h, w), flow.dtype).at[b_idx, iy, ix].add(
        winner.astype(flow.dtype))
    out = jnp.where(n_win[..., None] > 0, acc / jnp.maximum(
        n_win[..., None], 1.0), 0.0)
    if fill_hole:
        out = _fill_holes_no_grad(out, n_win)
    return out


def _nearest_valid_idx(valid: jnp.ndarray, axis: int, reverse: bool):
    """Index of the nearest valid element at-or-before each position along
    ``axis`` (cummax of masked indices); -1 where none."""
    size = valid.shape[axis]
    shape = [1] * valid.ndim
    shape[axis] = size
    idx = jnp.arange(size, dtype=jnp.int32).reshape(shape)
    idx = jnp.broadcast_to(idx, valid.shape)
    masked = jnp.where(valid, idx, -1)
    if reverse:
        masked = jnp.flip(masked, axis)
        out = jax.lax.cummax(masked, axis=axis)
        return jnp.flip(out, axis)
    return jax.lax.cummax(masked, axis=axis)


def _fill_holes_no_grad(out: jnp.ndarray, cnt: jnp.ndarray) -> jnp.ndarray:
    """Forward: hole-filled; backward: as if unfilled. The reference
    backward kernels ignore fillhole entirely (ctx.fillhole is unused,
    DepthFlowProjectionLayer.py:66) — its gradients are those of the
    plain scatter-average — so the fill contribution is wrapped in
    stop_gradient to reproduce that exactly."""
    return out + jax.lax.stop_gradient(_fill_holes(out, cnt) - out)


# default fill implementation (measured choice — scripts/fill_micro.py)
def _fill_holes(out: jnp.ndarray, cnt: jnp.ndarray) -> jnp.ndarray:
    return _fill_holes_scan(out, cnt)


def _propagate_last_valid(vals, valid, axis, reverse):
    """Value of the nearest valid element at-or-before each position along
    ``axis`` (after ``reverse``: at-or-after), plus whether one exists —
    one associative_scan carrying (value, valid), no gathers."""
    def op(a, b):
        av, am = a
        bv, bm = b
        return (jnp.where(bm, bv, av), am | bm)

    return jax.lax.associative_scan(op, (vals, valid), axis=axis,
                                    reverse=reverse)


def _fill_holes_scan(out: jnp.ndarray, cnt: jnp.ndarray) -> jnp.ndarray:
    """Directional nearest-valid averaging via four value-propagating
    associative scans. Bit-identical to ``_fill_holes_gather`` (pinned by
    test) without its four full-image gathers — the gathers cost per-ROW
    on TPU and dominated the fill at DAIN shapes (scripts/fill_micro.py)."""
    valid = (cnt > 0)[..., None]
    vb = jnp.broadcast_to(valid, out.shape)
    v_l, m_l = _propagate_last_valid(out, vb, 2, False)
    v_r, m_r = _propagate_last_valid(out, vb, 2, True)
    v_u, m_u = _propagate_last_valid(out, vb, 1, False)
    v_d, m_d = _propagate_last_valid(out, vb, 1, True)
    ml = m_l.astype(out.dtype)
    mr = m_r.astype(out.dtype)
    mu = m_u.astype(out.dtype)
    md = m_d.astype(out.dtype)
    total = ml + mr + mu + md
    filled = (v_l * ml + v_r * mr + v_u * mu + v_d * md) / jnp.maximum(
        total, 1.0)
    hole = (~valid) & (total > 0)
    return jnp.where(hole, filled, out)


def _fill_holes_gather(out: jnp.ndarray, cnt: jnp.ndarray) -> jnp.ndarray:
    """Directional nearest-valid averaging (FlowFillhole_kernelfunc)."""
    n, h, w, _ = out.shape
    valid = cnt > 0

    left = _nearest_valid_idx(valid, axis=2, reverse=False)
    right_rev = jnp.flip(_nearest_valid_idx(jnp.flip(valid, 2), 2, False), 2)
    right = jnp.where(right_rev >= 0, w - 1 - right_rev, -1)
    up = _nearest_valid_idx(valid, axis=1, reverse=False)
    down_rev = jnp.flip(_nearest_valid_idx(jnp.flip(valid, 1), 1, False), 1)
    down = jnp.where(down_rev >= 0, h - 1 - down_rev, -1)

    b_idx = jnp.arange(n)[:, None, None] * jnp.ones((1, h, w), jnp.int32)
    row_idx = jnp.arange(h, dtype=jnp.int32)[None, :, None] * jnp.ones(
        (1, 1, w), jnp.int32)
    col_idx = jnp.arange(w, dtype=jnp.int32)[None, None, :] * jnp.ones(
        (1, h, 1), jnp.int32)

    def gather_dir(iy, ix, found):
        vals = out[b_idx, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
        mask = (found >= 0).astype(out.dtype)[..., None]
        return vals * mask, mask

    v_l, m_l = gather_dir(row_idx, left, left)
    v_r, m_r = gather_dir(row_idx, right, right)
    v_u, m_u = gather_dir(up, col_idx, up)
    v_d, m_d = gather_dir(down, col_idx, down)

    total_m = m_l + m_r + m_u + m_d
    filled = (v_l + v_r + v_u + v_d) / jnp.maximum(total_m, 1.0)
    hole = (~valid)[..., None] & (total_m > 0)
    return jnp.where(hole, filled, out)


# ---------------------------------------------------------------------------
# bounded TPU fast path (custom VJP: pallas forward, scatter backward)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _flow_projection_fast(flow, depth_inv, fill_hole, proj_range):
    return _flow_projection_fast_fwd_impl(flow, depth_inv, fill_hole,
                                          proj_range)


def _flow_projection_fast_fwd_impl(flow, depth_inv, fill_hole, proj_range):
    from .flow_projection_pallas import flow_projection_bounded
    out, cnt = flow_projection_bounded(flow, depth_inv,
                                       max_displacement=proj_range)
    if fill_hole:
        out = _fill_holes_no_grad(out, cnt)
    return out


def _flow_projection_fast_fwd(flow, depth_inv, fill_hole, proj_range):
    return (_flow_projection_fast_fwd_impl(flow, depth_inv, fill_hole,
                                           proj_range), (flow, depth_inv))


def _flow_projection_fast_bwd(fill_hole, proj_range, res, g):
    flow, depth_inv = res
    if depth_inv is None:
        _, vjp = jax.vjp(
            lambda f: flow_projection(f, None, fill_hole), flow)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda f, d: flow_projection(f, d, fill_hole), flow, depth_inv)
    return vjp(g)


_flow_projection_fast.defvjp(_flow_projection_fast_fwd,
                             _flow_projection_fast_bwd)
