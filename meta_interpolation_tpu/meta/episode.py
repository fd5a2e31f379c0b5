"""Scene-adaptation episodes as jit-compiled ``lax.scan`` programs.

This is the TPU re-expression of the reference's python-loop MAML engine
(``/root/reference/meta_learning_system.py:346-472``):

  * HOT LOOP 1 (tasks, :366)        → ``jax.vmap`` over the task axis
  * HOT LOOP 2 (inner steps, :386)  → ``jax.lax.scan`` carrying
                                      ``(params, opt_state)``
  * HOT LOOP 3 (support pairs,:388) → unrolled (2 pairs, static)
  * inner update (:275-321)         → ``jax.grad`` + functional rule
                                      (meta/inner_optimizers.py); second order
                                      = differentiate through the scan,
                                      first order = stop_gradient on grads
  * MSL (:404-412)                  → per-step query losses collected as scan
                                      outputs, dotted with the importance
                                      vector
  * L2F attenuation (:231-272)      → layerwise-mean-grad embedding → 2-layer
                                      MLP → per-leaf gamma scaling of the init

One jit per (model, resolution, static-flag combo); the whole episode —
including every inner step and its gradient — compiles to a single XLA
program, so there are no host↔device round-trips inside an iteration.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import metrics as metrics_lib
from ..models import layers as L
from .inner_optimizers import InnerOptimizer

PyTree = Any


def per_step_loss_importance(num_steps: int, epoch: int,
                             msl_num_epochs: int) -> np.ndarray:
    """MSL importance vector (reference meta_learning_system.py:186-210).

    Host-side (numpy): depends only on epoch, passed into the jitted episode
    as a small array.
    """
    if num_steps == 0:
        return np.ones((1,), np.float32)
    w = np.ones((num_steps,), np.float32) / num_steps
    decay = 1.0 / num_steps / msl_num_epochs
    min_non_final = 0.03 / num_steps
    for i in range(num_steps - 1):
        w[i] = max(w[i] - epoch * decay, min_non_final)
    w[-1] = min(w[-1] + epoch * (num_steps - 1) * decay,
                1.0 - (num_steps - 1) * min_non_final)
    return w


def init_attenuator(rng: jax.Array, num_layers: int) -> PyTree:
    """L2F attenuator: Linear→ReLU→Linear→Sigmoid over layerwise mean grads
    plus a gamma multiplier initialized to zero so gamma starts at exactly 1
    (reference :106-117, :258-261)."""
    r1, r2 = jax.random.split(rng)
    return {
        "fc1": L.linear_init(r1, num_layers, num_layers),
        "fc2": L.linear_init(r2, num_layers, num_layers),
        "gamma_mult": jnp.zeros(()),
    }


def apply_attenuator(att: PyTree, emb: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(L.linear(att["fc1"], emb))
    g = jax.nn.sigmoid(L.linear(att["fc2"], h))
    return jnp.clip(1.0 - att["gamma_mult"] * g, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class EpisodeSpec:
    """Static configuration of an episode program."""
    support_idxs: Tuple[Tuple[int, int, int], ...] = ((0, 2, 4), (2, 4, 6))
    target_idxs: Tuple[int, int, int] = (2, 3, 4)
    num_steps: int = 1
    second_order: bool = False
    use_msl: bool = False
    attenuate: bool = False
    returns_aux: bool = False
    # collect the pre-update support predictions of every inner step
    # (aux['support_preds'], (B, steps, n_pairs, H, W, C)) — consumed by
    # the reference-cadence GAN discriminator updates (--disc_per_forward;
    # the reference updates D inside every criterion call, loss.py:168-213)
    collect_support_preds: bool = False
    # additionally collect the per-step MSL query predictions for steps
    # 0..n-2 (aux['query_preds'], (B, n-1, H, W, C); the last step's query
    # pred is aux['preds']) — while MSL is active the reference's per-step
    # QUERY criterion calls also update D (loss.py:168-213 via
    # meta_learning_system.py:404-412), so the --disc_per_forward replay
    # needs them to be cadence-exact under MSL
    collect_query_preds: bool = False
    # second-order inner-grad convs as pure tap-einsums (all derivative
    # orders vmap-native — no grouped convs in the double-backward).
    # OPT-IN: outer-grad equivalence is pinned by test, but at full CAIN
    # size the tap-slice residuals fragment HBM (measured OOM at bs4
    # crop 256 — 15.2 GB temp, 68 % fragmentation); the default plain-conv
    # second-order path measures 11.09 tasks/s (BASELINE.md)
    second_order_einsum: bool = False


# momentum of every per-step BN stat update (reference MetaBatchNormLayer
# hardcodes F.batch_norm(..., momentum=0.1), model_utils.py:519-521;
# layers.meta_batch_norm_apply default). fold_bn_states_sequential relies
# on this value — a model passing a custom momentum must not use the fold.
BN_MOMENTUM = 0.1


def bn_update_counts(spec: EpisodeSpec, rows: int) -> np.ndarray:
    """How many times one TRAINING task episode updates each per-step BN
    stat row (static — the episode control flow is fixed by the spec).

    Per step s, every support-pair forward updates row s
    (len(support_idxs) updates); while MSL is active each step 0..n-2
    additionally runs a per-step query forward (row s); the final query
    forward updates row max(n-1, 0). Mirrors the reference's
    F.batch_norm(training=True) call sites (meta_learning_system.py:
    388-412, 415/425) and adapt()/task_episode() above.
    """
    counts = np.zeros((rows,), np.int64)
    n = spec.num_steps
    if n == 0:
        counts[0] += 1  # only the final query forward (row clamped to 0)
        return counts
    counts[:n] += len(spec.support_idxs)
    if spec.use_msl and n >= 2:
        counts[:n - 1] += 1  # per-step MSL query forwards (steps 0..n-2)
    counts[n - 1] += 1  # post-adaptation query forward
    return counts


def fold_bn_states_sequential(s0: PyTree, per_task: PyTree,
                              spec: EpisodeSpec) -> PyTree:
    """Exact sequential-task composition of vmapped per-task BN states.

    The reference loops tasks sequentially within one iteration
    (meta_learning_system.py:366): each task's training-mode BN calls
    mutate the SHARED running stats, so task k starts from task k-1's
    final state. Our episodes run under vmap with every task starting
    from the same initial state ``s0``. Training-mode BN normalizes with
    BATCH statistics (model_utils.py:519-521), so the running stats are
    write-only — one episode's effect on a stat row is affine,
    ``r = a * s0 + b`` with ``a = (1 - momentum)^c`` (``c`` = the row's
    static update count) and ``b`` independent of ``s0``. The sequential
    composition over tasks 0..B-1 (in batch order) is then recovered in
    closed form from the vmapped results ``r_k``:

        S_final = a^B * s0 + sum_k a^(B-1-k) * (r_k - a * s0)

    Exact at any batch size (bit-level caveat: float re-association);
    pinned against a sequentially-mutated torch oracle at B=3 in
    tests/test_torch_parity_ext.py.
    """
    def fold(s0_leaf, r):
        b_tasks, rows = r.shape[0], s0_leaf.shape[0]
        a = jnp.asarray((1.0 - BN_MOMENTUM)
                        ** bn_update_counts(spec, rows), s0_leaf.dtype)
        a = a.reshape((rows,) + (1,) * (s0_leaf.ndim - 1))
        offs = r - a * s0_leaf  # (B, rows, ...): per-task b_k
        exps = jnp.arange(b_tasks - 1, -1, -1, dtype=s0_leaf.dtype)
        w = a[None] ** exps.reshape((b_tasks,) + (1,) * s0_leaf.ndim)
        return (a ** b_tasks) * s0_leaf + jnp.sum(w * offs, axis=0)

    return jax.tree.map(fold, s0, per_task)


class EpisodeBuilder:
    """Builds the per-task and batched episode functions for one model.

    ``apply_fn(params, f0, f1) -> pred`` (or ``(pred, aux)`` when
    ``returns_aux``), ``loss_fn(pred, target, aux) -> {..., 'total'}``.
    ``inner_mask``: optional 0/1 pytree like net params — leaves with 0 are
    frozen in the inner loop (DAIN adapts only its rectify net,
    reference :96-101).
    """

    def __init__(self, apply_fn: Callable, loss_fn: Callable,
                 inner_opt: InnerOptimizer,
                 denormalize: Callable = lambda x: x,
                 inner_mask: Optional[PyTree] = None,
                 uses_loss_ctx: bool = False,
                 outer_keep: Optional[PyTree] = None):
        self.apply_fn = apply_fn
        self.loss_fn = loss_fn
        self.inner_opt = inner_opt
        self.denormalize = denormalize
        self.inner_mask = inner_mask
        # bool pytree like net params: True where the leaf is trainable in
        # the OUTER loop. Under second order, inner-frozen leaves that are
        # outer-trainable must keep their tangents through the support grad
        # (the reference's create_graph=True retains the cross-term
        # d(live-param support grads)/d(frozen leaf)); only leaves frozen in
        # BOTH loops (DAIN frozen subtrees, fix_loaded) may be pruned.
        self.outer_keep = outer_keep
        # concrete keep/freeze booleans (inner_mask is built from the param
        # tree at setup, never traced) — used by _prune_frozen inside the
        # inner-grad lambda so autodiff prunes the frozen subtrees entirely
        # (the reference gets this for free: its weight dict only
        # *contains* trainable params, meta_learning_system.py:96-101 —
        # for DAIN that skips differentiating hourglass/PWC/ctx)
        self._inner_keep = (None if inner_mask is None else jax.tree.map(
            lambda m: bool(float(m)), inner_mask))
        # when True, meta_params['loss_ctx'] (e.g. GAN discriminator params)
        # is passed to loss_fn as the ctx kwarg — traced, never jit-stale
        self.uses_loss_ctx = uses_loss_ctx
        # when True, apply_fn receives num_step=<inner step index> — the
        # hook for per-step BN statistics / per-step affine params
        # (reference MetaBatchNormLayer num_step arg,
        # model_utils.py:482-511; layers.meta_batch_norm_apply). Query
        # forwards use the last step index, like the reference's
        # post-adaptation net_forward(num_step=num_steps-1).
        self.passes_num_step = False
        # when True, apply_fn is called as apply(params, f0, f1,
        # num_step=..., bn_state=...) and returns (pred, new_bn_state):
        # per-step BN running statistics (reference MetaBatchNormLayer
        # with use_per_step_bn_statistics, model_utils.py:453-461,
        # 504-521). The state threads SEQUENTIALLY through every forward
        # of a task (support pair A → B → [MSL query] → next step →
        # final query — the in-place mutation order of the reference's
        # F.batch_norm(training=True) calls) and the task's final state
        # is returned; the caller persists it (training) or drops it
        # (eval — the reference's per-task restore_backup_stats,
        # meta_learning_system.py:463-464). Stats never carry gradients.
        self.passes_bn_state = False
        # L2F: bool tree marking the leaves that form the attenuator's
        # grad embedding and receive gamma scaling (the reference's
        # names_weights_copy membership — requires_grad=True leaves).
        # None = all leaves.
        self.att_keep: Optional[PyTree] = None

    # -- loss plumbing -----------------------------------------------------
    def _pair_loss(self, params, f0, f1, target, loss_ctx=None, num_step=0,
                   bn_state=None):
        """One criterion call → (loss_total, pred, new_bn_state); the BN
        state slot is None unless ``passes_bn_state``."""
        kw = {"num_step": num_step} if self.passes_num_step else {}
        if self.passes_bn_state:
            kw["num_step"] = num_step
            kw["bn_state"] = bn_state
        out = self.apply_fn(params, f0[None], f1[None], **kw)
        bn_out = None
        if self.passes_bn_state:
            out, bn_out = out
        if isinstance(out, tuple):
            pred, aux = out
            aux = dict(aux)
            aux["I0"], aux["I1"] = f0[None], f1[None]
        else:
            pred, aux = out, None
        if self.uses_loss_ctx:
            losses = self.loss_fn(pred, target[None], aux, ctx=loss_ctx)
        else:
            losses = self.loss_fn(pred, target[None], aux)
        return losses["total"], pred[0], bn_out

    def _support_loss(self, params, frames, spec: EpisodeSpec, loss_ctx=None,
                      num_step=0, with_preds: bool = False, bn_state=None):
        total = 0.0
        preds = []
        bn = bn_state
        for (i0, it, i1) in spec.support_idxs:
            loss, pred, bn_out = self._pair_loss(params, frames[i0],
                                                 frames[i1], frames[it],
                                                 loss_ctx, num_step=num_step,
                                                 bn_state=bn)
            if self.passes_bn_state:
                # pair B's forward sees pair A's updated stats — the
                # reference's sequential in-place F.batch_norm updates
                bn = bn_out
            total = total + loss
            preds.append(pred)
        if with_preds:
            return total, (jnp.stack(preds), bn)
        return total

    def _masked(self, grads):
        if self.inner_mask is None:
            return grads
        return jax.tree.map(lambda g, m: g * m, grads, self.inner_mask)

    def _prune_frozen(self, params, second_order: bool = False):
        """stop_gradient the inner-frozen leaves — called INSIDE the
        differentiated support-loss lambda, where it makes those grads
        symbolic zeros and prunes their subtrees from the backward.

        First order: math-identical to _masked (those grads are zero either
        way). Second order: pruning an inner-frozen but OUTER-trainable leaf
        would drop the cross-term d(live-param support grads)/d(leaf) that
        the reference's create_graph=True backward retains — so only leaves
        frozen in both loops are pruned (or nothing, if no outer mask is
        known)."""
        if self._inner_keep is None:
            return params
        if second_order:
            if self.outer_keep is None:
                return params
            keep = jax.tree.map(lambda ik, ok: bool(ik) or bool(ok),
                                self._inner_keep, self.outer_keep)
        else:
            keep = self._inner_keep
        return jax.tree.map(
            lambda p, k: p if k else jax.lax.stop_gradient(p),
            params, keep)

    # -- L2F ---------------------------------------------------------------
    def _attenuate(self, net_params, attenuator, frames, spec: EpisodeSpec,
                   loss_ctx=None):
        """Scale the init per-leaf by gamma (reference :231-272).

        The reference's embedding and scaling operate on
        ``names_weights_copy`` — the requires_grad=True leaves only
        (``get_inner_loop_parameter_dict``; for DAIN that is rectifyNet,
        :96-101). ``att_keep`` (the model's outer/trainable mask, set by
        the system) restricts both here: frozen subtrees neither enter
        the grad embedding nor get gamma-scaled."""
        # always first-order (create_graph=False below): block tangents at
        # the inputs (net params AND loss_ctx), not just the grad output,
        # so the outer linearization never enters this gradient — required
        # for ops with non-differentiable custom-VJP backwards (pallas
        # sepconv); see one_step
        ctx_src = jax.tree.map(jax.lax.stop_gradient, loss_ctx)
        grad_src = jax.tree.map(jax.lax.stop_gradient, net_params)
        grads = jax.grad(lambda p: self._support_loss(
            self._prune_frozen(p), frames, spec, ctx_src))(grad_src)
        grads = jax.lax.stop_gradient(grads)  # create_graph=False (:246-247)
        keep = (jax.tree.leaves(self.att_keep)
                if self.att_keep is not None
                else [True] * len(jax.tree.leaves(grads)))
        leaves = jax.tree.leaves(grads)
        emb = jnp.stack([jnp.mean(g) for g, k in zip(leaves, keep) if k])
        gamma = apply_attenuator(attenuator, emb)
        flat, treedef = jax.tree.flatten(net_params)
        scaled = []
        i = 0
        for w, k in zip(flat, keep):
            scaled.append(w * gamma[i] if k else w)
            i += int(k)
        return jax.tree.unflatten(treedef, scaled)

    # -- single-task episode ----------------------------------------------
    def adapt(self, net_params: PyTree, lrs: PyTree, frames: jnp.ndarray,
              spec: EpisodeSpec, attenuator: Optional[PyTree] = None,
              collect_msl: bool = False, loss_ctx=None, bn_state=None):
        """Inner-loop adaptation on one task.

        frames: (T, H, W, C). Returns ``(adapted_params,
        per_step_query_losses, support_preds, query_preds)``: the losses
        array is only populated when ``collect_msl``; support_preds is the
        per-step stack of pre-update support-pair predictions when
        ``spec.collect_support_preds`` (else an empty placeholder — shape
        (1, 0) in the num_steps == 0 early return below); query_preds is
        the per-step MSL query predictions for steps 0..n-2 when
        ``spec.collect_query_preds`` (else a (1, 0) placeholder).
        When ``passes_bn_state``, a FIFTH element is appended: the task's
        final per-step BN running statistics (threaded sequentially
        through every forward, starting from ``bn_state``).
        """
        if spec.attenuate and attenuator is not None:
            net_params = self._attenuate(net_params, attenuator, frames, spec,
                                         loss_ctx)

        if spec.num_steps == 0:
            out0 = (net_params, jnp.zeros((0,)), jnp.zeros((1, 0)),
                    jnp.zeros((1, 0)))
            return out0 + ((bn_state,) if self.passes_bn_state else ())

        q0, qt, q1 = spec.target_idxs
        opt_state = self.inner_opt.init_state(net_params)

        def one_step(params, opt_state, bn, step_idx,
                     msl_query=collect_msl):
            # First order: block tangents at the *input* of the inner grad
            # (not just its output) so the outer linearization never enters
            # the gradient computation — required for ops whose custom-VJP
            # backward is itself non-differentiable (pallas sepconv), and
            # semantically identical to the reference's create_graph=False.
            grad_src = params if spec.second_order else jax.tree.map(
                jax.lax.stop_gradient, params)
            # loss_ctx (e.g. GAN discriminator params) is a *constant*
            # during adaptation — its update is a separate jitted step
            # (core/adversarial.py), never through the inner loop. Block
            # its tangents here too, else the outer linearization has to
            # differentiate through this gradient w.r.t. the ctx, which
            # ops with non-differentiable custom-VJP backwards (pallas
            # sepconv) cannot do.
            ctx_src = jax.tree.map(jax.lax.stop_gradient, loss_ctx)
            # First order: the fast conv's custom_vjp makes this inner grad
            # vmappable, so per-task support grads also run as tap einsums.
            # Second order must differentiate THROUGH this gradient, and
            # the fast conv's hand-written bwd is not itself differentiable
            # under vmap — fall back to plain convs.
            # _prune_frozen INSIDE the differentiated function: stop_gradient
            # applied to the *input* of jax.grad does not stop
            # differentiation w.r.t. it — inside, frozen leaves become
            # symbolic zeros and their subtrees' backward is pruned
            # (DAIN: hourglass/PWC/ctx never differentiated, mirroring the
            # reference whose weight dict only contains rectify params)
            # second order: optional "einsum" mode — a pure tap-einsum
            # conv whose every derivative order is einsums, so
            # differentiating THROUGH this gradient (the outer backward's
            # HVP, with per-task weight cotangents) batches natively
            # under the episode vmap instead of lowering to XLA grouped
            # convs. Opt-in (see EpisodeSpec.second_order_einsum).
            if spec.second_order:
                mode = "einsum" if spec.second_order_einsum else False
            else:
                mode = True
            # BN running stats are buffers: their updates never carry
            # gradients (the reference mutates nn.Parameters with
            # requires_grad=False) — block tangents at the input
            bn_src = (jax.tree.map(jax.lax.stop_gradient, bn)
                      if self.passes_bn_state else bn)
            with L.episode_fast_conv(mode):
                # support preds ride along as grad aux — the pre-update
                # predictions of this step's support forwards are exactly
                # the fakes the reference's criterion-internal D updates
                # see (loss.py:168-213), and returning them from the
                # differentiated forward reuses the residuals XLA keeps
                # for the backward instead of re-running every support
                # forward a second time
                grads, (sp, bn_out) = jax.grad(
                    lambda p: self._support_loss(
                        self._prune_frozen(p, spec.second_order),
                        frames, spec, ctx_src, num_step=step_idx,
                        with_preds=True, bn_state=bn_src),
                    has_aux=True)(grad_src)
            if self.passes_bn_state:
                bn = jax.tree.map(jax.lax.stop_gradient, bn_out)
            if not spec.second_order:
                grads = jax.lax.stop_gradient(grads)
            if spec.collect_support_preds:
                # stop_gradient: D updates never backprop into the episode
                sp = jax.lax.stop_gradient(sp)
            else:
                sp = jnp.zeros((0,))
            grads = self._masked(grads)
            params, opt_state = self.inner_opt.update(
                params, grads, lrs, opt_state, step_idx)
            # msl_query is STATICALLY False for the last inner step: its
            # MSL query term is the post-adaptation query forward that
            # task_episode computes anyway (one full forward saved per
            # MSL task; the reference computes that forward once too)
            if msl_query:
                q_loss, q_pred, bn_q = self._pair_loss(
                    params, frames[q0], frames[q1], frames[qt], loss_ctx,
                    num_step=step_idx, bn_state=bn)
                if self.passes_bn_state:
                    bn = jax.tree.map(jax.lax.stop_gradient, bn_q)
                # the per-step query pred feeds D updates only — never
                # backprop through it (same as support_preds below)
                qp = (jax.lax.stop_gradient(q_pred)
                      if spec.collect_query_preds else jnp.zeros((0,)))
            else:
                q_loss = jnp.zeros(())
                qp = jnp.zeros((0,))
            return params, opt_state, bn, q_loss, sp, qp

        # Step 0 is peeled out of the scan: at that point the params are
        # still the (per-task-identical) meta init, so under the episode
        # vmap they stay unbatched and the support grad runs as dense
        # convs. Inside a scan the carry is batched for every iteration,
        # which turns all model convs into per-task grouped convs —
        # measured 2.7x slower on TPU. Later steps use genuinely per-task
        # weights, so they stay in the scan — except the LAST step under
        # MSL, peeled so its query forward can be statically skipped
        # (reused from task_episode). (With L2F attenuation the init is
        # already per-task and the step-0 peel is math-neutral.)
        n = spec.num_steps
        last_peeled = collect_msl and n >= 1
        bn = bn_state
        net_params, opt_state, bn, q_loss0, sp0, qp0 = one_step(
            net_params, opt_state, bn, 0,
            msl_query=collect_msl and not (last_peeled and n == 1))
        mid_losses = []
        mid_preds = []
        mid_qpreds = []
        scan_hi = n - 1 if last_peeled else n
        if scan_hi > 1:
            def body(carry, step_idx):
                p, o, b = carry
                p, o, b, ql, sp, qp = one_step(p, o, b, step_idx)
                return (p, o, b), (ql, sp, qp)

            ((net_params, opt_state, bn),
             (rest, sp_rest, qp_rest)) = jax.lax.scan(
                body, (net_params, opt_state, bn), jnp.arange(1, scan_hi))
            mid_losses.append(rest)
            mid_preds.append(sp_rest)
            mid_qpreds.append(qp_rest)
        if last_peeled and n > 1:
            net_params, opt_state, bn, _, sp_last, _ = one_step(
                net_params, opt_state, bn, n - 1, msl_query=False)
            mid_preds.append(sp_last[None])
        # step_losses covers steps 0..n-2 under MSL (length n-1; the last
        # step's term is task_episode's query), all n steps otherwise
        losses = ([q_loss0[None]] + mid_losses
                  if not (last_peeled and n == 1) else [jnp.zeros((0,))])
        step_losses = (jnp.concatenate(losses) if len(losses) > 1
                       else losses[0])
        preds = [sp0[None]] + mid_preds
        support_preds = (jnp.concatenate(preds) if len(preds) > 1
                         else preds[0])
        # per-step MSL query preds: exactly the msl_query=True steps
        # (0..n-2; the last step's query pred is task_episode's). Empty
        # placeholder when not collecting (or n == 1, where the only query
        # criterion call IS the final one).
        if (spec.collect_query_preds and collect_msl
                and not (last_peeled and n == 1)):
            qpreds = [qp0[None]] + mid_qpreds
            query_preds = (jnp.concatenate(qpreds) if len(qpreds) > 1
                           else qpreds[0])
        else:
            query_preds = jnp.zeros((1, 0))
        out = (net_params, step_losses, support_preds, query_preds)
        return out + ((bn,) if self.passes_bn_state else ())

    def task_episode(self, meta_params: PyTree, frames: jnp.ndarray,
                     msl_weights: jnp.ndarray, spec: EpisodeSpec,
                     training: bool = True):
        """Full episode on one task → (outer_loss, pred, query_loss).

        Mirrors reference forward() per-task body (:366-461).
        """
        net = meta_params["net"]
        lrs = meta_params["lrs"]
        attenuator = meta_params.get("attenuator")
        loss_ctx = meta_params.get("loss_ctx")
        # num_steps == 0 under MSL would make the outer loss an empty sum
        # (the system rejects that config; guarded here for direct users)
        collect_msl = spec.use_msl and training and spec.num_steps > 0
        bn0 = meta_params.get("bn_state") if self.passes_bn_state else None
        adapted, step_losses, support_preds, query_preds, *bn_rest = \
            self.adapt(net, lrs, frames, spec, attenuator=attenuator,
                       collect_msl=collect_msl, loss_ctx=loss_ctx,
                       bn_state=bn0)
        bn = bn_rest[0] if bn_rest else None
        q0, qt, q1 = spec.target_idxs
        # per-step BN slot for the post-adaptation query: the reference
        # passes num_step=num_steps (:415,:425) which would index past its
        # num_steps-slot per-step BN stats (model_utils.py:454-461 — a
        # latent reference IndexError, never hit because no active config
        # uses per-step BN); we clamp to the last valid slot
        last = max(spec.num_steps - 1, 0)
        if collect_msl:
            # steps 0..n-2 come from the adaptation scan; the last step's
            # MSL term reuses this query forward (adapt skips it there)
            q_loss, pred, bn_q = self._pair_loss(adapted, frames[q0],
                                                 frames[q1], frames[qt],
                                                 loss_ctx, num_step=last,
                                                 bn_state=bn)
            n = spec.num_steps
            outer_loss = (jnp.sum(msl_weights[:n - 1] * step_losses)
                          + msl_weights[n - 1] * q_loss)
            q_loss = jax.lax.stop_gradient(q_loss)
        else:
            q_loss, pred, bn_q = self._pair_loss(adapted, frames[q0],
                                                 frames[q1], frames[qt],
                                                 loss_ctx, num_step=last,
                                                 bn_state=bn)
            outer_loss = q_loss
        if self.passes_bn_state:
            # the query forward updates stats too (the reference calls
            # F.batch_norm(training=True) on EVERY net_forward,
            # meta_learning_system.py:415,425)
            bn = jax.tree.map(jax.lax.stop_gradient, bn_q)
        if not training:
            # eval: adapt with grads, query under no-grad (:414-423)
            outer_loss = jax.lax.stop_gradient(outer_loss)
            pred = jax.lax.stop_gradient(pred)
        out = ((outer_loss, pred, q_loss, support_preds, query_preds)
               if spec.collect_support_preds
               else (outer_loss, pred, q_loss))
        return out + ((bn,) if self.passes_bn_state else ())

    # -- batched -----------------------------------------------------------
    def batched_episode(self, meta_params: PyTree, frames: jnp.ndarray,
                        msl_weights: jnp.ndarray, spec: EpisodeSpec,
                        training: bool = True, with_metrics: bool = False):
        """vmap over the task axis. frames: (B, T, H, W, C).

        Returns (mean_outer_loss, aux) with aux carrying preds / metrics.
        The reference averages per-task summed losses (:338, :460-461).
        """
        def one(task_frames):
            return self.task_episode(meta_params, task_frames, msl_weights,
                                     spec, training=training)

        # Fast batched-weight convs are valid here: every model apply in the
        # episode sits under this vmap, so grad-of-vmap expands the
        # custom_vmap rules before any linearization. Inner-gradient lambdas
        # (vmap-of-grad, which custom_vmap cannot linearize) re-disable it.
        with L.episode_fast_conv(True):
            out = jax.vmap(one)(frames)
        bn_state = None
        if self.passes_bn_state:
            out, bn_state = out[:-1], out[-1]
        if spec.collect_support_preds:
            outer_losses, preds, q_losses, support_preds, query_preds = out
        else:
            outer_losses, preds, q_losses = out
            support_preds = query_preds = None
        mean_loss = jnp.mean(outer_losses)
        aux: Dict[str, Any] = {"preds": preds,
                               "query_loss": jnp.mean(q_losses)}
        if bn_state is not None:
            # per-task final stats, stacked over the task axis (B, S, C);
            # the system mean-merges them at train, drops them at eval
            # (reference restore_backup_stats per task)
            aux["bn_state"] = bn_state
        if support_preds is not None:
            aux["support_preds"] = support_preds
        if (query_preds is not None and spec.collect_query_preds
                and query_preds.ndim >= 5):
            # ndim guard: adapt returns a (1, 0) placeholder (→ (B, 1, 0)
            # here) when there are no per-step MSL query preds to collect
            # (num_inner_steps == 1 — the only query criterion call is the
            # final one); attaching it would feed a rank-2 fake into the
            # discriminator update
            aux["query_preds"] = query_preds
        if with_metrics:
            qt = spec.target_idxs[1]
            dn_pred = self.denormalize(preds)
            dn_tgt = self.denormalize(frames[:, qt])

            def m(p, t):
                return metrics_lib.calc_metrics(p, t)

            psnr, ssim = jax.vmap(m)(dn_pred, dn_tgt)
            aux["psnr"] = jnp.mean(psnr)
            aux["ssim"] = jnp.mean(ssim)
        return mean_loss, aux

    def test_episode(self, meta_params: PyTree, frames: jnp.ndarray,
                     spec: EpisodeSpec):
        """×2 slow-motion test path (reference run_test_iter, :630-697):
        adapt on 4 consecutive frames with support [[0,1,2],[1,2,3]], then
        synthesize the midpoint of (frame1, frame2). frames: (B, 4, H, W, C).
        """
        def one(task_frames):
            bn0 = (meta_params.get("bn_state") if self.passes_bn_state
                   else None)
            adapted, _, _, _, *bn_rest = self.adapt(
                meta_params["net"], meta_params["lrs"], task_frames, spec,
                attenuator=meta_params.get("attenuator"),
                loss_ctx=meta_params.get("loss_ctx"), bn_state=bn0)
            kw = {}
            if self.passes_bn_state:
                kw = {"num_step": max(spec.num_steps - 1, 0),
                      "bn_state": bn_rest[0]}
            out = self.apply_fn(adapted, task_frames[1][None],
                                task_frames[2][None], **kw)
            if self.passes_bn_state:
                out = out[0]  # the test path discards state (per-task
                # restore — reference run_test_iter restores at :695)
            pred = out[0] if isinstance(out, tuple) else out
            return jax.lax.stop_gradient(pred[0])

        with L.episode_fast_conv(True):
            return jax.vmap(one)(frames)
