"""SceneAdaptiveInterpolation — the user-facing meta-learning system.

TPU-native equivalent of ``/root/reference/meta_learning_system.py:29-697``:
holds the meta-parameters (net init + learnable inner LRs + L2F attenuator),
the outer optax optimizer, and a cache of jit-compiled episode programs keyed
by (shape, static flags). The per-iteration work — all inner steps, their
gradients, the outer gradient, and the optimizer update — is one XLA program.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..core import losses as losses_lib
from ..models import registry
from . import episode as episode_lib
from .inner_optimizers import make_inner_optimizer

PyTree = Any


class PlateauScheduler:
    """ReduceLROnPlateau(mode='min', factor=0.2, patience=5)
    (reference meta_learning_system.py:144).

    Matches torch's defaults: relative threshold 1e-4 ('rel' mode, min) —
    an epoch only counts as an improvement when
    ``metric < best * (1 - threshold)`` — and decays when the bad-epoch
    count *exceeds* patience."""

    def __init__(self, init_lr: float, factor: float = 0.2, patience: int = 5,
                 mode: str = "min", threshold: float = 1e-4):
        self.lr = init_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = np.inf
        self.bad_epochs = 0

    def _is_better(self, metric: float) -> bool:
        # torch rel-mode for min: metric < best * (1 - threshold); the
        # best=inf sentinel always loses to the first finite metric
        if not np.isfinite(self.best):
            return True
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
                print(f"PlateauScheduler: reducing outer lr to {self.lr:.3e}")
        return self.lr


def make_outer_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Outer optimizer (reference :132-144): Adam β=(0.9,0.99), Adamax
    β=(0.9,0.999), or SGD, with injectable LR for the plateau scheduler.

    VoxelFlow + Adam mirrors the reference's ``get_optim_policies`` branch
    (meta_learning_system.py:134-136, voxel_flow.py:307-350, multipliers
    from voxelflow_maml_config.py:8-10): torch-default betas (0.9, 0.999),
    conv weights [lr×1, decay×1], conv biases [lr×2, decay×0], BN
    scale/shift [lr×1, decay×1]; BN running stats are buffers (frozen via
    the model's outer mask). Policies apply to the 'net' subtree only —
    the reference passes only net policies to this optimizer (its inner
    LRs silently drop out; ours keeps them on plain no-decay Adam).
    """
    if cfg.optimizer == "Adam":
        if cfg.model == "voxelflow":
            def _classify(path):
                """'conv_bias' | 'decayed' (conv W + BN affine) | 'plain'
                (everything outside net, and BN buffers — outer-masked)."""
                keys = [getattr(k, "key", "") for k in path]
                if not keys or keys[0] != "net":
                    return "plain"
                in_bn = any(str(k).endswith("_bn") for k in keys[:-1])
                leaf = keys[-1]
                if in_bn:
                    return "decayed" if leaf in ("scale", "bias") else "plain"
                return "conv_bias" if leaf == "bias" else "decayed"

            def vf_adam(learning_rate):
                def mask_of(group):
                    return lambda params: jax.tree_util.tree_map_with_path(
                        lambda kp, _: _classify(kp) == group, params)

                return optax.chain(
                    optax.masked(
                        optax.add_decayed_weights(cfg.weight_decay),
                        mask_of("decayed")),
                    optax.scale_by_adam(b1=0.9, b2=0.999),
                    optax.masked(optax.scale(2.0), mask_of("conv_bias")),
                    optax.scale(-learning_rate))

            tx = optax.inject_hyperparams(vf_adam)(
                learning_rate=cfg.outer_lr)
        else:
            tx = optax.inject_hyperparams(optax.adam)(
                learning_rate=cfg.outer_lr, b1=0.9, b2=0.99)
    elif cfg.optimizer == "Adamax":
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.adamax(learning_rate, b1=0.9, b2=0.999)
        )(learning_rate=cfg.outer_lr)
    else:
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=cfg.outer_lr)
    return tx


class SceneAdaptiveInterpolation:
    """Meta-learning system: build with a Config, drive with run_*_iter."""

    def __init__(self, cfg: Config, rng: Optional[jax.Array] = None,
                 mesh=None):
        self.cfg = cfg
        self.model_def = registry.get(cfg.model)
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.random_seed)
        r_net, r_att, r_loss = jax.random.split(rng, 3)

        # model hyperparameters from the CLI (reference --depth/--n_resblocks,
        # config.py:25-26, consumed by MetaCAIN(depth=...) at
        # meta_learning_system.py:61)
        self.model_kwargs = {}
        if cfg.model == "cain":
            fuse = cfg.fuse_pad_mode
            if cfg.fuse_groups:
                # first-class serving-graph surface: a --fuse_groups token
                # (RZZZZ / bw1 / bw1x5 / exact|zero|reflect) overrides the
                # scalar --fuse_pad (models/cain.parse_fuse_spec)
                from ..models import cain as cain_model
                fuse = cain_model.parse_fuse_spec(
                    cfg.fuse_groups, n_resblocks=cfg.n_resblocks)
            self.model_kwargs = {"depth": cfg.depth,
                                 "n_resblocks": cfg.n_resblocks,
                                 "pad_multiple": cfg.pad_multiple,
                                 "fuse_pad": fuse}
        if cfg.model in ("rrin", "superslomo", "voxelflow") and \
                cfg.fast_warp_range > 0:
            self.model_kwargs["warp_range"] = cfg.fast_warp_range
        if cfg.model == "sepconv" and cfg.second_order:
            # the pallas op's hand-written backward is not itself
            # differentiable; second-order MAML needs the jnp path
            self.model_kwargs["use_pallas"] = False
        if (cfg.per_step_bn_statistics
                and not cfg.enable_inner_loop_optimizable_bn_params
                and self.model_def.bn_state_init_fn is not None):
            # reference MetaBatchNormLayer combination: per-step stats AND
            # per-step (S, C) affine rows — weight[num_step]/bias[num_step]
            # (model_utils.py:453-461, 504-511). Outer-trainable, never
            # inner-adapted. With enable_inner_loop_optimizable_bn_params
            # the reference substitutes a flat adaptable affine (:470-475)
            # — the other wired combination.
            self.model_kwargs["per_step_bn_affine"] = cfg.num_inner_steps
        net_params = self.model_def.init(r_net, **self.model_kwargs)
        self.inner_opt = make_inner_optimizer(cfg)
        if cfg.use_multi_step_loss_optimization and cfg.num_inner_steps == 0:
            # MSL over zero inner steps would make every outer loss an
            # empty sum = 0 and train nothing, silently (the reference
            # crashes on torch.stack of an empty task_losses list)
            raise ValueError(
                "--use_multi_step_loss_optimization requires "
                "number_of_training_steps_per_iter >= 1")
        if (self.inner_opt.lr_mode == "lslr"
                and cfg.num_eval_steps > cfg.num_inner_steps + 1):
            # the LSLR container holds num_inner_steps+1 per-step LRs
            # (reference inner_loop_optimizers.py:101,144 raises
            # IndexError past that); a JAX gather would silently clamp
            # to the last slot instead — fail loudly up front
            raise ValueError(
                f"number_of_evaluation_steps_per_iter "
                f"({cfg.num_eval_steps}) exceeds the per-step LSLR "
                f"learning-rate slots ({cfg.num_inner_steps + 1}); raise "
                f"number_of_training_steps_per_iter or use --metasgd")
        lrs = self.inner_opt.init_lrs(net_params, cfg.inner_lr)
        self.meta_params: Dict[str, PyTree] = {"net": net_params, "lrs": lrs}
        if cfg.attenuate:
            # the attenuator embeds/scales the reference's
            # names_weights_copy — the requires_grad=True leaves at init
            # (meta_learning_system.py:108 num_layers =
            # len(names_weights_dict); DAIN: rectifyNet only, :96-101)
            att_keep = None
            if self.model_def.outer_mask_fn is not None:
                att_keep = jax.tree.map(
                    bool, self.model_def.outer_mask_fn(net_params))
            n_layers = (sum(map(bool, jax.tree.leaves(att_keep)))
                        if att_keep is not None
                        else len(jax.tree.leaves(net_params)))
            self.meta_params["attenuator"] = episode_lib.init_attenuator(
                r_att, n_layers)
            self._att_keep = att_keep

        # inner-loop adaptation mask (sepconv: encoder only; DAIN: rectify
        # net only — see ModelDef.inner_mask_fn)
        inner_mask = None
        if self.model_def.inner_mask_fn is not None:
            inner_mask = self.model_def.inner_mask_fn(net_params)
        if (inner_mask is not None
                and cfg.enable_inner_loop_optimizable_bn_params):
            # reference flag (config.py:53, model_utils.py:419-535): let BN
            # affine params adapt in the inner loop. Running stats stay
            # frozen (eval-mode BN everywhere — PARITY.md deviation note).
            def _unfreeze_bn_affine(path, m):
                keys = [str(getattr(k, "key", "")) for k in path]
                in_bn = any(k.endswith("_bn") for k in keys[:-1])
                if in_bn and keys[-1] in ("scale", "bias"):
                    return jnp.ones((), jnp.float32)
                return m

            inner_mask = jax.tree_util.tree_map_with_path(
                _unfreeze_bn_affine, inner_mask)
        self.inner_mask = inner_mask

        # adversarial loss: discriminator lives in meta_params['loss_ctx']
        # (traced through the episode, excluded from the outer optimizer)
        # and is updated once per outer iteration — the reference updates it
        # inside every criterion call (loss.py:168-213), documented deviation
        self.adv_state = None
        gan_terms = [t for t in losses_lib.parse_loss_spec(cfg.loss)
                     if "GAN" in t.loss_type]
        if gan_terms:
            from ..core.adversarial import AdversarialState
            self.adv_state = AdversarialState.create(
                jax.random.PRNGKey(cfg.random_seed + 1),
                gan_terms[0].loss_type, patch_size=min(cfg.crop_size, 96))
            self.meta_params["loss_ctx"] = {"disc": self.adv_state.params}

        if cfg.model == "dain":
            # DAIN trains on its internal charbonnier regardless of --loss
            # (reference net_forward dain branch, meta_learning_system.py:503-505)
            from ..models.dain.model import charbonnier_loss

            def dain_loss(pred, target, aux=None, **_kw):
                val = charbonnier_loss(pred, target)
                return {"DAIN": val, "total": val}

            self.loss_fn = dain_loss
        else:
            self.loss_fn = losses_lib.make_loss_fn(
                cfg.loss, rng=r_loss,
                patch_size=min(cfg.crop_size, 96))
        self.builder = episode_lib.EpisodeBuilder(
            apply_fn=self._apply_fn(), loss_fn=self.loss_fn,
            inner_opt=self.inner_opt,
            denormalize=self.model_def.denormalize,
            inner_mask=inner_mask,
            uses_loss_ctx=self.adv_state is not None)
        if cfg.attenuate:
            self.builder.att_keep = self._att_keep

        if cfg.per_step_bn_statistics:
            # per-step BN running stats (reference MetaBatchNormLayer
            # use_per_step_bn_statistics): state lives in meta_params,
            # threaded through every episode forward; persisted at train,
            # per-task-restored at eval (config.py flag docstring)
            if self.model_def.bn_state_init_fn is None:
                raise ValueError(
                    f"--per_step_bn_statistics: model {cfg.model!r} has no "
                    f"per-step BN support (ModelDef.bn_state_init_fn)")
            if cfg.num_inner_steps < 1:
                # the reference sizes the stat rows by
                # number_of_training_steps_per_iter (model_utils.py:454)
                raise ValueError(
                    "--per_step_bn_statistics requires "
                    "number_of_training_steps_per_iter >= 1")
            self.meta_params["bn_state"] = self.model_def.bn_state_init_fn(
                cfg.num_inner_steps)
            self.builder.passes_bn_state = True

        self.tx = make_outer_optimizer(cfg)
        self.opt_state = self.tx.init(self.meta_params)
        self.scheduler = PlateauScheduler(cfg.outer_lr)
        self.current_epoch = 0
        self.mesh = mesh
        if cfg.mode == "train":
            from ..parallel import mesh as mesh_lib
            mesh_lib.validate_train_batch(mesh, cfg.batch_size)
        self._trainable_mask = self._build_trainable_mask()
        # second-order episodes may only prune leaves frozen in BOTH loops
        self.builder.outer_keep = self._trainable_mask["net"]
        self._jit_cache: Dict[Any, Callable] = {}

    # ------------------------------------------------------------------
    def _apply_fn(self, extra_kwargs: Optional[dict] = None):
        base_apply = self.model_def.apply
        kwargs = dict(self.model_kwargs)
        if self.model_def.meta_apply_kwargs:
            # e.g. DAIN hole filling on every meta forward — see
            # ModelDef.meta_apply_kwargs
            kwargs.update(self.model_def.meta_apply_kwargs)
        if extra_kwargs:
            kwargs.update(extra_kwargs)

        def apply(params, f0, f1, **kw):
            return base_apply(params, f0, f1, **{**kwargs, **kw})

        if self.cfg.remat:
            # rematerialize activations across the inner loop: trades FLOPs
            # for HBM (jax.checkpoint; SURVEY.md build directive)
            apply = jax.checkpoint(apply, static_argnums=())

        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        if dtype == jnp.float32:
            return apply

        def bf16_apply(params, f0, f1, **kw):
            out = apply(params, f0.astype(dtype), f1.astype(dtype), **kw)
            if isinstance(out, tuple):
                pred, aux = out
                return pred.astype(jnp.float32), jax.tree.map(
                    lambda x: x.astype(jnp.float32), aux)
            return out.astype(jnp.float32)

        return bf16_apply

    def freeze_loaded(self, loaded_mask: PyTree) -> None:
        """--fix_loaded (reference utils.py:79-84): freeze the net leaves
        that were actually loaded from a checkpoint, so only new /
        unmatched parts keep training. The reference freeze is
        requires_grad=False, which also drops those params from the
        inner-loop weight dict (meta_learning_system.py:221) — mirror both:
        outer trainable mask AND the episode's inner mask/prune set."""
        self._trainable_mask["net"] = jax.tree.map(
            lambda t, was_loaded: bool(t) and not bool(was_loaded),
            self._trainable_mask["net"], loaded_mask)
        prev_inner = self.builder.inner_mask
        new_inner = jax.tree.map(
            lambda was_loaded: jnp.full(
                (), 0.0 if was_loaded else 1.0, jnp.float32), loaded_mask)
        if prev_inner is not None:
            new_inner = jax.tree.map(lambda a, b: a * b, prev_inner,
                                     new_inner)
        self.builder.inner_mask = new_inner
        self.builder._inner_keep = jax.tree.map(
            lambda m: bool(float(m)), new_inner)
        self.builder.outer_keep = self._trainable_mask["net"]
        self._jit_cache.clear()  # train steps close over the masks

    def _build_trainable_mask(self) -> PyTree:
        """Outer-loop trainability: net always (minus DAIN frozen parts),
        LRs only when learnable (reference requires_grad semantics)."""
        outer_mask = None
        if self.model_def.outer_mask_fn is not None:
            outer_mask = self.model_def.outer_mask_fn(self.meta_params["net"])
        mask = {
            "net": (jax.tree.map(lambda m: bool(m), outer_mask)
                    if outer_mask is not None
                    else jax.tree.map(lambda _: True, self.meta_params["net"])),
            "lrs": jax.tree.map(lambda _: self.inner_opt.learnable,
                                self.meta_params["lrs"]),
        }
        if "attenuator" in self.meta_params:
            mask["attenuator"] = jax.tree.map(
                lambda _: True, self.meta_params["attenuator"])
        if "loss_ctx" in self.meta_params:
            # discriminator params are updated by their own optimizer
            # (AdversarialState), never by the meta optimizer
            mask["loss_ctx"] = jax.tree.map(
                lambda _: False, self.meta_params["loss_ctx"])
        if "bn_state" in self.meta_params:
            # BN running stats are buffers: updated by forwards
            # (run_train_iter write-back), never by the optimizer
            mask["bn_state"] = jax.tree.map(
                lambda _: False, self.meta_params["bn_state"])
        return mask

    def _episode_spec(self, mode: str, num_steps: int, second_order: bool,
                      use_msl: bool,
                      collect_support_preds: bool = False,
                      collect_query_preds: bool = False
                      ) -> episode_lib.EpisodeSpec:
        return episode_lib.EpisodeSpec(
            support_idxs=self.cfg.support_idxs(mode),
            target_idxs=self.cfg.target_idxs,
            num_steps=num_steps,
            second_order=second_order,
            use_msl=use_msl,
            attenuate=self.cfg.attenuate,
            returns_aux=self.model_def.returns_aux,
            collect_support_preds=collect_support_preds,
            collect_query_preds=collect_query_preds,
            second_order_einsum=self.cfg.second_order_einsum)

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------
    def _get_train_step(self, spec: episode_lib.EpisodeSpec,
                        with_metrics: bool):
        key = ("train", spec, with_metrics)
        if key in self._jit_cache:
            return self._jit_cache[key]
        builder, tx, mask = self.builder, self.tx, self._trainable_mask

        def train_step(meta_params, opt_state, frames, msl_weights):
            def outer_loss(mp):
                return builder.batched_episode(mp, frames, msl_weights, spec,
                                               training=True,
                                               with_metrics=with_metrics)

            (loss, aux), grads = jax.value_and_grad(outer_loss, has_aux=True)(
                meta_params)
            if "bn_state" in aux:
                # reference cadence: tasks mutate the shared per-step BN
                # running stats SEQUENTIALLY within an iteration — recover
                # that composition exactly from the vmapped per-task states
                # (closed form; episode_lib.fold_bn_states_sequential)
                aux["bn_state"] = episode_lib.fold_bn_states_sequential(
                    meta_params["bn_state"], aux["bn_state"], spec)
            fmask = jax.tree.map(lambda b: jnp.asarray(b, jnp.float32), mask)
            grads = jax.tree.map(lambda g, m: g * m, grads, fmask)
            updates, opt_state = tx.update(grads, opt_state, meta_params)
            # mask the UPDATES too: transforms that look at params rather
            # than grads (add_decayed_weights in the voxelflow policies)
            # must not move frozen leaves (fix_loaded, BN buffers, loss_ctx)
            updates = jax.tree.map(lambda u, m: u * m, updates, fmask)
            meta_params = optax.apply_updates(meta_params, updates)
            return meta_params, opt_state, loss, aux

        # episode parallelism needs no special handling here: inputs arrive
        # sharded over the task axis (run_train_iter → shard_task_batch) and
        # jit's computation-follows-data replicates params / inserts the
        # outer-gradient psum automatically
        fn = jax.jit(train_step) if self.cfg.jit_episode else train_step
        self._jit_cache[key] = fn
        return fn

    def _get_eval_step(self, spec: episode_lib.EpisodeSpec):
        key = ("eval", spec)
        if key in self._jit_cache:
            return self._jit_cache[key]
        builder = self.builder

        def eval_step(meta_params, frames, msl_weights):
            return builder.batched_episode(meta_params, frames, msl_weights,
                                           spec, training=False,
                                           with_metrics=True)

        fn = jax.jit(eval_step) if self.cfg.jit_episode else eval_step
        self._jit_cache[key] = fn
        return fn

    def _get_test_step(self, spec: episode_lib.EpisodeSpec):
        key = ("test", spec)
        if key in self._jit_cache:
            return self._jit_cache[key]
        builder = self.builder

        def test_step(meta_params, frames):
            return builder.test_episode(meta_params, frames, spec)

        fn = jax.jit(test_step) if self.cfg.jit_episode else test_step
        self._jit_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    # public API (reference run_train_iter / run_validation_iter / run_test_iter)
    # ------------------------------------------------------------------
    def _use_second_order(self, epoch: int) -> bool:
        return (self.cfg.second_order
                and epoch > self.cfg.first_order_to_second_order_epoch)

    def _msl_active(self, epoch: int) -> bool:
        return (self.cfg.use_multi_step_loss_optimization
                and epoch < self.cfg.multi_step_loss_num_epochs)

    def _shard_batch(self, frames):
        if self.mesh is None:
            return frames
        from ..parallel import mesh as mesh_lib
        if self.cfg.spatial_shards > 1:
            # HD eval: rows sharded over the spatial mesh axis (exact —
            # GSPMD inserts the conv halo exchanges)
            return mesh_lib.shard_task_spatial_batch(self.mesh, frames)
        # multi-host aware: each process contributes its local slice of the
        # global batch (single-process this is plain shard_task_batch)
        return mesh_lib.shard_task_batch_multihost(self.mesh, frames)

    def run_train_iter(self, frames, epoch: int, do_evaluation: bool = False):
        """One outer-loop update. frames: (B, T, H, W, C) numpy/jnp in model
        input space. Returns a losses dict (reference :584-606)."""
        self.current_epoch = int(epoch)
        collect_sp = (self.adv_state is not None
                      and self.cfg.disc_per_forward
                      and self.cfg.num_inner_steps > 0)
        spec = self._episode_spec(
            "train", self.cfg.num_inner_steps,
            self._use_second_order(epoch), self._msl_active(epoch),
            collect_support_preds=collect_sp,
            # while MSL is active the reference's per-step query criterion
            # calls also update D (loss.py:168-213 via
            # meta_learning_system.py:404-412) — collect those preds too
            collect_query_preds=collect_sp and self._msl_active(epoch))
        msl_w = jnp.asarray(episode_lib.per_step_loss_importance(
            self.cfg.num_inner_steps, epoch, self.cfg.multi_step_loss_num_epochs))
        frames = self._shard_batch(jnp.asarray(frames))
        step = self._get_train_step(spec, do_evaluation)
        self.meta_params, self.opt_state, loss, aux = step(
            self.meta_params, self.opt_state, frames, msl_w)
        if "bn_state" in aux:
            # persist the per-step BN stats — already folded inside the
            # train step to the reference's sequential task-by-task
            # mutation order (exact at any batch size)
            self.meta_params["bn_state"] = aux["bn_state"]
        if self.adv_state is not None:
            qt = self.cfg.target_idxs[1]
            upd = self.adv_state.jitted_update()
            d_params = self.meta_params["loss_ctx"]["disc"]
            d_opt = self.adv_state.opt_state
            # fold in a per-call counter: keying on epoch alone would
            # replay the identical WGAN-GP interpolation eps for every
            # iteration of an epoch
            self._disc_iter = getattr(self, "_disc_iter", 0) + 1
            rng = jax.random.fold_in(
                jax.random.PRNGKey(int(epoch) * 100003 + 17),
                self._disc_iter)
            if "support_preds" in aux:
                # --disc_per_forward: reference cadence — one D update per
                # criterion call (loss.py:168-213), and the reference calls
                # the criterion inside `for task_id in range(batch)`
                # (meta_learning_system.py:366), so tasks are SEQUENTIAL:
                # all of task 0's (step, support pair, [MSL] query, final
                # query) updates, then task 1's, ... Each update sees a
                # single-task batch, which also matches the reference's
                # discriminator BN batch statistics. The replay runs as
                # ONE lax.scan program on device (r4 ran it as a host loop
                # of B*(S*P+Sq+1) separately dispatched updates — ~80
                # dispatches/iter at bs8 x 3 MSL steps through a ~700 µs
                # tunnel; scan order/math pinned identical by test).
                from ..core.adversarial import build_replay_sequence
                sp = aux["support_preds"]  # (B, steps, n_pairs, H, W, C)
                qp = aux.get("query_preds")  # (B, steps-1, H, W, C) | None
                if qp is not None and qp.ndim != 5:
                    # degenerate placeholder, e.g. (B, 1, 0) when
                    # num_inner_steps == 1 under MSL (the only query
                    # criterion call is the final one)
                    qp = None
                fakes, reals = build_replay_sequence(
                    sp, qp, aux["preds"], frames,
                    [it for (_i0, it, _i1)
                     in self.cfg.support_idxs("train")], qt)
                keys = jax.random.split(rng, fakes.shape[0])
                seq_upd = self.adv_state.jitted_sequential_update()
                d_params, d_opt, d_losses = seq_upd(
                    d_params, d_opt, fakes, reals, keys)
                d_loss = d_losses[-1]
            else:
                # default cadence: ONE batched query-pred update per outer
                # iteration (documented deviation — the reference updates D
                # inside every criterion call; --disc_per_forward restores
                # that exactly)
                rng, r = jax.random.split(rng)
                d_params, d_opt, d_loss = upd(d_params, d_opt,
                                              aux["preds"], frames[:, qt], r)
            self.adv_state.params = d_params
            self.adv_state.opt_state = d_opt
            self.meta_params["loss_ctx"]["disc"] = d_params
        losses = {"loss": float(loss), "total": float(aux["query_loss"])}
        if do_evaluation:
            losses["psnr"] = float(aux["psnr"])
            losses["ssim"] = float(aux["ssim"])
        return losses, aux.get("preds")

    def run_validation_iter(self, frames):
        """Eval episode: adapt with grads, query under no-grad (:608-627)."""
        spec = self._episode_spec("train", self.cfg.num_eval_steps,
                                  False, True)
        msl_w = jnp.asarray(episode_lib.per_step_loss_importance(
            self.cfg.num_eval_steps, self.current_epoch,
            self.cfg.multi_step_loss_num_epochs))
        frames = self._shard_batch(jnp.asarray(frames))
        step = self._get_eval_step(spec)
        loss, aux = step(self.meta_params, frames, msl_w)
        losses = {"loss": float(loss), "total": float(aux["query_loss"]),
                  "psnr": float(aux["psnr"]), "ssim": float(aux["ssim"])}
        return losses, aux["preds"]

    def run_test_iter(self, frames):
        """Slow-motion synthesis on 4 consecutive frames (:630-697)."""
        spec = self._episode_spec("test", self.cfg.num_eval_steps,
                                  self.cfg.second_order, False)
        frames = self._shard_batch(jnp.asarray(frames))
        step = self._get_test_step(spec)
        return step(self.meta_params, frames)

    def epoch_end(self, val_loss: float):
        """Plateau LR schedule hook — call once per epoch with val loss.

        Fails loudly if the optax state no longer exposes
        ``hyperparams['learning_rate']`` — a silent except here would mean
        LR decay silently stops if optax's state shape ever changes."""
        new_lr = self.scheduler.step(val_loss)
        # optax.inject_hyperparams exposes the lr in opt_state.hyperparams
        hp = getattr(self.opt_state, "hyperparams", None)
        if hp is None or "learning_rate" not in hp:
            raise RuntimeError(
                "outer opt_state does not expose hyperparams['learning_rate']"
                " — PlateauScheduler cannot inject the decayed LR; the outer"
                " optimizer must be built with optax.inject_hyperparams"
                f" (got state type {type(self.opt_state).__name__})")
        hp["learning_rate"] = jnp.asarray(new_lr)

    # ------------------------------------------------------------------
    def state_dict(self) -> Dict[str, Any]:
        # scheduler state included: without it a resume would reset a
        # plateau-decayed LR back to cfg.outer_lr on the first epoch_end
        return {"meta_params": self.meta_params, "opt_state": self.opt_state,
                "epoch": self.current_epoch,
                "scheduler": {"lr": self.scheduler.lr,
                              "best": self.scheduler.best,
                              "bad_epochs": self.scheduler.bad_epochs}}

    def load_state_dict(self, state: Dict[str, Any],
                        restore_opt: bool = True):
        """Restore meta-params (and, by default, outer-optimizer state).

        ``restore_opt=False`` loads the WEIGHTS only and keeps the freshly
        built outer optimizer/scheduler — the reference's behavior when
        initializing from a checkpoint: it always constructs a new outer
        optimizer at the configured LR (meta_learning_system.py:132-144).
        This matters because with ``optax.inject_hyperparams`` the outer
        LR lives inside ``opt_state.hyperparams``; restoring ``opt_state``
        whole silently overrides a freshly configured ``--outer_lr``
        (VERDICT r4: the 1e-5 migration fine-tune bitwise-reproduced the
        1e-4 run). Use ``restore_opt=True`` only for a true resume of the
        SAME run (same graph, same configured LR)."""
        # Checkpoint leaves are numpy (core/checkpoint.py saves via
        # np.asarray). Put them on device ONCE here: left as numpy, every
        # subsequent jitted call re-uploads the full tree (~600 MB for
        # CAIN meta-params + Meta-SGD LRs), and the axon plugin leaks each
        # host->device transfer in host RSS (CLAUDE.md) — a 64-clip eval
        # loop then OOMs the host.
        self.meta_params = jax.device_put(state["meta_params"])
        self.current_epoch = int(state.get("epoch", 0))
        if not restore_opt:
            return
        if state.get("opt_state") is not None:
            self.opt_state = jax.device_put(state["opt_state"])
        sched = state.get("scheduler")
        if sched:
            self.scheduler.lr = float(sched["lr"])
            self.scheduler.best = float(sched["best"])
            self.scheduler.bad_epochs = int(sched["bad_epochs"])
