"""Drive-able legacy trainer CLIs (reference ``legacy/train_*.py``).

The reference ships four standalone ~400-LoC scripts implementing the
paper's original Reptile / deepcopy-first-order-MAML recipes with real
torch optimizers (``legacy/train_sepconv.py:104-290`` and siblings). This
driver reproduces those loops on top of the functional steps in
:mod:`.trainers`, jit-compiled per batch shape:

  * ``--meta_algorithm maml``   — inner steps on support pairs, query grad
    at adapted weights applied to base weights via the outer optimizer
    (train_sepconv.py:145-180);
  * ``--meta_algorithm reptile`` — θ ← θ + ε (θ' − θ)
    (train_sepconv.py:113-141);
  * per-epoch validation: adapt a throwaway copy, query PSNR, discard
    (:218-263); best-PSNR checkpointing (:273-290).

Per-model entry points (each a thin ``main()`` setting the reference
script's optimizer/loss defaults):

    python -m meta_interpolation_tpu.legacy.train_sepconv    --...
    python -m meta_interpolation_tpu.legacy.train_voxelflow  --...
    python -m meta_interpolation_tpu.legacy.train_superslomo --...
    python -m meta_interpolation_tpu.legacy.train_dain       --...
"""
from __future__ import annotations

import argparse
import os
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class LegacyPreset:
    """Per-script defaults (optimizers/losses from the reference scripts)."""
    model: str
    inner_rule: str            # Adamax (sepconv/dain) or Adam (vf/ssm)
    outer_opt: str             # Adamax / Adam / SGD
    loss_spec: str             # core.losses spec ("1*L1", "1*MSE", "1*Super")
    inner_lr: float = 1e-5
    outer_lr: float = 1e-5
    mask_rectify_only: bool = False  # DAIN: both optimizers over rectifyNet


def parse_args(preset: LegacyPreset, argv=None) -> argparse.Namespace:
    """Flag surface of legacy/train_sepconv.py:31-60."""
    p = argparse.ArgumentParser()
    p.add_argument("--exp_name", type=str, default="temp")
    p.add_argument("--meta_algorithm", type=str, default="maml",
                   choices=["maml", "reptile"])
    p.add_argument("--batch_size", "--bs", type=int, default=4)
    p.add_argument("--val_batch_size", type=int, default=4)
    p.add_argument("--inner_lr", type=float, default=preset.inner_lr)
    p.add_argument("--outer_lr", type=float, default=preset.outer_lr)
    p.add_argument("--max_epoch", type=int, default=100)
    p.add_argument("--val_iter", type=int, default=200)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--logfreq", type=int, default=20)
    p.add_argument("--num_inner_update", type=int, default=1)
    p.add_argument("--mode", type=str, default="")
    p.add_argument("--train_iter", type=int, default=4000,
                   help="per-epoch cap (reference hardcodes 4000, :107)")
    p.add_argument("--dataset", type=str, default="vimeo90k")
    p.add_argument("--data_root", type=str, default="data/vimeo_septuplet")
    p.add_argument("--crop_size", type=int, default=128)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoint")
    # tiny-model knobs for e2e tests (ignored by models without them)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--n_resblocks", type=int, default=None)
    return p.parse_args(argv)


def run(preset: LegacyPreset, argv=None):
    from ..core import checkpoint as ckpt_lib
    from ..core import losses as losses_lib
    from ..core import metrics as metrics_lib
    from ..core.compile_cache import enable_compilation_cache
    from ..data.loader import MetaLearningSystemDataLoader
    from ..models import registry
    from ..utils.meters import AverageMeter
    from . import trainers

    enable_compilation_cache()
    cfg = parse_args(preset, argv)
    md = registry.get(preset.model)

    model_kwargs = {}
    if cfg.depth is not None:
        model_kwargs["depth"] = cfg.depth
    if cfg.n_resblocks is not None:
        model_kwargs["n_resblocks"] = cfg.n_resblocks
    params = md.init(jax.random.PRNGKey(0), **model_kwargs)

    if preset.model == "dain":
        from ..models.dain.model import charbonnier_loss

        def loss_fn(pred, target, aux=None):
            return charbonnier_loss(pred, target)
    else:
        raw = losses_lib.make_loss_fn(preset.loss_spec,
                                      rng=jax.random.PRNGKey(1))

        def loss_fn(pred, target, aux=None):
            return raw(pred, target, aux)["total"]

    def apply_fn(p, f0, f1):
        return md.apply(p, f0, f1, **model_kwargs)

    mask = None
    if preset.mask_rectify_only and md.inner_mask_fn is not None:
        mask = md.inner_mask_fn(params)

    tx = {"Adamax": optax.adamax, "Adam": optax.adam,
          "SGD": optax.sgd}[preset.outer_opt](cfg.outer_lr)
    opt_state = tx.init(params)

    @jax.jit
    def maml_update(p, o, frames):
        return trainers.fomaml_step(
            apply_fn, loss_fn, p, o, tx, frames, cfg.inner_lr,
            num_steps=cfg.num_inner_update, inner_rule=preset.inner_rule,
            mask=mask)

    @jax.jit
    def reptile_update(p, frames):
        return trainers.reptile_step(
            apply_fn, loss_fn, p, frames, cfg.inner_lr, cfg.outer_lr,
            num_steps=cfg.num_inner_update, inner_rule=preset.inner_rule,
            mask=mask)

    @jax.jit
    def val_episode(p, frames):
        return trainers.eval_episode(
            apply_fn, loss_fn, p, frames, cfg.inner_lr,
            cfg.num_inner_update, inner_rule=preset.inner_rule, mask=mask)

    class _Cfg:  # adapter for MetaLearningSystemDataLoader
        pass

    dcfg = _Cfg()
    dcfg.dataset = cfg.dataset
    dcfg.data_root = cfg.data_root
    dcfg.model = preset.model
    dcfg.mode = "train"
    dcfg.crop_size = cfg.crop_size
    dcfg.test_mode = "hard"
    dcfg.img_fmt = "png"
    dcfg.batch_size = cfg.batch_size
    dcfg.val_batch_size = cfg.val_batch_size
    dcfg.test_batch_size = cfg.val_batch_size
    dcfg.num_workers = 4
    dcfg.random_seed = 0
    data = MetaLearningSystemDataLoader(dcfg)

    def train_epoch(epoch, params, opt_state):
        losses = AverageMeter()
        t0 = time.time()
        for i, (frames, _meta) in enumerate(
                data.get_train_batches(total_batches=cfg.train_iter,
                                       epoch=epoch)):
            frames = jnp.asarray(frames)
            if cfg.meta_algorithm == "reptile":
                params, loss = reptile_update(params, frames)
            else:
                params, opt_state, loss = maml_update(params, opt_state,
                                                      frames)
            losses.update(float(loss))
            if i % cfg.logfreq == 0:
                print(f"Epoch: [{epoch}][{i}]  Loss {losses.val:.4f} "
                      f"({losses.avg:.4f})  {time.time() - t0:.1f}s",
                      flush=True)
        return params, opt_state

    def validate(epoch, params):
        psnrs, losses = AverageMeter(), AverageMeter()
        cap = 10 ** 9 if cfg.val_iter == -1 else cfg.val_iter
        for i, (frames, _meta) in enumerate(data.get_val_batches()):
            if i >= cap:
                break
            frames = jnp.asarray(frames)
            loss, pred = val_episode(params, frames)
            tgt = md.denormalize(frames[:, 3])
            psnr, _ = metrics_lib.calc_metrics(md.denormalize(pred), tgt)
            psnrs.update(float(psnr))
            losses.update(float(loss))
        print(f"val_losses: {losses.avg:.6f}")
        print(f"val_PSNR: {psnrs.avg:.6f}")
        return psnrs.avg

    if cfg.mode == "test":
        validate(cfg.start_epoch, params)
        return params

    best_psnr = 0.0
    exp_dir = os.path.join(cfg.checkpoint_dir, cfg.exp_name)
    for epoch in range(cfg.start_epoch, cfg.max_epoch):
        params, opt_state = train_epoch(epoch, params, opt_state)
        psnr = validate(epoch, params)
        is_best = psnr > best_psnr
        best_psnr = max(psnr, best_psnr)
        ckpt_lib.save_checkpoint(
            {"epoch": epoch + 1, "arch": vars(cfg), "params": params,
             "best_PSNR": best_psnr}, exp_dir, is_best=is_best)
    return params
