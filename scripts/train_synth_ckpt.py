"""Meta-train a model on the synthetic dataset to a usable checkpoint.

Generalizes scripts/train_serving_ckpt.py (the CAIN serving-quality
checkpoint) to any registered backbone, so opt-in fast paths can be
quality-validated on TRAINED weights rather than random init — e.g. the
bounded pallas warp (--fast_warp_range 8) for VoxelFlow/RRIN/SuperSloMo
via scripts/warp_quality.py.

Device-resident clip bank (axon transfer-leak workaround — CLAUDE.md):
the synthetic split is rendered once and batches are gathered on-device.

Usage: python scripts/train_synth_ckpt.py [model] [epochs] [--resume]
         [--outer_lr X] [--seed N]
--outer_lr overrides the preset's meta (outer) learning rate — the
migration fine-tune (cain_serving_ft) degrades at the from-scratch
1e-4 (r4c: 44.5 -> 43.1 dB over 25 epochs); fine-tuning an already
converged checkpoint wants ~10x lower.
--seed N replaces the default random seed (12345) AND suffixes the
checkpoint dir with _sN — seed replicates for error bars on
checkpoint-level quality comparisons (VERDICT r4 item 5). Seeding
covers init, data order, and XLA determinism: a same-seed rerun
reproduces PSNR tables to 3 decimals (CLAUDE.md round-4 notes).
Checkpoints land in checkpoint/<model>_synth_ckpt/ (cain keeps the
round-3 name serving_ckpt). --resume restarts from the last saved
epoch in that directory (fresh RNG stream; fine for quality ckpts).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_interpolation_tpu.core.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from meta_interpolation_tpu.config import Config  # noqa: E402
from meta_interpolation_tpu.core import checkpoint as ckpt_lib  # noqa: E402
from meta_interpolation_tpu.data.datasets import SyntheticSeptuplet  # noqa: E402
from meta_interpolation_tpu.meta.system import (  # noqa: E402
    SceneAdaptiveInterpolation)

# per-model training presets: the run_*.sh hyperparameters, with the
# outer LR raised to 1e-4 (the synthetic set is tiny; the presets'
# 1e-5 is tuned for 5000-iteration Vimeo epochs)
PRESETS = {
    "cain": dict(batch_size=4, loss="1*L1", exp_name="serving_ckpt"),
    # serving-NATIVE checkpoint: meta-trained with the serving graph
    # itself (pad_multiple=8 + zero-fuse body convs), so serving-mode
    # inference uses the semantics it was trained/adapted with — the
    # self-consistent answer to the zero-fuse boundary deviation
    # (VERDICT r3 item 1; compare its adapted-query PSNR against the
    # exact checkpoint's via scripts/serving_quality.py / serving_pareto)
    "cain_serving": dict(model="cain", batch_size=4, loss="1*L1",
                         exp_name="cain_serving_native_ckpt",
                         pad_multiple=8, fuse_pad="true"),
    # serving MIGRATION: start from the exact-trained checkpoint and
    # fine-tune briefly under the serving graph — measures what a user
    # with trained exact weights pays (in epochs) to recover serving-mode
    # quality: python scripts/train_synth_ckpt.py cain_serving_ft 25
    #            --init_from checkpoint/serving_ckpt
    "cain_serving_ft": dict(model="cain", batch_size=4, loss="1*L1",
                            exp_name="cain_serving_ft_ckpt",
                            pad_multiple=8, fuse_pad="true"),
    # CONTROL for the migration measurement (r5): same init, epochs and
    # outer LR as cain_serving_ft but under the EXACT graph — separates
    # "recovered serving quality" from "just trained 25 more epochs".
    # The migration cost is (migrated serving-mode PSNR) minus (this
    # control's exact-mode PSNR), not minus the ep-250 anchor.
    "cain_exact_ft": dict(model="cain", batch_size=4, loss="1*L1",
                          exp_name="cain_exact_ft_ckpt"),
    # migration to the bw1 boundary-fuse graph (reflect the first RCAB
    # of group 0, zero-fuse the rest — measured 1026 fps): if first-conv
    # border fidelity helps the fine-tune land closer to the exact-ft
    # control than zero-fuse migration does, this is the better >=1000
    # fps migration target.
    "cain_bw1_ft": dict(model="cain", batch_size=4, loss="1*L1",
                        exp_name="cain_bw1_ft_ckpt",
                        pad_multiple=8, fuse_pad="true",
                        fuse_groups="bw1"),
    # serving-NATIVE under the RZZZZ graph (reflect the first residual
    # group — index 0 — zero-fuse the rest): the pareto localization
    # shows that group's borders carry 0.95 of the zero-fuse 1.88 dB on
    # exact-trained weights; training natively under this graph should
    # land much closer to the exact anchor than the all-zero-fuse
    # native ckpt (-0.85 dB) while keeping most of its throughput
    # (RZZZR = 898 fps; RZZZZ cell measured by measure_r4d.sh).
    # fuse_groups is the r5 first-class Config field (--fuse_groups
    # token, models/cain.parse_fuse_spec) — recorded in the saved arch
    # so these checkpoints are self-describing.
    "cain_serving_rzzzz": dict(model="cain", batch_size=4, loss="1*L1",
                               exp_name="cain_serving_rzzzz_ckpt",
                               pad_multiple=8, fuse_pad="true",
                               fuse_groups="RZZZZ"),
    # RCAB-granular boundary-fuse graphs (cain.boundary_fuse): the
    # measured-fps-qualified >=1000 fps candidates — reflect the first
    # j RCABs of the first group (bwJ) or the first RCAB of every group
    # (bw1x5), zero-fuse the rest. scripts/measure_r4e.sh trains the
    # point the pareto sweep selects (fps >= threshold, best PSNR).
    "cain_serving_bw1": dict(model="cain", batch_size=4, loss="1*L1",
                             exp_name="cain_serving_bw1_ckpt",
                             pad_multiple=8, fuse_pad="true",
                             fuse_groups="bw1"),
    "cain_serving_bw2": dict(model="cain", batch_size=4, loss="1*L1",
                             exp_name="cain_serving_bw2_ckpt",
                             pad_multiple=8, fuse_pad="true",
                             fuse_groups="bw2"),
    "cain_serving_bw4": dict(model="cain", batch_size=4, loss="1*L1",
                             exp_name="cain_serving_bw4_ckpt",
                             pad_multiple=8, fuse_pad="true",
                             fuse_groups="bw4"),
    "cain_serving_bw1x5": dict(model="cain", batch_size=4, loss="1*L1",
                               exp_name="cain_serving_bw1x5_ckpt",
                               pad_multiple=8, fuse_pad="true",
                               fuse_groups="bw1x5"),
    "voxelflow": dict(batch_size=8, loss="1*MSE",
                      exp_name="voxelflow_synth_ckpt"),
    "rrin": dict(batch_size=4, loss="1*L1", exp_name="rrin_synth_ckpt"),
    # SuperNoPrcp = the reference's composite Super loss
    # (scripts/run_superslomo.sh: --loss 1*Super; loss.py:246-274) minus
    # ONLY the 0.005*perceptual term, whose defining VGG16 weights are
    # env-blocked (zero egress; random-init features would be noise).
    # Trains the reconstruction + warp + smoothness plumbing on honest
    # terms (VERDICT r4 item 7). r4 and earlier used plain L1.
    "superslomo": dict(batch_size=4, loss="1*SuperNoPrcp",
                       exp_name="superslomo_synth_ckpt"),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cain"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    if epochs <= 0:
        raise SystemExit("epochs must be positive")
    preset = dict(PRESETS[name])
    model = preset.pop("model", name)
    outer_lr = 1e-4
    if "--outer_lr" in sys.argv:
        outer_lr = float(sys.argv[sys.argv.index("--outer_lr") + 1])
    seed = None
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
        preset["exp_name"] = f"{preset['exp_name']}_s{seed}"
        preset["random_seed"] = seed
    cfg = Config(model=model, dataset="synthetic", mode="train",
                 val_batch_size=1, crop_size=256, metasgd=True,
                 optimizer="Adam", inner_lr=1e-5, outer_lr=outer_lr,
                 dtype="bfloat16", **preset)
    system = SceneAdaptiveInterpolation(cfg)
    if cfg.fuse_groups:
        print(f"[graph] fuse_groups = {cfg.fuse_groups} -> "
              f"{system.model_kwargs['fuse_pad']}", flush=True)
    out_dir = os.path.join(cfg.checkpoint_dir, cfg.exp_name)

    start_epoch = 0
    if "--resume" in sys.argv:
        prev = ckpt_lib.load_checkpoint(out_dir)
        if prev is not None:
            system.load_state_dict(prev["system"])
            start_epoch = int(prev.get("epoch", 0))
            print(f"[resume] {out_dir} at epoch {start_epoch}", flush=True)
    elif "--init_from" in sys.argv:
        src = sys.argv[sys.argv.index("--init_from") + 1]
        prev = ckpt_lib.load_checkpoint(src)
        if prev is None:
            raise SystemExit(f"--init_from {src}: no checkpoint")
        # weights only — keep the FRESH outer optimizer built at this
        # run's --outer_lr (restoring opt_state would silently re-pin the
        # source checkpoint's LR via opt_state.hyperparams; VERDICT r4)
        system.load_state_dict(prev["system"], restore_opt=False)
        print(f"[init] weights from {src} (epoch "
              f"{prev.get('epoch', '?')}); training under this "
              f"preset's graph from epoch 0 at outer_lr {outer_lr:g}",
              flush=True)

    ds = SyntheticSeptuplet(model=model, mode="train",
                            size=(cfg.crop_size, cfg.crop_size))
    n_clips = ds.data_length["train"]
    bank = jax.device_put(jnp.asarray(np.stack(
        [ds[i][0] for i in range(n_clips)]), jnp.float32))
    print(f"{model}: clip bank on device {bank.shape} "
          f"({bank.nbytes / 1e6:.0f} MB)", flush=True)
    iters_per_epoch = n_clips // cfg.batch_size
    rng = np.random.RandomState(cfg.random_seed)

    def save(epoch):
        ckpt_lib.save_checkpoint(
            {"epoch": epoch + 1, "arch": vars(cfg),
             "system": system.state_dict(), "best_PSNR": 0.0}, out_dir)
        print(f"[ckpt] saved at epoch {epoch}", flush=True)

    t0 = time.time()
    for epoch in range(start_epoch, epochs):
        order = rng.permutation(n_clips)
        for it in range(iters_per_epoch):
            idx = jnp.asarray(order[it * cfg.batch_size:
                                    (it + 1) * cfg.batch_size])
            do_eval = (it == 0 and epoch % 10 == 0)
            losses, _ = system.run_train_iter(bank[idx], epoch,
                                              do_evaluation=do_eval)
            if do_eval:
                print(f"[epoch {epoch}] loss {losses['loss']:.4f} "
                      f"psnr {losses.get('psnr', 0.0):.2f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        if epoch % 50 == 49 or epoch == epochs - 1:
            save(epoch)

    ds_val = SyntheticSeptuplet(model=model, mode="val",
                                size=(cfg.crop_size, cfg.crop_size))
    psnrs = []
    for i in range(ds_val.data_length["val"]):
        frames = jax.device_put(jnp.asarray(ds_val[i][0][None]))
        losses, _ = system.run_validation_iter(frames)
        psnrs.append(losses["psnr"])
    print(f"[final val] PSNR {sum(psnrs) / len(psnrs):.3f} over "
          f"{len(psnrs)} clips", flush=True)


if __name__ == "__main__":
    main()
