"""Train full-size CAIN on the synthetic dataset to a usable checkpoint.

Purpose (VERDICT r2 item 2): produce trained weights so the serving-mode
quality deviation (pad_multiple=8 + fuse_pad vs the reference's pad-to-x128
reflect, BASELINE.md "serving roofline") can be measured on a TRAINED
checkpoint instead of random init, where the CA layers' global pooling
makes cross-mode PSNR meaningless.

Drives the system's public run_train_iter directly (run_cain.sh preset
shapes) instead of the CLI epoch loop because the CLI checkpoints every
epoch — a ~1 GB state pickle whose device->host fetch through the axon
tunnel costs minutes per 16-iteration synthetic epoch. Checkpoints land in
checkpoint/serving_ckpt/ every 50 epochs and at the end, loadable by
``--resume --resume_exp serving_ckpt`` or scripts/serving_quality.py.

Usage: python scripts/train_serving_ckpt.py [epochs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_interpolation_tpu.core.compile_cache import enable_compilation_cache

enable_compilation_cache()

from meta_interpolation_tpu.config import Config  # noqa: E402
from meta_interpolation_tpu.core import checkpoint as ckpt_lib  # noqa: E402
from meta_interpolation_tpu.data import MetaLearningSystemDataLoader  # noqa: E402
from meta_interpolation_tpu.meta.system import (  # noqa: E402
    SceneAdaptiveInterpolation)


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    cfg = Config(model="cain", dataset="synthetic", mode="train",
                 batch_size=4, val_batch_size=1, crop_size=256,
                 loss="1*L1", metasgd=True, optimizer="Adam",
                 inner_lr=1e-5, outer_lr=1e-4, dtype="bfloat16",
                 exp_name="serving_ckpt")
    system = SceneAdaptiveInterpolation(cfg)
    data = MetaLearningSystemDataLoader(cfg)
    out_dir = os.path.join(cfg.checkpoint_dir, cfg.exp_name)

    def save(epoch):
        ckpt_lib.save_checkpoint(
            {"epoch": epoch + 1, "arch": vars(cfg),
             "system": system.state_dict(), "best_PSNR": 0.0}, out_dir)
        print(f"[ckpt] saved at epoch {epoch}", flush=True)

    t0 = time.time()
    for epoch in range(epochs):
        for it, (frames, _meta) in enumerate(
                data.get_train_batches(epoch=epoch)):
            do_eval = (it == 0 and epoch % 10 == 0)
            losses, _ = system.run_train_iter(frames, epoch,
                                              do_evaluation=do_eval)
            if do_eval:
                print(f"[epoch {epoch}] loss {losses['loss']:.4f} "
                      f"psnr {losses.get('psnr', 0.0):.2f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        if epoch % 50 == 49 or epoch == epochs - 1:
            save(epoch)

    # final val on the synthetic val split (reference val protocol)
    psnrs = []
    for frames, _meta in data.get_val_batches():
        losses, _ = system.run_validation_iter(frames)
        psnrs.append(losses["psnr"])
    print(f"[final val] PSNR {sum(psnrs) / len(psnrs):.3f} over "
          f"{len(psnrs)} clips", flush=True)


if __name__ == "__main__":
    main()
