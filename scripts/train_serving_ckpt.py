"""Train full-size CAIN on the synthetic dataset to a usable checkpoint.

Purpose (VERDICT r2 item 2): produce trained weights so the serving-mode
quality deviation (pad_multiple=8 + fuse_pad vs the reference's pad-to-x128
reflect, BASELINE.md "serving roofline") can be measured on a TRAINED
checkpoint instead of random init, where the CA layers' global pooling
makes cross-mode PSNR meaningless.

Drives the system's public run_train_iter directly (run_cain.sh preset
shapes) instead of the CLI epoch loop because the CLI checkpoints every
epoch — a ~1 GB state pickle whose device->host fetch through the axon
tunnel costs minutes per 16-iteration synthetic epoch.

DEVICE-RESIDENT DATA (required on this box): the experimental axon PJRT
plugin leaks the full transfer size in host RSS on EVERY host->device
transfer (measured: 21 MB/iter for a 22 MB batch -> ~95 GB over 4500
iterations -> host OOM kill; /tmp/axon_leak.py probe, round 3). The
synthetic train split is only 64 deterministic clips, so they are rendered
once, put on device as a clip bank, and batches are gathered on-device by
index — the per-iteration transfer is 4 int32s. Checkpoints land in
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from meta_interpolation_tpu.config import Config  # noqa: E402
from meta_interpolation_tpu.core import checkpoint as ckpt_lib  # noqa: E402
from meta_interpolation_tpu.data.datasets import SyntheticSeptuplet  # noqa: E402
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
    out_dir = os.path.join(cfg.checkpoint_dir, cfg.exp_name)

    # one-time render + device upload of the whole synthetic train split
    ds = SyntheticSeptuplet(model="cain", mode="train",
                            size=(cfg.crop_size, cfg.crop_size))
    n_clips = ds.data_length["train"]
    bank = jax.device_put(jnp.asarray(np.stack(
        [ds[i][0] for i in range(n_clips)]), jnp.float32))
    print(f"clip bank on device: {bank.shape} "
          f"({bank.nbytes / 1e6:.0f} MB)", flush=True)
    iters_per_epoch = n_clips // cfg.batch_size
    rng = np.random.RandomState(cfg.random_seed)

    def save(epoch):
        ckpt_lib.save_checkpoint(
            {"epoch": epoch + 1, "arch": vars(cfg),
             "system": system.state_dict(), "best_PSNR": 0.0}, out_dir)
        print(f"[ckpt] saved at epoch {epoch}", flush=True)

    t0 = time.time()
    for epoch in range(epochs):
        order = rng.permutation(n_clips)
        for it in range(iters_per_epoch):
            idx = jnp.asarray(order[it * cfg.batch_size:
                                    (it + 1) * cfg.batch_size])
            frames = bank[idx]  # on-device gather — no host transfer
            do_eval = (it == 0 and epoch % 10 == 0)
            losses, _ = system.run_train_iter(frames, epoch,
                                              do_evaluation=do_eval)
            if do_eval:
                print(f"[epoch {epoch}] loss {losses['loss']:.4f} "
                      f"psnr {losses.get('psnr', 0.0):.2f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        if epoch % 50 == 49 or epoch == epochs - 1:
            save(epoch)

    # final val on the synthetic val split (reference val protocol),
    # likewise device-resident
    ds_val = SyntheticSeptuplet(model="cain", mode="val",
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
