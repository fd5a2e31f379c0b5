"""Serving-vs-exact quality on TRAINED CAIN weights (VERDICT r2 item 2).

The serving path (pad_multiple=8 + packed scan weights + fuse_pad,
bench.py --serving, 1015 fps) changes conv boundary context vs the
reference's pad-to-x128 reflect (model_utils.py:17-28). With RANDOM-INIT
weights the cross-mode PSNR is ~9 dB and meaningless — the CA layers'
global pooling couples changed borders into every pixel (BASELINE.md
"serving roofline, round 2"). This script quantifies the deviation where
it matters: on a checkpoint trained to convergence
(scripts/train_serving_ckpt.py), at the 448x256 headline shape, in the
bf16 serving configuration.

Reports, over the synthetic val scenes:
  PSNR(exact pred, gt), PSNR(serving pred, gt)  — quality in each mode
  PSNR(serving pred, exact pred)                — direct mode deviation

Usage: python scripts/serving_quality.py [n_clips]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_interpolation_tpu.core.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from meta_interpolation_tpu.core import checkpoint as ckpt_lib  # noqa: E402
from meta_interpolation_tpu.core import metrics as metrics_lib  # noqa: E402
from meta_interpolation_tpu.data.datasets import SyntheticSeptuplet  # noqa: E402
from meta_interpolation_tpu.models import cain  # noqa: E402


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    state = ckpt_lib.load_checkpoint("checkpoint/serving_ckpt")
    if state is None:
        raise SystemExit("no checkpoint/serving_ckpt/checkpoint.pkl — run "
                         "scripts/train_serving_ckpt.py first")
    net = state["system"]["meta_params"]["net"]
    epoch = state.get("epoch", "?")
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), net)
    packed = cain.pack(params)

    @jax.jit
    def exact(p, f0, f1):
        return cain.apply(p, f0, f1, pad_multiple=128)

    @jax.jit
    def serving(p, f0, f1):
        return cain.apply(p, f0, f1, pad_multiple=8, packed_body=packed,
                          fuse_pad=True)

    ds = SyntheticSeptuplet(model="cain", mode="val", size=(256, 448),
                            length=8 * n_clips)
    stats = {"exact_gt": [], "serving_gt": [], "serving_exact": []}
    for i in range(n_clips):
        frames, _ = ds[i]
        f0 = jnp.asarray(frames[2][None], jnp.bfloat16)
        f1 = jnp.asarray(frames[4][None], jnp.bfloat16)
        gt = jnp.asarray(frames[3][None], jnp.float32)
        pe = jnp.asarray(exact(params, f0, f1), jnp.float32)
        ps = jnp.asarray(serving(params, f0, f1), jnp.float32)
        stats["exact_gt"].append(float(metrics_lib.calc_metrics(pe, gt)[0]))
        stats["serving_gt"].append(float(metrics_lib.calc_metrics(ps, gt)[0]))
        stats["serving_exact"].append(
            float(metrics_lib.calc_metrics(ps, pe)[0]))

    print(f"checkpoint epoch {epoch}, {n_clips} val clips @448x256 bf16")
    for k, v in stats.items():
        print(f"  PSNR {k:14s}: mean {np.mean(v):7.3f}  min {np.min(v):7.3f}"
              f"  max {np.max(v):7.3f}")
    print(f"  serving-vs-exact quality delta: "
          f"{np.mean(stats['exact_gt']) - np.mean(stats['serving_gt']):+.4f} dB")


if __name__ == "__main__":
    main()
