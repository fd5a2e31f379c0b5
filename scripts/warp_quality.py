"""Bounded-warp quality on TRAINED flow-model weights.

The pallas bounded warp (--fast_warp_range R, ~30-50x over XLA's
gather-based warp at 448x256) is EXACT for |flow| <= R and clamps
beyond; its quality cost on real weights is an open claim the same way
the CAIN serving mode's was. This script evaluates a trained checkpoint
(scripts/train_synth_ckpt.py) under the reference protocol (adapt on the
support pairs, then query) with the exact gather vs warp_range=8, at the
448x256 headline shape.

Usage: python scripts/warp_quality.py [model] [n_clips]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_interpolation_tpu.core.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from meta_interpolation_tpu.config import Config  # noqa: E402
from meta_interpolation_tpu.core import checkpoint as ckpt_lib  # noqa: E402
from meta_interpolation_tpu.core import metrics as metrics_lib  # noqa: E402
from meta_interpolation_tpu.data.datasets import SyntheticSeptuplet  # noqa: E402
from meta_interpolation_tpu.meta.system import (  # noqa: E402
    SceneAdaptiveInterpolation)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "voxelflow"
    n_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    exp = "serving_ckpt" if model == "cain" else f"{model}_synth_ckpt"
    state = ckpt_lib.load_checkpoint(f"checkpoint/{exp}")
    if state is None:
        raise SystemExit(f"no checkpoint/{exp} — run "
                         f"scripts/train_synth_ckpt.py {model} first")

    def unwrap(v):
        if isinstance(v, np.ndarray):
            return v.item() if v.ndim == 0 else tuple(v.tolist())
        if isinstance(v, (tuple, list)):
            return tuple(unwrap(e) for e in v)
        return v

    arch = {k: unwrap(v) for k, v in state["arch"].items()}
    epoch = state.get("epoch", "?")

    ds = SyntheticSeptuplet(model=model, mode="val", size=(256, 448),
                            length=8 * n_clips)
    clips = [ds[i] for i in range(n_clips)]

    preds, psnr_gt = {}, {}
    for label, warp_range in [("exact gather", 0), ("bounded warp R=8", 8)]:
        cfg = Config(**{**{k: v for k, v in arch.items()
                           if k in Config.__dataclass_fields__},
                        "fast_warp_range": warp_range})
        system = SceneAdaptiveInterpolation(cfg)
        system.load_state_dict(state["system"])
        ps, outs = [], []
        for frames, _ in clips:
            losses, pred = system.run_validation_iter(frames[None])
            ps.append(losses["psnr"])
            outs.append(np.asarray(pred, np.float32))
        preds[label], psnr_gt[label] = outs, ps
        print(f"{label:18s}: adapted-query PSNR mean {np.mean(ps):7.3f} "
              f"min {np.min(ps):7.3f} max {np.max(ps):7.3f}", flush=True)

    cross = [float(metrics_lib.calc_metrics(jnp.asarray(a), jnp.asarray(b))[0])
             for a, b in zip(preds["bounded warp R=8"],
                             preds["exact gather"])]
    print(f"\n{model} checkpoint epoch {epoch}, {n_clips} val clips @448x256")
    print(f"  PSNR(bounded pred, exact pred): mean {np.mean(cross):.3f}")
    print(f"  bounded-vs-exact quality delta: "
          f"{np.mean(psnr_gt['exact gather']) - np.mean(psnr_gt['bounded warp R=8']):+.4f} dB")


if __name__ == "__main__":
    main()
