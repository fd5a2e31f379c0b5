"""Bounded-warp quality on TRAINED flow-model weights.

The pallas bounded warp (--fast_warp_range R, ~30-50x over XLA's
gather-based warp at 448x256) is EXACT for per-axis displacement in
[-R, R-1] and clamps beyond. This script measures its quality cost on a
trained checkpoint (scripts/train_synth_ckpt.py) under the reference
protocol (adapt on the support pairs, then query), at the 448x256
headline shape:

  default        — exact gather vs bounded R=8 over n_clips val clips:
                   PSNR/SSIM mean +- std vs GT per mode, cross-PSNR of
                   the two predictions, and the measured |displacement|
                   distribution of the exact sampler (fraction of samples
                   beyond the bound, max displacement).
  --stress       — VERDICT r3 item 3: sweep the scene motion from well
                   under to well past R (clips rendered with controlled
                   blob velocity) and report the quality cliff:
                   PSNR-vs-GT for both paths + cross-PSNR + beyond-R
                   fraction as functions of max |flow|.

Practical rule (measured, BASELINE.md stress table): pick R from the
PREDICTED-flow histogram this script prints (FlowStats), not from the
scene motion — RRIN's adapted predictions stay under 4.1 px even when
true motion is 32 px/frame (the model under-estimates rather than
over-shoots, so the clamp never activates and both samplers degrade
identically past R; the failure mode under large motion is the
model's, not the bounded sampler's).

Usage: python scripts/warp_quality.py [model] [n_clips]
       python scripts/warp_quality.py [model] [n_clips] --stress
       python scripts/warp_quality.py [model] [n_clips] --range 16

--range R overrides the bound (default 8). SuperSloMo is the model
that motivates it: its intermediate-flow composition pushes per-warp
displacements to ~16 px on the standard set (6.9% of samples beyond
R=8 — the one measured active clamp), so the histogram rule says run
it at R=16.
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
from meta_interpolation_tpu.ops import warp as warp_ops  # noqa: E402

R = 8


def unwrap(v):
    if isinstance(v, np.ndarray):
        return v.item() if v.ndim == 0 else tuple(v.tolist())
    if isinstance(v, (tuple, list)):
        return tuple(unwrap(e) for e in v)
    return v


def load_systems(model):
    exp = "serving_ckpt" if model == "cain" else f"{model}_synth_ckpt"
    state = ckpt_lib.load_checkpoint(f"checkpoint/{exp}")
    if state is None:
        raise SystemExit(f"no checkpoint/{exp} — run "
                         f"scripts/train_synth_ckpt.py {model} first")
    arch = {k: unwrap(v) for k, v in state["arch"].items()}
    systems = {}
    for label, warp_range in [("exact", 0), (f"bounded R={R}", R)]:
        cfg = Config(**{**{k: v for k, v in arch.items()
                           if k in Config.__dataclass_fields__},
                        "fast_warp_range": warp_range})
        s = SceneAdaptiveInterpolation(cfg)
        s.load_state_dict(state["system"])
        systems[label] = s
    return systems, state.get("epoch", "?")


def eval_clips(systems, clips):
    """Per mode: PSNR/SSIM arrays vs GT + predictions."""
    out = {}
    for label, system in systems.items():
        ps, ss, preds = [], [], []
        for frames, _ in clips:
            losses, pred = system.run_validation_iter(frames[None])
            ps.append(losses["psnr"])
            ss.append(losses["ssim"])
            preds.append(np.asarray(pred, np.float32))
        out[label] = (np.asarray(ps), np.asarray(ss), preds)
    return out


def cross_psnr(preds_a, preds_b):
    return np.asarray([
        float(metrics_lib.calc_metrics(jnp.asarray(a), jnp.asarray(b))[0])
        for a, b in zip(preds_a, preds_b)])


def flow_stats(system, clips, n_stat):
    """Measured displacement distribution of the EXACT sampler on adapted
    weights: adapt jitted, final query forward eager under FlowStats."""
    builder = system.builder
    cfg = system.cfg
    spec = system._episode_spec("train", cfg.num_eval_steps, False, False)

    @jax.jit
    def adapt(mp, frames):
        return builder.adapt(mp["net"], mp["lrs"], frames, spec,
                             attenuator=mp.get("attenuator"),
                             loss_ctx=mp.get("loss_ctx"))[0]

    apply_fn = system._apply_fn()
    fs = warp_ops.FlowStats(r=R)
    for frames, _ in clips[:n_stat]:
        fr = jnp.asarray(frames)
        adapted = jax.block_until_ready(adapt(system.meta_params, fr))
        q0, _qt, q1 = cfg.target_idxs
        with fs:
            apply_fn(adapted, fr[q0][None], fr[q1][None])
    # a jit creeping into the probed forward would silently zero the
    # histogram (FlowStats skips tracers); fail loudly instead
    assert fs.calls > 0, (
        "FlowStats recorded no warp calls — the probed forward ran under "
        "jit; displacement stats would be no-op zeros")
    return fs


def main():
    global R
    argv = sys.argv[1:]
    if "--range" in argv:
        i = argv.index("--range")
        R = int(argv[i + 1])
        del argv[i:i + 2]
    model = argv[0] if argv else "voxelflow"
    n_clips = int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else 64
    stress = "--stress" in argv
    systems, epoch = load_systems(model)

    if not stress:
        ds = SyntheticSeptuplet(model=model, mode="val", size=(256, 448),
                                length=8 * n_clips)
        clips = [ds[i] for i in range(n_clips)]
        res = eval_clips(systems, clips)
        print(f"\n{model} checkpoint epoch {epoch}, {n_clips} val clips "
              f"@448x256")
        for label, (ps, ss, _p) in res.items():
            print(f"  {label:14s}: PSNR {ps.mean():7.3f} +- {ps.std():.3f}  "
                  f"SSIM {ss.mean():.4f} +- {ss.std():.4f}", flush=True)
        exact, bounded = list(res)[0], list(res)[1]
        cross = cross_psnr(res[bounded][2], res[exact][2])
        d = res[bounded][0] - res[exact][0]
        print(f"  PSNR(bounded pred, exact pred): mean {cross.mean():.3f} "
              f"min {cross.min():.3f}")
        print(f"  bounded-minus-exact delta: {d.mean():+.4f} +- "
              f"{d.std():.4f} dB  (min {d.min():+.3f} max {d.max():+.3f})")
        fs = flow_stats(systems[exact], clips, n_stat=min(4, n_clips))
        print(f"  exact-sampler displacement (adapted weights, "
              f"{min(4, n_clips)} clips, {fs.calls} warp calls): "
              f"max {fs.max_disp:.2f} px, beyond-R fraction "
              f"{fs.frac_beyond:.2e}")
        return

    # --stress: controlled-motion sweep past the clamp range. Blob speed
    # |v| <= motion/2 px/frame; the midpoint query needs ~|v|/2 px of flow,
    # support pairs (stride-2 frames) ~|v| px — so motion=4R already pushes
    # support flows to ~R and motion=8R well past it.
    print(f"\n{model} checkpoint epoch {epoch} — warp-clamp stress sweep "
          f"(R={R}, {n_clips} clips/point @448x256)")
    print(f"{'motion':>7} {'max|v|':>7} | {'PSNR exact':>10} "
          f"{'PSNR bounded':>12} {'delta':>8} | {'cross':>7} "
          f"{'beyond-R':>9} {'max disp':>9}")
    for motion in (8, 16, 24, 32, 48, 64):
        ds = SyntheticSeptuplet(model=model, mode="val", size=(256, 448),
                                length=8 * n_clips, motion=motion)
        clips = [ds[i] for i in range(n_clips)]
        res = eval_clips(systems, clips)
        exact, bounded = list(res)[0], list(res)[1]
        cross = cross_psnr(res[bounded][2], res[exact][2])
        fs = flow_stats(systems[exact], clips, n_stat=min(4, n_clips))
        pe, pb = res[exact][0], res[bounded][0]
        print(f"{motion:7.0f} {motion / 2:7.1f} | {pe.mean():10.3f} "
              f"{pb.mean():12.3f} {(pb - pe).mean():+8.3f} | "
              f"{cross.mean():7.2f} {fs.frac_beyond:9.2e} "
              f"{fs.max_disp:9.2f}", flush=True)


if __name__ == "__main__":
    main()
