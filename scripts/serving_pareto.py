"""CAIN serving fps-vs-quality Pareto frontier (VERDICT r3 item 1).

One harness measuring BOTH axes per operating point on the TRAINED
serving checkpoint:

  * fps       — bench.py's marginal-timing protocol at each point's batch
                sweet spot (exact: B=16; pad-8 points: B=128);
  * quality   — adapted-query PSNR/SSIM under the reference eval protocol
                (one inner-loop adaptation then the query), n_clips
                synthetic val scenes @448x256, vs the exact anchor.

Points: the r3 menu (exact / border-corrected / pad8-reflect / zero-fuse)
plus the r4 ablations — per-group fuse (where does the zero-fuse dB
live?) and reflect aprons on the pad-8 canvas (does border context
recover the pad8 deviation?).

Usage: python scripts/serving_pareto.py [n_clips] [--fps_only|--psnr_only]
         [--start N] [--anchor PSNR] [--only SUB[,SUB...]]
--start N skips the first N points (resume a partial run); pass the
already-measured exact-anchor mean PSNR via --anchor so dPSNR stays
relative to the exact point. --only runs just the requested points
(fill in missing cells without re-measuring the whole menu): each token
matches its exact fuse[TOKEN] tag or exact label — use several tokens
for several points (bw1 does NOT drag in bw1x5); a token matching no
point is an error, and --only without --anchor is refused when the
exact anchor point is filtered out (dPSNR would silently anchor to an
arbitrary first row).
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
from meta_interpolation_tpu.models import cain  # noqa: E402

R5 = ["reflect"] * 5
Z5 = [True] * 5

# label -> (pad_multiple, fuse_pad, apron, fps_batch).
# Headline-relevant points first so partial runs are usable. Dropped as
# known/redundant: pad128 border-corrected (same math as exact — r3
# measured 0.000 dB), apron4 (bracketed by 0/8), RRZRR (RZZZR + ZRRRZ
# already localize the zero-fuse cost), zero-fuse apron16 (apron8 tells
# whether border context matters for the zero-pad body).
POINTS = {
    "exact (pad128 reflect)":        (128, False, 0, 16),
    "pad8 zero-fuse (r3 headline)":  (8, True, 0, 128),
    "pad8 reflect (exact-math body)": (8, "reflect", 0, 128),
    "pad8 reflect apron8":           (8, "reflect", 8, 128),
    "pad8 reflect apron16":          (8, "reflect", 16, 128),
    "pad8 fuse[RZZZR]":              (8, ["reflect"] + [True] * 3 + ["reflect"], 0, 128),
    "pad8 fuse[ZRRRZ]":              (8, [True] + R5[:3] + [True], 0, 128),
    "pad8 zero-fuse apron8":         (8, True, 8, 128),
    # r4c finer localization: is one border group enough? (RZZZR measured
    # 898 fps and recovers 1.31 of the zero-fuse 1.88 dB — split it)
    "pad8 fuse[RZZZZ]":              (8, ["reflect"] + [True] * 4, 0, 128),
    "pad8 fuse[ZZZZR]":              (8, [True] * 4 + ["reflect"], 0, 128),
    # r4e RCAB-granular boundary fuse (cain.boundary_fuse): reflect only
    # the first j RCABs of the first group — index 0 — (bwJ) or the first
    # RCAB of every group (bw1x5) — the dB-per-fps-optimal shapes if the zero-fuse cost
    # really lives in the earliest convs (reflect ~2.3 fps/conv, so these
    # points should stay above the 1000-fps line)
    "pad8 fuse[bw1]":                (8, cain.boundary_fuse(1), 0, 128),
    "pad8 fuse[bw2]":                (8, cain.boundary_fuse(2), 0, 128),
    "pad8 fuse[bw4]":                (8, cain.boundary_fuse(4), 0, 128),
    "pad8 fuse[bw1x5]":              (8, cain.boundary_fuse(
                                         1, all_groups=True), 0, 128),
}


def measure_fps(pad, fuse, apron, batch, iters=8):
    params = cain.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    packed = cain.pack(params)
    rs = np.random.RandomState(0)
    f0 = jnp.asarray(rs.rand(batch, 256, 448, 3), jnp.bfloat16)
    f1 = jnp.asarray(rs.rand(batch, 256, 448, 3), jnp.bfloat16)

    @jax.jit
    def step(p, a, b):
        return cain.apply(p, a, b, pad_multiple=pad, packed_body=packed,
                          fuse_pad=fuse, apron=apron)

    def run(n):
        x0, x1 = f0, f1
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(params, x0, x1)
            x1 = x0
            x0 = out
        _ = float(jnp.float32(out).mean())
        return time.perf_counter() - t0

    run(3)
    t_n = run(iters)
    t_2n = run(2 * iters)
    return batch * iters / max(t_2n - t_n, 1e-9)


def measure_quality(arch, state, clips, pad, fuse, apron):
    cfg = Config(**{**{k: v for k, v in arch.items()
                       if k in Config.__dataclass_fields__},
                    "pad_multiple": pad})
    system = SceneAdaptiveInterpolation(cfg)
    # per-group fuse lists and aprons are ablation-only knobs without CLI
    # flags — patch the model kwargs AND rebuild the episode apply_fn
    # (the builder captured a snapshot of model_kwargs at construction)
    system.model_kwargs["fuse_pad"] = fuse
    system.model_kwargs["apron"] = apron
    system.builder.apply_fn = system._apply_fn()
    system.load_state_dict(state["system"])
    ps, ss = [], []
    for frames, _ in clips:
        losses, _pred = system.run_validation_iter(frames[None])
        ps.append(losses["psnr"])
        ss.append(losses["ssim"])
    return np.asarray(ps), np.asarray(ss)


def main():
    argv = sys.argv[1:]
    fps_only = "--fps_only" in argv
    psnr_only = "--psnr_only" in argv
    start = 0
    anchor = None
    if "--start" in argv:
        i = argv.index("--start")
        start = int(argv[i + 1])
        del argv[i:i + 2]
    if "--anchor" in argv:
        i = argv.index("--anchor")
        anchor = float(argv[i + 1])
        del argv[i:i + 2]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1].split(",")
        del argv[i:i + 2]
    n_clips = 8
    for a in argv:
        if a.isdigit():
            n_clips = int(a)

    def label_matches(label, tokens):
        """Exact tag/label matching (ADVICE r4): 'bw1' matches
        'pad8 fuse[bw1]' but NOT 'pad8 fuse[bw1x5]'."""
        return any(f"[{t}]" in label or t == label for t in tokens)

    if only is not None:
        matched = [lb for lb in POINTS if label_matches(lb, only)]
        unmatched = [t for t in only
                     if not any(label_matches(lb, [t]) for lb in POINTS)]
        if unmatched:
            raise SystemExit(
                f"--only {unmatched}: no point has that exact fuse tag or "
                f"label; menu: {list(POINTS)}")
        exact_label = next(iter(POINTS))
        if (anchor is None and not fps_only
                and exact_label not in matched):
            raise SystemExit(
                "--only filters out the exact anchor point — pass the "
                "measured exact-mode mean PSNR via --anchor, or include "
                "the exact point, so dPSNR stays relative to it")

    # fps is measured with random weights (graph-shape-only); the trained
    # checkpoint is needed only for the quality axis
    state = None
    if not fps_only:
        state = ckpt_lib.load_checkpoint("checkpoint/serving_ckpt")
        if state is None:
            raise SystemExit("no checkpoint/serving_ckpt — run "
                             "scripts/train_synth_ckpt.py cain first")

    def unwrap(v):
        if isinstance(v, np.ndarray):
            return v.item() if v.ndim == 0 else tuple(v.tolist())
        if isinstance(v, (tuple, list)):
            return tuple(unwrap(e) for e in v)
        return v

    arch = clips = None
    if not fps_only:
        arch = {k: unwrap(v) for k, v in state["arch"].items()}
        ds = SyntheticSeptuplet(model="cain", mode="val", size=(256, 448),
                                length=8 * n_clips)
        clips = [ds[i] for i in range(n_clips)]

    print(f"checkpoint epoch "
          f"{state.get('epoch', '?') if state else '(fps only)'}, "
          f"{n_clips} val clips @448x256  "
          f"(PSNR/SSIM: adapted query vs GT)")
    print(f"{'point':34s} {'fps':>8} | {'PSNR':>8} {'+-':>6} {'SSIM':>7} "
          f"| {'dPSNR':>7}")
    for label, (pad, fuse, apron, batch) in list(POINTS.items())[start:]:
        if only is not None and not label_matches(label, only):
            continue
        fps = (measure_fps(pad, fuse, apron, batch)
               if not psnr_only else float("nan"))
        if not fps_only:
            ps, ss = measure_quality(arch, state, clips, pad, fuse, apron)
            if anchor is None:
                anchor = ps.mean()
            print(f"{label:34s} {fps:8.1f} | {ps.mean():8.3f} "
                  f"{ps.std():6.3f} {ss.mean():7.4f} | "
                  f"{ps.mean() - anchor:+7.3f}", flush=True)
        else:
            print(f"{label:34s} {fps:8.1f}", flush=True)


if __name__ == "__main__":
    main()
