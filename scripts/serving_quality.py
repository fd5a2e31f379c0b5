"""Serving-vs-exact quality on TRAINED CAIN weights (VERDICT r2 item 2).

The serving path (pad_multiple=8 + fuse_pad, bench.py --serving, 1015 fps)
changes conv boundary context vs the reference's pad-to-x128 reflect
(model_utils.py:17-28). With RANDOM-INIT weights the cross-mode PSNR is
~9 dB and meaningless — the CA layers' global pooling couples changed
borders into every pixel (BASELINE.md "serving roofline, round 2"). This
script quantifies the deviation where it matters: on a meta-trained
checkpoint (scripts/train_serving_ckpt.py), at the 448x256 headline
shape, under the REFERENCE EVAL PROTOCOL — one inner-loop adaptation on
the support pairs, then the query forward (the meta-init alone is a MAML
launch pad, not a working model: its un-adapted PSNR is ~6 dB by design).

Per mode (exact pad-128 reflect | serving pad-8 zero-fuse), reports
adapted-query PSNR vs GT over synthetic val scenes, plus the
serving-vs-exact prediction PSNR. The serving-NATIVE checkpoint (trained
with the serving graph itself) is evaluated under BOTH modes — if the
deviation is pure boundary semantics, the roles should flip (native
ckpt serves at full quality and degrades under exact math).

Round-4 default keeps only the modes scripts/serving_pareto.py does NOT
already measure at n=64; --all_modes restores the full r3 table
(border-corrected pad128 + pad8-reflect rows).

Usage: python scripts/serving_quality.py [n_clips] [--all_modes]
         [--ckpts_only] [--anchor PSNR] [--rows SUB[,SUB...]]

--rows evaluates only the rows whose label contains one of the given
substrings (re-measure specific cells without the whole table).

--ckpts_only skips everything measure_r4c/r4d already measure at n=64
(the base exact/serving modes AND the native/migrated rows) and
evaluates only the existence-gated rzzzz/boundary-fuse checkpoint rows;
pass the exact-anchor mean PSNR via --anchor so the printed deltas stay
relative to the exact point.
"""
import dataclasses
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

MODES = {
    "exact (pad128 reflect)": dict(pad_multiple=128, fuse_pad="false"),
    "serving (pad8 zero-fuse)": dict(pad_multiple=8, fuse_pad="true"),
}
EXTRA_MODES = {
    # same math as exact — r3 measured 0.000 dB; pad8-reflect is pareto
    # row 3 at n=64. Re-run via --all_modes only.
    "exact-math (pad128 border-corr)": dict(pad_multiple=128,
                                            fuse_pad="reflect"),
    "serving-exactmath (pad8 reflect)": dict(pad_multiple=8,
                                             fuse_pad="reflect"),
}


def main():
    argv = sys.argv[1:]
    anchor = None
    if "--anchor" in argv:
        i = argv.index("--anchor")
        anchor = float(argv[i + 1])
        del argv[i:i + 2]
    ckpts_only = "--ckpts_only" in argv
    rows = None
    if "--rows" in argv:
        i = argv.index("--rows")
        # drop empty tokens (a stray trailing comma would match EVERY row)
        rows = [t for t in argv[i + 1].split(",") if t]
        del argv[i:i + 2]
    n_clips = 64
    for a in argv:
        if a.isdigit():
            n_clips = int(a)
    modes = dict(MODES)
    if "--all_modes" in argv:
        modes.update(EXTRA_MODES)
    state = ckpt_lib.load_checkpoint("checkpoint/serving_ckpt")
    if state is None:
        raise SystemExit("no checkpoint/serving_ckpt/checkpoint.pkl — run "
                         "scripts/train_synth_ckpt.py cain first")
    # checkpoint save maps every leaf through np.asarray, which wraps the
    # arch dict's strings/scalars in 0-d arrays — unwrap them
    def unwrap(v):
        if isinstance(v, np.ndarray):
            return v.item() if v.ndim == 0 else tuple(v.tolist())
        if isinstance(v, (tuple, list)):
            return tuple(unwrap(e) for e in v)
        return v

    arch = {k: unwrap(v) for k, v in state["arch"].items()}
    epoch = state.get("epoch", "?")

    ds = SyntheticSeptuplet(model="cain", mode="val", size=(256, 448),
                            length=8 * n_clips)
    clips = [ds[i] for i in range(n_clips)]

    preds = {}
    psnr_gt = {}

    def eval_modes(modes, ckpt_state):
        for label, over in modes.items():
            if rows is not None and not any(s in label for s in rows):
                continue
            # per-group graphs ride the r5 first-class fuse_groups Config
            # field (string token, models/cain.parse_fuse_spec); rows
            # without one must override whatever the arch recorded
            over = {"fuse_groups": None, **over}
            cfg = Config(**{**{k: v for k, v in arch.items()
                               if k in Config.__dataclass_fields__}, **over})
            system = SceneAdaptiveInterpolation(cfg)
            system.load_state_dict(ckpt_state["system"])
            ps, ss, outs = [], [], []
            for frames, _ in clips:
                losses, pred = system.run_validation_iter(frames[None])
                ps.append(losses["psnr"])
                ss.append(losses["ssim"])
                outs.append(np.asarray(pred, np.float32))
            preds[label] = outs
            psnr_gt[label] = ps
            print(f"{label:32s}: PSNR {np.mean(ps):7.3f} +- "
                  f"{np.std(ps):5.3f}  SSIM {np.mean(ss):.4f} +- "
                  f"{np.std(ss):.4f}  (min {np.min(ps):7.3f})", flush=True)

    if not ckpts_only:
        eval_modes(modes, state)

    # serving-NATIVE checkpoint (scripts/train_synth_ckpt.py cain_serving):
    # trained WITH the serving graph — its serving-mode quality is the
    # self-consistent deployment answer to the zero-fuse deviation. Also
    # evaluated under exact math: pure-boundary-semantics predicts the
    # quality ordering flips on this checkpoint.
    native = (None if ckpts_only else
              ckpt_lib.load_checkpoint("checkpoint/cain_serving_native_ckpt"))
    if native is not None:
        eval_modes({"native ckpt, serving (pad8 fuse)": dict(
            pad_multiple=8, fuse_pad="true"),
            "native ckpt, exact (pad128 refl)": dict(
                pad_multiple=128, fuse_pad="false")}, native)

    # serving-NATIVE under the RZZZZ graph (train_synth_ckpt.py
    # cain_serving_rzzzz): reflect the first residual group only — the
    # group the pareto localization shows owns 0.95 of the zero-fuse
    # 1.88 dB — zero-fuse the rest. Evaluated under its own graph.
    rz = ckpt_lib.load_checkpoint("checkpoint/cain_serving_rzzzz_ckpt")
    if rz is not None:
        eval_modes({"nativeRZ ckpt, serving (RZZZZ)": dict(
            pad_multiple=8, fuse_pad="true", fuse_groups="RZZZZ")}, rz)

    # RCAB-granular boundary-fuse NATIVE checkpoints (cain.boundary_fuse;
    # scripts/measure_r4e.sh trains the pareto-selected point): evaluated
    # under their own >=1000 fps training graph.
    for bw in ("bw1", "bw2", "bw4", "bw1x5"):
        st = ckpt_lib.load_checkpoint(f"checkpoint/cain_serving_{bw}_ckpt")
        if st is not None:
            eval_modes({f"native{bw} ckpt, serving ({bw})": dict(
                pad_multiple=8, fuse_pad="true", fuse_groups=bw)}, st)

    # seed REPLICATES (train_synth_ckpt.py --seed N appends _sN): error
    # bars for the checkpoint-level serving comparisons — the r4 deltas
    # (-0.85 native vs -1.88 exact-under-serving) rest on single runs
    # with an admitted few-tenths-dB run-to-run spread (VERDICT r4
    # item 5). Each replicate is evaluated under its training graph.
    import glob as glob_lib
    for rep in sorted(glob_lib.glob("checkpoint/cain_serving_*_ckpt_s*")):
        tag = os.path.basename(rep)  # cain_serving_<graph>_ckpt_s<N>
        graph = tag[len("cain_serving_"):].split("_ckpt_s")[0]
        seed_id = tag.split("_ckpt_s")[1]
        st = ckpt_lib.load_checkpoint(rep)
        if st is None:
            continue
        over = dict(pad_multiple=8, fuse_pad="true")
        if graph not in ("native", "ft"):
            # graph-specific replicate (rzzzz/bw*); "native" and "ft"
            # (the migration fine-tune replicate) both run the plain
            # zero-fuse serving graph
            over["fuse_groups"] = graph.upper() if graph == "rzzzz" else graph
        label = ("migrated" if graph == "ft" else f"native{graph}")
        eval_modes({f"{label} s{seed_id} ckpt, serving": over}, st)
    # exact-anchor and exact-ft-control replicates (cain / cain_exact_ft
    # --seed N): the anchor's and the migration control's run-to-run
    # spread, evaluated under exact semantics
    for rep in sorted(glob_lib.glob("checkpoint/serving_ckpt_s*")):
        seed_id = os.path.basename(rep).split("_s")[-1]
        st = ckpt_lib.load_checkpoint(rep)
        if st is not None:
            eval_modes({f"exact s{seed_id} ckpt, exact (pad128 refl)": dict(
                pad_multiple=128, fuse_pad="false")}, st)
    for rep in sorted(glob_lib.glob("checkpoint/cain_exact_ft_ckpt_s*")):
        seed_id = os.path.basename(rep).split("_s")[-1]
        st = ckpt_lib.load_checkpoint(rep)
        if st is not None:
            eval_modes({f"exact-ft control s{seed_id}, exact": dict(
                pad_multiple=128, fuse_pad="false")}, st)
    # bw1-migration replicates (cain_bw1_ft --seed N): graph-independence
    # of the migration cost, replicated across seeds
    for rep in sorted(glob_lib.glob("checkpoint/cain_bw1_ft_ckpt_s*")):
        seed_id = os.path.basename(rep).split("_s")[-1]
        st = ckpt_lib.load_checkpoint(rep)
        if st is not None:
            eval_modes({f"migrated-bw1 s{seed_id} ckpt, serving (bw1)":
                        dict(pad_multiple=8, fuse_pad="true",
                             fuse_groups="bw1")}, st)

    # serving MIGRATION checkpoint: exact-trained weights fine-tuned a few
    # epochs under the serving graph (train_synth_ckpt.py cain_serving_ft
    # --init_from checkpoint/serving_ckpt) — the recovery cost for a user
    # moving trained exact weights to the 1015-fps mode
    ft = (None if ckpts_only else
          ckpt_lib.load_checkpoint("checkpoint/cain_serving_ft_ckpt"))
    if ft is not None:
        eval_modes({"migrated ckpt, serving (pad8 fuse)": dict(
            pad_multiple=8, fuse_pad="true")}, ft)

    # migration CONTROL (train_synth_ckpt.py cain_exact_ft --init_from
    # serving_ckpt): same extra epochs/LR under the EXACT graph — the
    # baseline that separates serving-quality recovery from plain extra
    # training (the migrated row must be compared to THIS, not the ep-250
    # anchor)
    ctl = ckpt_lib.load_checkpoint("checkpoint/cain_exact_ft_ckpt")
    if ctl is not None:
        eval_modes({"exact-ft control, exact (pad128 refl)": dict(
            pad_multiple=128, fuse_pad="false")}, ctl)

    # migration to the bw1 graph (cain_bw1_ft): same recipe as the
    # zero-fuse migration but onto the 1026-fps boundary-fuse graph
    bw1ft = ckpt_lib.load_checkpoint("checkpoint/cain_bw1_ft_ckpt")
    if bw1ft is not None:
        eval_modes({"migrated-bw1 ckpt, serving (bw1)": dict(
            pad_multiple=8, fuse_pad="true", fuse_groups="bw1")}, bw1ft)

    exact, serving = list(MODES)[0], list(MODES)[1]
    print(f"\ncheckpoint epoch {epoch}, {n_clips} val clips @448x256, "
          f"dtype {arch.get('dtype')}")
    if exact in preds and serving in preds:
        cross = [float(metrics_lib.calc_metrics(
            jnp.asarray(a), jnp.asarray(b))[0])
            for a, b in zip(preds[serving], preds[exact])]
        print(f"  PSNR(serving pred, exact pred): mean {np.mean(cross):.3f}")
        print(f"  serving-vs-exact quality delta: "
              f"{np.mean(psnr_gt[exact]) - np.mean(psnr_gt[serving]):+.4f} dB")
    exact_mean = (np.mean(psnr_gt[exact]) if exact in psnr_gt else anchor)
    if exact_mean is None:
        return
    for key, label in [
            ("exact-math (pad128 border-corr)",
             "border-corrected-vs-exact delta (same math)"),
            ("serving-exactmath (pad8 reflect)",
             "pad8-only (exact-math body) delta"),
            ("native ckpt, serving (pad8 fuse)",
             "serving-NATIVE ckpt serving-mode PSNR minus exact-ckpt "
             "exact-mode PSNR"),
            ("native ckpt, exact (pad128 refl)",
             "serving-NATIVE ckpt under exact math minus its serving "
             "mode"),
            ("nativeRZ ckpt, serving (RZZZZ)",
             "RZZZZ-NATIVE ckpt serving-mode PSNR minus exact-ckpt "
             "exact-mode PSNR"),
            ("nativebw1 ckpt, serving (bw1)",
             "bw1-NATIVE ckpt serving-mode PSNR minus exact-ckpt "
             "exact-mode PSNR"),
            ("nativebw2 ckpt, serving (bw2)",
             "bw2-NATIVE ckpt serving-mode PSNR minus exact-ckpt "
             "exact-mode PSNR"),
            ("nativebw4 ckpt, serving (bw4)",
             "bw4-NATIVE ckpt serving-mode PSNR minus exact-ckpt "
             "exact-mode PSNR"),
            ("nativebw1x5 ckpt, serving (bw1x5)",
             "bw1x5-NATIVE ckpt serving-mode PSNR minus exact-ckpt "
             "exact-mode PSNR"),
            ("migrated ckpt, serving (pad8 fuse)",
             "MIGRATED ckpt serving-mode PSNR minus exact-ckpt "
             "exact-mode PSNR"),
            ("exact-ft control, exact (pad128 refl)",
             "exact-graph ft CONTROL (same extra epochs/LR) minus "
             "exact-ckpt exact-mode PSNR"),
            ("migrated-bw1 ckpt, serving (bw1)",
             "MIGRATED-to-bw1 ckpt serving-mode PSNR minus exact-ckpt "
             "exact-mode PSNR")]:
        if key not in psnr_gt:
            continue
        if key == "native ckpt, exact (pad128 refl)":
            if "native ckpt, serving (pad8 fuse)" not in psnr_gt:
                continue
            base = np.mean(psnr_gt["native ckpt, serving (pad8 fuse)"])
        else:
            base = exact_mean
        print(f"  {label}: {np.mean(psnr_gt[key]) - base:+.4f} dB")


if __name__ == "__main__":
    main()
