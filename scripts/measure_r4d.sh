#!/bin/bash
# Round-4d follow-up — runs after measure_r4c.sh finishes (one chip, one
# remote compile server: serialize — CLAUDE.md). Closes the two gaps the
# r4c restart left open:
#   1. The serving-NATIVE checkpoint row (BASELINE.md round-4 table) was
#      pre-wipe evidence; the checkpoint no longer exists. Retrain
#      cain_serving 250 ep and re-run serving_quality so every number in
#      the table has a living checkpoint + log behind it.
#   2. The r4c migration fine-tune (cain_serving_ft, 25 ep @ outer_lr
#      1e-4) DEGRADED the exact checkpoint (44.5 -> 43.1 train-val;
#      -4.1 dB vs exact anchor at n=64) — from-scratch LR is too hot for
#      a converged init. Redo at 1e-5 to measure the real migration cost.
#   3. fps cells for the two r4c-added pareto points (RZZZZ / ZZZZR).
set -x
cd /root/repo
python scripts/train_synth_ckpt.py cain_serving 250   > /tmp/train_cain_native.log 2>&1
python scripts/train_synth_ckpt.py cain_serving_ft 25 \
    --init_from checkpoint/serving_ckpt --outer_lr 1e-5 \
                                                      > /tmp/train_cain_ft_lr5.log 2>&1
python scripts/serving_quality.py 64                  > /tmp/serving_quality_r4d.log 2>&1
python scripts/serving_pareto.py --fps_only --only RZZZZ,ZZZZR \
                                                      > /tmp/pareto_fps_r4d.log 2>&1
echo MEASURE_R4D_DONE
