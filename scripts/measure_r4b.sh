#!/bin/bash
# Round-4 follow-up campaign — chained after measure_r4.sh by a watcher.
# Re-runs the two steps that failed there, then the serving-migration
# experiment and the final evidence pulls:
#   * pareto PSNR points 6-7: first attempt OOMed — load_state_dict kept
#     checkpoint params as numpy, so every eval iter re-uploaded ~600 MB
#     through the leaking axon tunnel (fixed: device_put at load).
#   * pareto fps: transient TPU FAILED_PRECONDITION right after that OOM
#     kill; retried here in a fresh process.
# Serialized — one chip + one remote compile server (CLAUDE.md).
set -x
cd /root/repo
python scripts/serving_pareto.py 64 --psnr_only --start 6 --anchor 48.273 \
                                                      > /tmp/pareto_psnr5.log 2>&1
python scripts/serving_pareto.py --fps_only           > /tmp/pareto_fps2.log 2>&1
python scripts/train_synth_ckpt.py cain_serving_ft 25 \
    --init_from checkpoint/serving_ckpt              > /tmp/train_cain_ft.log 2>&1
python scripts/serving_quality.py 64            > /tmp/serving_quality_final.log 2>&1
python bench.py                                       > /tmp/bench_headline.log 2>&1
python bench.py --exact                               > /tmp/bench_exact.log 2>&1
echo MEASURE_R4B_DONE
