#!/bin/bash
# Round-4c campaign — restart after the mid-round machine wipe killed
# measure_r4/r4b (checkpoints + compile cache + /tmp all gone). Re-trains
# the checkpoints the pending evidence needs and pulls the remaining
# VERDICT-r3 measurements, highest judge-value first. Serialized: one
# chip + one remote compile server (CLAUDE.md). fps pareto ran separately
# first (checkpoint-free).
set -x
cd /root/repo
# -- CAIN serving-quality chain -------------------------------------------
python scripts/train_synth_ckpt.py cain 250          > /tmp/train_cain.log 2>&1
python scripts/train_synth_ckpt.py cain_serving_ft 25 \
    --init_from checkpoint/serving_ckpt              > /tmp/train_cain_ft.log 2>&1
python scripts/serving_pareto.py 64 --psnr_only      > /tmp/pareto_psnr_r4c.log 2>&1
python scripts/serving_quality.py 64                 > /tmp/serving_quality_r4c.log 2>&1
# -- bounded-warp chain ----------------------------------------------------
python scripts/train_synth_ckpt.py rrin 150          > /tmp/train_rrin.log 2>&1
python scripts/warp_quality.py rrin 16 --stress      > /tmp/wq_rrin_stress.log 2>&1
python scripts/train_synth_ckpt.py superslomo 150    > /tmp/train_superslomo.log 2>&1
python scripts/warp_quality.py superslomo 64         > /tmp/wq_superslomo.log 2>&1
python scripts/warp_quality.py superslomo 16 --stress > /tmp/wq_superslomo_stress.log 2>&1
# -- checkpoint-free tails -------------------------------------------------
python scripts/dain_hd_pipeline.py                   > /tmp/dain_hd_pipeline.log 2>&1
python bench.py                                      > /tmp/bench_headline.log 2>&1
python bench.py --exact                              > /tmp/bench_exact.log 2>&1
echo MEASURE_R4C_DONE
