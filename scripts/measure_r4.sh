#!/bin/bash
# Round-4 measurement campaign — run AFTER scripts/train_all_ckpts.sh.
# Serialized: everything shares the one chip + remote compile server.
set -x
cd /root/repo
python scripts/warp_quality.py voxelflow 64          > /tmp/wq_voxelflow.log 2>&1
python scripts/warp_quality.py rrin 64               > /tmp/wq_rrin.log 2>&1
python scripts/warp_quality.py superslomo 64         > /tmp/wq_superslomo.log 2>&1
python scripts/warp_quality.py rrin 16 --stress      > /tmp/wq_rrin_stress.log 2>&1
python scripts/warp_quality.py voxelflow 16 --stress > /tmp/wq_voxelflow_stress.log 2>&1
python scripts/train_synth_ckpt.py cain_serving 250  > /tmp/train_cain_serving.log 2>&1
python scripts/serving_quality.py 64                 > /tmp/serving_quality_r4.log 2>&1
python scripts/dain_hd_pipeline.py                   > /tmp/dain_hd_pipeline.log 2>&1
echo MEASURE_DONE
