#!/bin/bash
# Sequential retraining of the four synthetic quality-evidence checkpoints
# (checkpoint/ is gitignored and wiped between rounds — see CLAUDE.md).
# Order: CAIN first (gates the serving fuse-ablation work), then the three
# warp models. SuperSloMo now trains 150 epochs (VERDICT r3 item 2:
# convergence parity with RRIN ep150 / VoxelFlow ep250).
set -x
cd /root/repo
python scripts/train_synth_ckpt.py cain 250       > /tmp/train_cain.log 2>&1
python scripts/train_synth_ckpt.py rrin 150       > /tmp/train_rrin.log 2>&1
python scripts/train_synth_ckpt.py voxelflow 250  > /tmp/train_voxelflow.log 2>&1
python scripts/train_synth_ckpt.py superslomo 150 > /tmp/train_superslomo.log 2>&1
echo DONE_ALL
