#!/bin/bash
# Round-4e follow-up — runs after measure_r4d.sh (one chip, one remote
# compile server: serialize — CLAUDE.md). Attacks the remaining gap in
# the north-star conjunction from the checkpoint side with the graph
# the pareto localization says is optimal: the all-zero-fuse NATIVE
# checkpoint costs -0.85 dB at 1015 fps, and RZZZZ (reflect the first
# residual group only) recovers 0.95 of the 1.88 dB zero-fuse cost on
# exact-trained weights. A NATIVE RZZZZ checkpoint measures whether
# co-training under the first-group-reflect graph lands near the exact
# anchor at the ~RZZZR-class throughput (898+ fps; RZZZZ fps cell from
# measure_r4d.sh).
set -x
cd /root/repo
python scripts/train_synth_ckpt.py cain_serving_rzzzz 250 > /tmp/train_cain_rzzzz.log 2>&1
python scripts/serving_quality.py 64                      > /tmp/serving_quality_r4e.log 2>&1
# SuperSloMo at R=16: the one model whose R=8 clamp is ACTIVE on the
# standard set (6.9% of sampled displacements beyond R, max 15.9 px) —
# the histogram rule says size R to the predicted-flow distribution,
# so measure the rule's own recommendation.
python scripts/warp_quality.py superslomo 64 --range 16   > /tmp/wq_superslomo_r16.log 2>&1
echo MEASURE_R4E_DONE
