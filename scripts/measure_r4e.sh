#!/bin/bash
# Round-4e follow-up — runs after measure_r4d.sh (one chip, one remote
# compile server: serialize — CLAUDE.md). Two jobs:
#
# 1. SuperSloMo at R=16 (quick, first so it always lands): the one
#    model whose R=8 clamp is ACTIVE on the standard set (6.9% of
#    sampled displacements beyond R, max 15.9 px) — the histogram rule
#    says size R to the predicted-flow distribution; measure the rule's
#    own recommendation.
# 2. North-star conjunction via RCAB-granular boundary fuse
#    (cain.boundary_fuse): the r4c pareto shows the zero-fuse 1.88 dB
#    concentrates in the EARLIEST body convs and whole reflect groups
#    cost ~58 fps; reflecting just the first 1-2 RCABs (or the first
#    of every group) should keep the graph above 1000 fps. Sweep bw1 /
#    bw2 / bw1x5 (both axes, exact-trained ckpt), pick the best
#    >=1002 fps point, train a NATIVE checkpoint under that graph, and
#    measure it — the all-zero-fuse native ckpt costs -0.85 dB at
#    1015 fps; first-RCAB border fidelity should cut that.
set -x
cd /root/repo
python scripts/warp_quality.py superslomo 64 --range 16   > /tmp/wq_superslomo_r16.log 2>&1
# both axes per bw point; anchor pinned to the r4c-measured exact mean
# so dPSNR stays comparable across sessions (bw4 dropped: bracketed by
# bw2 and the RZZZZ group point)
python scripts/serving_pareto.py 64 --only bw1,bw2 --anchor 48.273 \
                                                          > /tmp/pareto_bw_r4e.log 2>&1
SEL=$(python scripts/pick_bw_point.py /tmp/pareto_bw_r4e.log 2>>/tmp/pareto_bw_r4e.log)
echo "selected native-train point: $SEL"
python scripts/train_synth_ckpt.py "$SEL" 250             > /tmp/train_cain_bw.log 2>&1
python scripts/serving_quality.py 64 --ckpts_only --anchor 48.273 \
                                                          > /tmp/serving_quality_r4e.log 2>&1
echo MEASURE_R4E_DONE
