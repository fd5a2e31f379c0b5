#!/bin/bash
# Sequential retraining of the synthetic quality-evidence checkpoints
# (checkpoint/ is gitignored and may be wiped between rounds — CLAUDE.md).
# Order: CAIN first (anchors the serving measurements), then the serving
# migration pipeline (the bench.py --serving headline point), then the
# three warp models. SuperSloMo trains the reference composite loss minus
# its env-blocked perceptual term (1*SuperNoPrcp, r5). Training is
# seed-deterministic end-to-end, so these runs reproduce the committed
# BASELINE.md tables (r4 note: to 3 decimals).
set -x
cd /root/repo
python scripts/train_synth_ckpt.py cain 250       > /tmp/train_cain.log 2>&1
# serving headline (migrate-then-serve, BASELINE.md r5): fine-tune the
# exact anchor under the fastest >=1000 fps graph + the compute-matched
# exact-graph control that defines the migration cost
python scripts/train_synth_ckpt.py cain_bw1_ft 50 \
    --init_from checkpoint/serving_ckpt --outer_lr 1e-5 \
                                                  > /tmp/train_bw1_ft.log 2>&1
python scripts/train_synth_ckpt.py cain_exact_ft 50 \
    --init_from checkpoint/serving_ckpt --outer_lr 1e-5 \
                                                  > /tmp/train_exact_ft.log 2>&1
python scripts/train_synth_ckpt.py rrin 150       > /tmp/train_rrin.log 2>&1
python scripts/train_synth_ckpt.py voxelflow 250  > /tmp/train_voxelflow.log 2>&1
python scripts/train_synth_ckpt.py superslomo 150 > /tmp/train_superslomo.log 2>&1
echo DONE_ALL
