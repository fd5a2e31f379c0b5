#!/bin/bash
# RRIN preset (reference scripts/run_rrin.sh: 0 inner steps = plain fine-tune)
python -m meta_interpolation_tpu.main \
    --exp_name rrin-ft \
    --model rrin --loss "1*L1" --optimizer Adam \
    --batch_size 8 --val_batch_size 1 \
    --inner_lr 1e-5 --outer_lr 1e-5 \
    --total_iter_per_epoch 5000 \
    --number_of_training_steps_per_iter 0 \
    --number_of_evaluation_steps_per_iter 0 \
    --log_iter 10 "$@"
