#!/bin/bash
# SuperSloMo preset (reference scripts/run_superslomo.sh: composite Super loss)
python -m meta_interpolation_tpu.main \
    --exp_name superslomo-metasgd \
    --model superslomo --loss "1*Super" --optimizer Adam \
    --batch_size 4 --val_batch_size 1 \
    --inner_lr 1e-5 --outer_lr 1e-5 \
    --total_iter_per_epoch 5000 \
    --number_of_training_steps_per_iter 1 \
    --number_of_evaluation_steps_per_iter 1 \
    --log_iter 10 --metasgd "$@"
