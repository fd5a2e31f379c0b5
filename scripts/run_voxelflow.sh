#!/bin/bash
# VoxelFlow preset (reference scripts/run_voxelflow.sh: MSE loss, metasgd)
python -m meta_interpolation_tpu.main \
    --exp_name voxelflow-metasgd \
    --model voxelflow --loss "1*MSE" --optimizer Adam \
    --batch_size 8 --val_batch_size 1 \
    --inner_lr 1e-5 --outer_lr 1e-5 \
    --total_iter_per_epoch 5000 \
    --number_of_training_steps_per_iter 1 \
    --number_of_evaluation_steps_per_iter 1 \
    --log_iter 10 --metasgd "$@"
