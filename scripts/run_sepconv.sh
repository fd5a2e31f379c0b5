#!/bin/bash
# SepConv preset (reference scripts/run_sepconv.sh: Adamax, bs3, 3 inner steps)
python -m meta_interpolation_tpu.main \
    --exp_name sepconv-i3-metasgd \
    --model sepconv --loss "1*L1" --optimizer Adamax \
    --batch_size 3 --val_batch_size 1 \
    --inner_lr 1e-5 --outer_lr 1e-5 \
    --total_iter_per_epoch 5000 \
    --number_of_training_steps_per_iter 3 \
    --number_of_evaluation_steps_per_iter 3 \
    --log_iter 10 --metasgd "$@"
