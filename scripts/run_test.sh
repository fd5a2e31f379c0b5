#!/bin/bash
# x2 slow-motion on a custom frame directory (reference scripts/run_test.sh);
# run twice for x4.
python -m meta_interpolation_tpu.main \
    --exp_name slomo-test \
    --model cain --mode test --dataset test \
    --data_root demo --img_fmt png \
    --number_of_evaluation_steps_per_iter 1 "$@"
