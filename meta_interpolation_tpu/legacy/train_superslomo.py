"""Legacy SuperSloMo trainer (reference ``legacy/train_superslomo.py``).

Reference defaults (:113-119, :288): Adam inner + outer optimizers and the
SuperSloMo composite loss (204*recn + 102*warp + 0.005*perceptual +
smoothness — our ``1*Super`` spec, core/losses.py). Note the perceptual
term needs torchvision VGG16 weights; without them the loss builder warns
and runs random-init features (documented deviation, VERDICT item 9).

    python -m meta_interpolation_tpu.legacy.train_superslomo \
        --meta_algorithm maml --batch_size 2
"""
from .driver import LegacyPreset, run

PRESET = LegacyPreset(model="superslomo", inner_rule="Adam",
                      outer_opt="Adam", loss_spec="1*Super",
                      inner_lr=1e-5, outer_lr=1e-4)


def main(argv=None):
    return run(PRESET, argv)


if __name__ == "__main__":
    main()
