"""Legacy DAIN trainer (reference ``legacy/train_dain.py``).

Reference defaults (:114, :210, :225): Adamax over ``rectifyNet`` ONLY
(both inner and outer optimizers), charbonnier pixel loss (part_loss with
the offset/sym terms at their zero default weights). Everything but the
rectify net stays frozen — the driver masks both loops with the model's
inner mask.

    python -m meta_interpolation_tpu.legacy.train_dain \
        --meta_algorithm maml --batch_size 1 --crop_size 192
"""
from .driver import LegacyPreset, run

PRESET = LegacyPreset(model="dain", inner_rule="Adamax",
                      outer_opt="Adamax", loss_spec="charbonnier",
                      inner_lr=1e-5, outer_lr=5e-5,
                      mask_rectify_only=True)


def main(argv=None):
    return run(PRESET, argv)


if __name__ == "__main__":
    main()
