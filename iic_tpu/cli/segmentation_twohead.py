"""CLI: two-head IIC segmentation. Mirror of
code/scripts/segmentation/segmentation_twohead.py (examples/commands.txt:74-89)."""

from iic_tpu.cli._args import parse_seg_args
from iic_tpu.train.seg_trainer import train_segmentation_twohead


def main(argv=None):
    cfg = parse_seg_args(argv)
    cfg.finalize(twohead=True)
    return train_segmentation_twohead(cfg)


if __name__ == "__main__":
    main()
