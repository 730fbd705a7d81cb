"""CLI: single-head IID+ segmentation (overclustering). Mirror of
code/scripts/segmentation/segmentation.py (examples/commands.txt:94-105)."""

from iic_tpu.cli._args import parse_seg_args
from iic_tpu.train.seg_trainer import train_segmentation_single


def main(argv=None):
    cfg = parse_seg_args(argv, defaults={"mode": "IID+"})
    cfg.finalize(twohead=False)
    return train_segmentation_single(cfg)


if __name__ == "__main__":
    main()
