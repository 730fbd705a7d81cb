"""CLI: Doersch context-prediction segmentation baseline. Mirror of
code/scripts/segmentation/baselines/doersch.py."""

from iic_tpu.cli._args import parse_seg_args
from iic_tpu.train.seg_baseline_trainers import train_seg_baseline


def main(argv=None):
    cfg = parse_seg_args(argv, defaults={"arch": "SegmentationNet10aDoersch"})
    cfg.finalize(twohead=False)
    return train_seg_baseline(cfg, kind="doersch")


if __name__ == "__main__":
    main()
