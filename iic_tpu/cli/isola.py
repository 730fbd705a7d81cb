"""CLI: Isola adjacency-prediction segmentation baseline. Mirror of
code/scripts/segmentation/baselines/isola.py."""

from iic_tpu.cli._args import parse_seg_args
from iic_tpu.train.seg_baseline_trainers import train_seg_baseline


def main(argv=None):
    cfg = parse_seg_args(argv, defaults={"arch": "SegmentationNet10aIsola"})
    cfg.finalize(twohead=False)
    return train_seg_baseline(cfg, kind="isola")


if __name__ == "__main__":
    main()
