"""CLI: Doersch context-prediction segmentation baseline. Mirror of
code/scripts/segmentation/baselines/doersch.py."""

from iic_tpu.cli._args import parse_seg_args
from iic_tpu.train.seg_baseline_trainers import train_seg_baseline


def main(argv=None):
    # use_doersch_datasets: colour-dropping on, like the reference script
    # (doersch.py:98); the other seg scripts set it False
    cfg = parse_seg_args(argv, defaults={"arch": "SegmentationNet10aDoersch",
                                         "use_doersch_datasets": True})
    cfg.finalize(twohead=False)
    return train_seg_baseline(cfg, kind="doersch")


if __name__ == "__main__":
    main()
