"""Analysis: label-distribution count over a segmentation dataset's mapping
set. Mirror of code/scripts/segmentation/analysis/count_classes.py."""

import numpy as np


def main(argv=None):
    from iic_tpu.cli._args import parse_seg_args
    from iic_tpu.data.seg_pipeline import SegMappingLoader

    cfg = parse_seg_args(argv)
    cfg.finalize(twohead=True)
    if not hasattr(cfg, "mapping_assignment_partitions"):
        from iic_tpu.data.seg_pipeline import segmentation_create_dataloaders
        segmentation_create_dataloaders(cfg)

    loader = SegMappingLoader(cfg, cfg.mapping_assignment_partitions)
    counts = np.zeros(cfg.gt_k, np.int64)
    masked_out = 0
    for _, labels, masks in loader:
        m = masks.astype(bool)
        vals, cnts = np.unique(labels[m], return_counts=True)
        for v, c in zip(vals, cnts):
            if 0 <= v < cfg.gt_k:
                counts[v] += c
        masked_out += (~m).sum()
    total = counts.sum()
    for c in range(cfg.gt_k):
        print(f"class {c}: {counts[c]} ({counts[c] / max(total, 1):.4f})")
    print(f"masked out: {masked_out}")
    return counts


if __name__ == "__main__":
    main()
