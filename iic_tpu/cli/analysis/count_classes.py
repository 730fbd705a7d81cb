"""Analysis: label-distribution count over a segmentation dataset's mapping
set. Mirror of code/scripts/segmentation/analysis/count_classes.py."""

import numpy as np


def main(argv=None):
    import sys

    from iic_tpu.cli._args import parse_seg_args

    argv = sys.argv[1:] if argv is None else argv
    if "--model_inds" in argv:
        # reference interface (count_classes.py:13): count the datasets
        # of STORED runs
        import argparse

        from iic_tpu.cli.analysis.render_general import load_seg_run
        parser = argparse.ArgumentParser()
        parser.add_argument("--model_inds", type=int, nargs="+",
                            required=True)
        parser.add_argument("--out_root", type=str, default="out")
        args = parser.parse_args(argv)
        out = None
        for model_ind in args.model_inds:
            print(f"model {model_ind}")
            cfg, _, _, _ = load_seg_run(args.out_root, model_ind)
            out = _count(cfg)
        return out
    cfg = parse_seg_args(argv)
    cfg.finalize(twohead=True)
    return _count(cfg)


def _count(cfg):
    from iic_tpu.data.seg_pipeline import SegMappingLoader, seg_partitions

    if not hasattr(cfg, "mapping_assignment_partitions"):
        _, map_a, map_t = seg_partitions(cfg)
        cfg.mapping_assignment_partitions = map_a
        cfg.mapping_test_partitions = map_t

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
