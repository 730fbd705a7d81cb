"""CLI: KL-triplets baseline on greyscale datasets. Mirror of
code/scripts/cluster/baselines/triplets_greyscale.py."""

from iic_tpu.cli._args import parse_cluster_args
from iic_tpu.train.triplets_trainer import train_triplets


def main(argv=None):
    cfg = parse_cluster_args(argv, defaults={"mode": "IID"})
    if cfg.output_k is None:
        cfg.output_k = cfg.gt_k
    cfg.finalize(twohead=False, sobel=False)
    if cfg.arch.startswith("ClusterNet") and "Triplets" not in cfg.arch:
        cfg.arch = "TripletsNet6c"
    return train_triplets(cfg)


if __name__ == "__main__":
    main()
