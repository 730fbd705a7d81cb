"""CLI: single-head IID+ overclustering on greyscale datasets.
Mirror of code/scripts/cluster/cluster_greyscale.py (examples/commands.txt:48)."""

from iic_tpu.cli._args import parse_cluster_args
from iic_tpu.train import train_cluster_single


def main(argv=None):
    cfg = parse_cluster_args(argv, defaults={"mode": "IID+"})
    cfg.finalize(twohead=False, sobel=False)
    return train_cluster_single(cfg)


if __name__ == "__main__":
    main()
