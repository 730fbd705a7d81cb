"""CLI: two-head IIC clustering on colour datasets with sobel filtering.
Mirror of code/scripts/cluster/cluster_sobel_twohead.py; same flags
(examples/commands.txt:18-27)."""

from iic_tpu.cli._args import parse_cluster_args
from iic_tpu.train import train_cluster_twohead


def main(argv=None):
    cfg = parse_cluster_args(argv)
    cfg.lamb_A = cfg.lamb
    cfg.lamb_B = cfg.lamb
    cfg.finalize(twohead=True, sobel=True)
    return train_cluster_twohead(cfg)


if __name__ == "__main__":
    main()
