"""CLI: two-head IIC clustering on greyscale datasets (MNIST).
Mirror of code/scripts/cluster/cluster_greyscale_twohead.py
(examples/commands.txt:30)."""

from iic_tpu.cli._args import parse_cluster_args
from iic_tpu.train import train_cluster_twohead


def main(argv=None):
    cfg = parse_cluster_args(argv)
    cfg.finalize(twohead=True, sobel=False)
    return train_cluster_twohead(cfg)


if __name__ == "__main__":
    main()
