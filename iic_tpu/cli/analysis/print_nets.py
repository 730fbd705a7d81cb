"""Analysis: print model structure (param tree shapes and counts).
Mirror of code/scripts/cluster/analysis/print_nets.py."""

import argparse
from types import SimpleNamespace

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from iic_tpu import models

    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", type=str, default="ClusterNet5gTwoHead")
    parser.add_argument("--input_sz", type=int, default=64)
    parser.add_argument("--in_channels", type=int, default=5)
    parser.add_argument("--output_k", type=int, default=10)
    parser.add_argument("--output_k_A", type=int, default=70)
    parser.add_argument("--output_k_B", type=int, default=10)
    parser.add_argument("--num_sub_heads", type=int, default=5)
    args = parser.parse_args(argv)

    cfg = SimpleNamespace(**vars(args), batchnorm_track=True)
    net = models.build(args.arch, cfg)
    dummy = jnp.zeros((1, args.in_channels, args.input_sz, args.input_sz))
    two_head = "TwoHead" in args.arch
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), dummy,
        heads=("A", "B") if two_head else None)

    total = 0
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for path, v in flat:
        n = int(np.prod(v.shape))
        total += n
        print(f"{jax.tree_util.keystr(path)}: {tuple(v.shape)} ({n})")
    print(f"total params: {total:,}")
    return total


if __name__ == "__main__":
    main()
