"""Analysis: reload a trained clustering run and re-evaluate.
Mirror of code/scripts/cluster/analysis/eval.py."""

import argparse
import dataclasses
import os
import pickle

from iic_tpu.train.config import ClusterConfig


def load_run(out_root, model_ind):
    """Reload (config, net, state) for a stored run."""
    from iic_tpu.train import checkpoint as ckpt
    from iic_tpu.train.cluster_trainer import build_net_and_state

    run_dir = os.path.join(out_root, str(model_ind))
    with open(os.path.join(run_dir, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    fields = {f.name for f in dataclasses.fields(ClusterConfig)}
    config = ClusterConfig(**{k: v for k, v in meta["config"].items()
                              if k in fields})
    for f in dataclasses.fields(ClusterConfig):
        v = getattr(config, f.name)
        if isinstance(v, list):
            setattr(config, f.name, tuple(v))
    net, tx, template = build_net_and_state(config)
    name = "best" if os.path.exists(
        os.path.join(run_dir, "best.ckpt")) else "latest"
    state, history, last_epoch = ckpt.load_checkpoint(config, template,
                                                      name=name)
    return config, net, state, history


def main(argv=None):
    from iic_tpu.data.pipeline import (
        cluster_create_dataloaders, cluster_twohead_create_dataloaders)
    from iic_tpu.evals import cluster_eval
    from iic_tpu.train.cluster_trainer import make_eval_apply

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--out_root", type=str, default="out")
    args = parser.parse_args(argv)

    config, net, state, history = load_run(args.out_root, args.model_ind)
    if config.twohead:
        _, _, map_a, map_t = cluster_twohead_create_dataloaders(config)
        apply_fn = make_eval_apply(net, state, config, head="B")
    else:
        _, map_a, map_t = cluster_create_dataloaders(config)
        apply_fn = make_eval_apply(net, state, config, head=None)
    _, stats = cluster_eval(config, apply_fn, map_a, map_t)
    print(stats)
    return stats


if __name__ == "__main__":
    main()
