"""Analysis: render example images + predictions for a trained clustering
run. Mirror of code/scripts/cluster/analysis/print_examples.py."""

import argparse
import os

import numpy as np


def main(argv=None):
    from iic_tpu.cli.analysis.eval import load_run
    from iic_tpu.data.pipeline import (
        cluster_create_dataloaders, cluster_twohead_create_dataloaders)
    from iic_tpu.train.cluster_trainer import make_eval_apply
    from iic_tpu.utils.render import render

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--out_root", type=str, default="out")
    # --num_imgs is the reference's name (print_examples.py); kept as the
    # primary with --num_examples as the pre-existing alias
    parser.add_argument("--num_imgs", "--num_examples",
                        dest="num_examples", type=int, default=20)
    args = parser.parse_args(argv)

    config, net, state, history = load_run(args.out_root, args.model_ind)
    if config.twohead:
        _, _, map_a, _ = cluster_twohead_create_dataloaders(config)
        apply_fn = make_eval_apply(net, state, config, head="B")
    else:
        _, map_a, _ = cluster_create_dataloaders(config)
        apply_fn = make_eval_apply(net, state, config, head=None)

    out_dir = os.path.join(args.out_root, str(args.model_ind), "examples")
    imgs, labels = next(iter(map_a))
    outs = np.asarray(apply_fn(imgs))  # (H, bn, k)
    preds = outs[0].argmax(axis=1)
    n = min(args.num_examples, imgs.shape[0])
    render(np.asarray(imgs)[:n], mode="image", name="example",
           out_dir=out_dir)
    with open(os.path.join(out_dir, "preds.txt"), "w") as f:
        for i in range(n):
            f.write(f"example_{i}: pred {int(preds[i])} "
                    f"gt {int(labels[i])}\n")
    print(f"wrote {n} examples to {out_dir}")


if __name__ == "__main__":
    main()
