"""Analysis: print metric history of stored runs. Mirror of
code/scripts/cluster/analysis/print_stats.py."""

import argparse

import numpy as np


def main(argv=None):
    from iic_tpu.cli.analysis.eval import load_run

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_inds", type=int, nargs="+", required=True)
    parser.add_argument("--out_root", type=str, default="out")
    args = parser.parse_args(argv)

    for model_ind in args.model_inds:
        config, net, state, history = load_run(args.out_root, model_ind)
        ev = history["eval"]
        best_epoch = int(np.argmax(ev.epoch_acc))
        print(f"model {model_ind}: epochs {len(ev.epoch_acc)} "
              f"best acc {max(ev.epoch_acc):.6f} (epoch {best_epoch}) "
              f"avg subhead acc at best {ev.epoch_avg_subhead_acc[best_epoch]:.6f}")
        if ev.double_eval_acc:
            print(f"  double eval best: {max(ev.double_eval_acc):.6f}")


if __name__ == "__main__":
    main()
