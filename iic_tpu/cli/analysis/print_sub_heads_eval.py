"""Analysis: compare loss-based vs eval-based sub-head selection for a list
of trained models. Mirror of
code/scripts/cluster/analysis/print_sub_heads_eval.py; its output format
follows examples/subheads_lowest_loss.out."""

import argparse

import numpy as np


def main(argv=None):
    from iic_tpu.cli.analysis.eval import load_run
    from iic_tpu.data.pipeline import cluster_twohead_create_dataloaders
    from iic_tpu.evals import get_subhead_using_loss
    from iic_tpu.train.cluster_trainer import make_eval_apply

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_inds", type=int, nargs="+", required=True)
    parser.add_argument("--out_root", type=str, default="out")
    args = parser.parse_args(argv)

    results = {}
    for model_ind in args.model_inds:
        config, net, state, history = load_run(args.out_root, model_ind)
        ev = history["eval"]
        best_epoch = int(np.argmax(ev.epoch_acc))
        stats = ev.epoch_stats[best_epoch]
        best_sub_head_eval = stats["best_train_sub_head"]
        test_accs = stats["test_accs"]

        pipe_a, pipe_b, _, _ = cluster_twohead_create_dataloaders(config)
        apply_fn = make_eval_apply(net, state, config, head="B")

        def pairs():
            for imgs, imgs_tf in pipe_b.epoch(0, augmented=True):
                yield apply_fn(imgs), apply_fn(imgs_tf)

        best_sub_head_loss = get_subhead_using_loss(
            config, pairs(), lamb=getattr(config, "lamb_B", config.lamb))

        print(f"model {model_ind}:")
        print(f"best sub_head by loss: {best_sub_head_loss}")
        print(f"best sub_head by eval: {best_sub_head_eval}")
        print(f"... loss select acc: {test_accs[best_sub_head_loss]:f}, "
              f"eval select acc: {test_accs[best_sub_head_eval]:f}")
        results[model_ind] = {
            "loss_select_acc": test_accs[best_sub_head_loss],
            "eval_select_acc": test_accs[best_sub_head_eval],
        }
    return results


if __name__ == "__main__":
    main()
