"""Analysis: mapping robustness with a truncated fraction of labels —
re-evaluate a trained run using only pc of the mapping-assignment set.
Mirror of code/scripts/cluster/analysis/overcluster_fewer_labels{,_
greyscale}_example.py (TruncatedDataset semantics): results are appended
to the run's stored config as ``assign_set_szs_pc_acc[str(pc)] =
(num_imgs, acc)`` (reference :113-126) unless --dont_save; --rewrite
resets the stored dict first; --use_eval evaluates with BN in eval mode
(the reference default here is TRAIN mode, :103-105 — the opposite of
the main eval loop's default)."""

import argparse
import os
import pickle


def main(argv=None):
    from iic_tpu.cli.analysis.eval import load_run
    from iic_tpu.data.pipeline import MappingLoader
    from iic_tpu.evals import cluster_subheads_eval
    from iic_tpu.train.cluster_trainer import make_eval_apply

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--out_root", type=str, default="out")
    parser.add_argument("--new_assign_set_szs_pc", "--pcs", dest="pcs",
                        type=float, nargs="+",
                        default=[1.0, 0.5, 0.1, 0.01])
    parser.add_argument("--use_eval", default=False, action="store_true",
                        help="BN eval mode (reference default is train "
                        "mode for this script, :103-105)")
    parser.add_argument("--dont_save", default=False, action="store_true")
    parser.add_argument("--rewrite", default=False, action="store_true")
    args = parser.parse_args(argv)
    if args.rewrite:
        assert not args.dont_save  # reference :33-34

    config, net, state, history = load_run(args.out_root, args.model_ind)
    head = "B" if config.twohead else None
    apply_fn = make_eval_apply(net, state, config, head=head,
                               train_mode=not args.use_eval)

    # partition tables are factory-derived, not persisted: rebuild them
    if config.twohead:
        from iic_tpu.data.pipeline import _twohead_partitions
        _, _, map_a_parts, map_t_parts = _twohead_partitions(config)
    else:
        from iic_tpu.data.pipeline import cluster_create_dataloaders
        cluster_create_dataloaders(config)
        map_a_parts = config.mapping_assignment_partitions
        map_t_parts = config.mapping_test_partitions
    config.mapping_assignment_partitions = map_a_parts
    config.mapping_test_partitions = map_t_parts

    map_test = MappingLoader(config, config.mapping_test_partitions)
    results = {}
    for pc in args.pcs:
        map_assign = MappingLoader(
            config, config.mapping_assignment_partitions, truncate_pc=pc)
        num_imgs = len(map_assign.images)
        stats = cluster_subheads_eval(config, apply_fn, map_assign,
                                      map_test)
        results[str(pc)] = (num_imgs, stats["best"])
        print(f"pc {pc} ({num_imgs} imgs): best acc {stats['best']:.6f} "
              f"avg {stats['avg']:.6f}")

    if not args.dont_save:
        # append to the run's config-as-db, like the reference :113-126
        p = os.path.join(args.out_root, str(args.model_ind),
                         "config.pickle")
        with open(p, "rb") as f:
            meta = pickle.load(f)
        stored = ({} if args.rewrite else
                  dict(meta["config"].get("assign_set_szs_pc_acc", {})))
        stored.update(results)
        meta["config"]["assign_set_szs_pc_acc"] = stored
        with open(p, "wb") as f:
            pickle.dump(meta, f)
        print(f"stored assign_set_szs_pc_acc ({len(stored)} entries) "
              f"into {p}")
    return results


if __name__ == "__main__":
    main()
