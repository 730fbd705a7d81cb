"""Analysis: mapping robustness with a truncated fraction of labels —
re-evaluate a trained run using only pc of the mapping-assignment set.
Mirror of code/scripts/cluster/analysis/overcluster_fewer_labels{,_
greyscale}_example.py (TruncatedDataset semantics)."""

import argparse


def main(argv=None):
    from iic_tpu.cli.analysis.eval import load_run
    from iic_tpu.data.pipeline import MappingLoader
    from iic_tpu.evals import cluster_subheads_eval
    from iic_tpu.train.cluster_trainer import make_eval_apply

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--out_root", type=str, default="out")
    parser.add_argument("--pcs", type=float, nargs="+",
                        default=[1.0, 0.5, 0.1, 0.01])
    args = parser.parse_args(argv)

    config, net, state, history = load_run(args.out_root, args.model_ind)
    head = "B" if config.twohead else None
    apply_fn = make_eval_apply(net, state, config, head=head)

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
        stats = cluster_subheads_eval(config, apply_fn, map_assign,
                                      map_test)
        results[pc] = stats["best"]
        print(f"pc {pc}: best acc {stats['best']:.6f} "
              f"avg {stats['avg']:.6f}")
    return results


if __name__ == "__main__":
    main()
