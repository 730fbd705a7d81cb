"""Analysis: clone a stored segmentation run's weights and re-evaluate.
Mirror of code/scripts/segmentation/analysis/clone_and_eval.py."""

import argparse


def main(argv=None):
    from iic_tpu.cli.analysis.render_general import load_seg_run
    from iic_tpu.data.seg_pipeline import SegMappingLoader
    from iic_tpu.evals.segmentation_eval import segmentation_eval
    from iic_tpu.train.seg_trainer import make_seg_eval_apply

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--out_root", type=str, default="out")
    args = parser.parse_args(argv)

    config, net, state, history = load_seg_run(args.out_root,
                                               args.model_ind)
    head = "B" if config.twohead else None
    apply_fn = make_seg_eval_apply(net, state, config, head=head)
    map_a = SegMappingLoader(config, config.mapping_assignment_partitions)
    map_t = SegMappingLoader(config, config.mapping_test_partitions)
    stats = segmentation_eval(config, apply_fn, map_a, map_t,
                              return_only=True)
    print(stats)
    return stats


if __name__ == "__main__":
    main()
