"""Analysis: clone a stored segmentation run's weights and re-evaluate.
Mirror of code/scripts/segmentation/analysis/clone_and_eval.py: with
--old_model_ind, the old run's config + best checkpoint are cloned into
a NEW run dir ``out_root/model_ind`` first (reference :23-55), then the
run at --model_ind is re-evaluated (1-1 Hungarian mapping included).
Without --old_model_ind the run is evaluated in place."""

import argparse
import os
import pickle
import shutil


def _clone_run(out_root, old_model_ind, model_ind):
    old_dir = os.path.join(out_root, str(old_model_ind))
    new_dir = os.path.join(out_root, str(model_ind))
    os.makedirs(new_dir, exist_ok=True)
    with open(os.path.join(old_dir, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    assert meta["config"]["model_ind"] == old_model_ind  # reference :41
    meta["config"]["model_ind"] = model_ind
    with open(os.path.join(new_dir, "config.pickle"), "wb") as f:
        pickle.dump(meta, f)
    copied = []
    for name in ("best.ckpt", "latest.ckpt", "config.txt"):
        src = os.path.join(old_dir, name)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(new_dir, name))
            copied.append(name)
    assert any(n.endswith(".ckpt") for n in copied), (
        f"no checkpoints found in {old_dir}")
    print(f"cloned run {old_model_ind} -> {model_ind} ({copied})")


def main(argv=None):
    from iic_tpu.cli.analysis.render_general import load_seg_run
    from iic_tpu.data.seg_pipeline import SegMappingLoader
    from iic_tpu.evals.segmentation_eval import segmentation_eval
    from iic_tpu.train.seg_trainer import make_seg_eval_apply

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--old_model_ind", type=int, default=-1,
                        help="clone this run into model_ind first "
                        "(reference clone_and_eval.py:25)")
    parser.add_argument("--out_root", type=str, default="out")
    args = parser.parse_args(argv)

    if args.old_model_ind >= 0:
        _clone_run(args.out_root, args.old_model_ind, args.model_ind)

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
