"""Analysis: render predictions/labels/masks for a trained segmentation
run. Mirror of code/scripts/segmentation/analysis/render_general.py and
render_potsdam.py (one tool — the dataset comes from the stored config):
--model_inds loops runs, --net_name picks the checkpoint (best/latest),
--imgs_dataloaders picks test (mapping_test) and/or train
(mapping_assignment) sets, --reassess_acc recomputes the accuracy and
stops, --get_match_only prints the best sub-head's Hungarian match and
stops (reference render_general.py:23-150). Rendered predictions use the
best sub-head reordered by its match, like the reference."""

import argparse
import dataclasses
import os
import pickle

import numpy as np


def load_seg_run(out_root, model_ind, name=None):
    from iic_tpu.train import checkpoint as ckpt
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_trainer import build_seg_net_and_state

    run_dir = os.path.join(out_root, str(model_ind))
    with open(os.path.join(run_dir, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    fields = {f.name for f in dataclasses.fields(SegConfig)}
    config = SegConfig(**{k: v for k, v in meta["config"].items()
                          if k in fields})
    for f in dataclasses.fields(SegConfig):
        v = getattr(config, f.name)
        if isinstance(v, list):
            setattr(config, f.name, tuple(v))
    # partition tables are factory-derived, not persisted: rebuild them
    from iic_tpu.data.seg_pipeline import seg_partitions
    (config.train_partitions, config.mapping_assignment_partitions,
     config.mapping_test_partitions) = seg_partitions(config)
    net, tx, template = build_seg_net_and_state(config)
    if not name:
        name = "best" if os.path.exists(
            os.path.join(run_dir, "best.ckpt")) else "latest"
    state, history, _ = ckpt.load_checkpoint(config, template, name=name)
    return config, net, state, history


def main(argv=None):
    from iic_tpu.data.seg_pipeline import SegMappingLoader
    from iic_tpu.evals.metrics import reorder_preds
    from iic_tpu.evals.segmentation_eval import segmentation_eval
    from iic_tpu.train.seg_trainer import make_seg_eval_apply
    from iic_tpu.utils.render import render

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, default=-1)
    parser.add_argument("--model_inds", type=int, nargs="+", default=[])
    parser.add_argument("--out_root", type=str, default="out")
    parser.add_argument("--net_name", type=str, default="",
                        help="best | latest ('' = best if present)")
    parser.add_argument("--num", "--num_images", dest="num", type=int,
                        default=10)
    parser.add_argument("--imgs_dataloaders", type=str, nargs="+",
                        default=["test"], choices=["test", "train"])
    parser.add_argument("--reassess_acc", default=False,
                        action="store_true")
    parser.add_argument("--get_match_only", default=False,
                        action="store_true")
    parser.add_argument("--best_match", type=int, nargs="+", default=[],
                        help="explicit cluster->gt match (index = pred "
                        "id), skipping the eval pass — reference "
                        "render_potsdam.py:31-279")
    args = parser.parse_args(argv)
    model_inds = args.model_inds or ([args.model_ind]
                                     if args.model_ind >= 0 else [])
    if not model_inds:
        parser.error("pass --model_ind or --model_inds")

    results = {}
    for model_ind in model_inds:
        config, net, state, history = load_seg_run(
            args.out_root, model_ind, name=args.net_name or None)
        head = "B" if config.twohead else None
        apply_fn = make_seg_eval_apply(net, state, config, head=head)
        map_a = SegMappingLoader(config,
                                 config.mapping_assignment_partitions)
        map_t = SegMappingLoader(config, config.mapping_test_partitions)

        if args.best_match and not args.reassess_acc:
            # explicit match: no eval pass; sub-head from the stored
            # history when present (reference render_potsdam.py:272-279)
            match = list(enumerate(args.best_match))
            ev = history.get("eval") if isinstance(history, dict) else None
            sub_head = 0
            if ev is not None and list(getattr(ev, "epoch_stats", [])):
                sub_head = ev.epoch_stats[-1].get(
                    "best_train_sub_head", 0)
            stats = {"best_train_sub_head": sub_head,
                     "best_train_sub_head_match": match}
        else:
            stats = segmentation_eval(config, apply_fn, map_a, map_t,
                                      return_only=True)
            sub_head = stats["best_train_sub_head"]
            match = stats["best_train_sub_head_match"]
        print(f"model {model_ind}: best sub-head {sub_head} "
              f"match {match}")
        results[model_ind] = stats
        if args.reassess_acc:
            print(f"model {model_ind}: reassessed acc "
                  f"{stats['best']:.6f}")
            continue
        if args.get_match_only:
            continue

        for dl_name in args.imgs_dataloaders:
            loader = map_t if dl_name == "test" else map_a
            out_dir = os.path.join(
                args.out_root, str(model_ind), "renders", dl_name,
                args.net_name or "best")
            imgs, labels, masks = next(iter(loader))
            n = min(args.num, imgs.shape[0])
            outs = np.asarray(apply_fn(imgs))  # (H, bn, k, h, w)
            preds = outs[sub_head].argmax(axis=1)
            # cluster ids -> gt ids via the best sub-head's match
            preds = reorder_preds(preds.reshape(-1), match).reshape(
                preds.shape)

            render(np.asarray(imgs)[:n], mode="image", name="img",
                   out_dir=out_dir)
            render(labels[:n], mode="label", name="label", out_dir=out_dir)
            render(preds[:n], mode="preds", name="preds", out_dir=out_dir)
            render(masks[:n], mode="mask", name="mask", out_dir=out_dir)
            print(f"wrote renders to {out_dir}")
    return results


if __name__ == "__main__":
    main()
