"""Analysis: render predictions/labels/masks for a trained segmentation
run. Mirror of code/scripts/segmentation/analysis/render_general.py and
render_potsdam.py (one tool — the dataset comes from the stored config)."""

import argparse
import dataclasses
import os
import pickle

import numpy as np


def load_seg_run(out_root, model_ind):
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
    net, tx, template = build_seg_net_and_state(config)
    name = "best" if os.path.exists(
        os.path.join(run_dir, "best.ckpt")) else "latest"
    state, history, _ = ckpt.load_checkpoint(config, template, name=name)
    return config, net, state, history


def main(argv=None):
    from iic_tpu.data.seg_pipeline import SegMappingLoader
    from iic_tpu.train.seg_trainer import make_seg_eval_apply
    from iic_tpu.utils.render import render

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--out_root", type=str, default="out")
    parser.add_argument("--num_images", type=int, default=10)
    args = parser.parse_args(argv)

    config, net, state, history = load_seg_run(args.out_root,
                                               args.model_ind)
    head = "B" if config.twohead else None
    apply_fn = make_seg_eval_apply(net, state, config, head=head)
    loader = SegMappingLoader(config, config.mapping_assignment_partitions)

    out_dir = os.path.join(args.out_root, str(args.model_ind), "renders")
    imgs, labels, masks = next(iter(loader))
    n = min(args.num_images, imgs.shape[0])
    outs = np.asarray(apply_fn(imgs))  # (H, bn, k, h, w)
    preds = outs[0].argmax(axis=1)

    render(np.asarray(imgs)[:n], mode="image", name="img", out_dir=out_dir)
    render(labels[:n], mode="label", name="label", out_dir=out_dir)
    render(preds[:n], mode="preds", name="preds", out_dir=out_dir)
    render(masks[:n], mode="mask", name="mask", out_dir=out_dir)
    print(f"wrote renders to {out_dir}")


if __name__ == "__main__":
    main()
