"""Eval wall-time measurement (VERDICT r2 'measure and bound eval cost').

Times the two epoch-eval shapes that dominate the published configs, on
the real chip, with the round-3 loaders (threaded prefetch in
MappingLoader/SegMappingLoader + per-batch masked accumulation in the
seg eval):

1. STL10-scale clustering mapping pass: 13,000 images (the train+test
   mapping partitions of the paper's STL10 runs, commands.txt:18), 96^2
   raw -> tf3 centre-crop 85 -> 64^2, sobel 5-ch, ClusterNet5gTwoHead
   head B (k=10, 5 sub-heads) -> full cluster_subheads_eval incl. the
   per-sub-head Hungarian matching.
2. COCO-shaped segmentation eval: 1,000 images at 128^2 (curated
   val-scale pass), SegmentationNet10aTwoHead head B (k=3) ->
   segmentation_eval's per-pixel argmax, masked per-batch accumulation
   and Hungarian match.

Prints one JSON line per measurement. The timing barrier is the stats
dict itself (host numpy accumulation + scipy Hungarian), so no
block_until_ready caveats apply (VALIDATION.md round-3 note).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cluster_eval_cost():
    from iic_tpu.data.pipeline import MappingLoader
    from iic_tpu.evals.cluster_eval import cluster_subheads_eval
    from iic_tpu.train.cluster_trainer import (build_net_and_state,
                                               make_eval_apply)
    from iic_tpu.train.config import ClusterConfig

    cfg = ClusterConfig(
        arch="ClusterNet5gTwoHead", mode="IID",
        dataset="Synthetic10x96x3x13000", dataset_root="", gt_k=10,
        output_k_A=70, output_k_B=10, num_sub_heads=5, batch_sz=512,
        num_dataloaders=1, include_rgb=True, crop_orig=True,
        rand_crop_sz=85, input_sz=64, batchnorm_track=True,
    ).finalize(twohead=True, sobel=True)
    net, _, state = build_net_and_state(cfg)
    apply_fn = make_eval_apply(net, state, cfg, head="B")
    loader = MappingLoader(cfg, [True])
    n = len(loader.images)

    # warm (compiles)
    cluster_subheads_eval(cfg, apply_fn,
                          mapping_assignment_dataloader=loader,
                          mapping_test_dataloader=loader)
    t0 = time.perf_counter()
    stats = cluster_subheads_eval(cfg, apply_fn,
                                  mapping_assignment_dataloader=loader,
                                  mapping_test_dataloader=loader)
    dt = time.perf_counter() - t0
    out = {"measurement": "STL10-scale cluster mapping eval "
                          "(13k imgs, 96^2 raw -> 64^2 sobel 5ch, "
                          "net5g twohead head B, 5 sub-heads, Hungarian)",
           "wall_s": round(dt, 2), "imgs_per_s": round(n / dt, 1),
           "best_acc_sanity": float(stats["best"])}
    print(json.dumps(out), flush=True)
    return out


def seg_eval_cost():
    from iic_tpu.data.seg_pipeline import SegMappingLoader
    from iic_tpu.evals.segmentation_eval import segmentation_eval
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_trainer import (build_seg_net_and_state,
                                           make_seg_eval_apply)

    cfg = SegConfig(
        arch="SegmentationNet10aTwoHead", mode="IID",
        dataset="SyntheticSeg3x128x1000", dataset_root="", gt_k=3,
        output_k_A=15, output_k_B=3, num_sub_heads=1, batch_sz=120,
        num_dataloaders=1, input_sz=128, include_rgb=True,
        batchnorm_track=True, half_T_side_dense=10,
    ).finalize(twohead=True)
    net, _, state = build_seg_net_and_state(cfg)
    apply_fn = make_seg_eval_apply(net, state, cfg, head="B")
    loader = SegMappingLoader(cfg, ["train"])
    n = loader.total

    segmentation_eval(cfg, apply_fn, loader, loader,
                      return_only=True)  # warm
    t0 = time.perf_counter()
    stats = segmentation_eval(cfg, apply_fn, loader, loader,
                              return_only=True)
    dt = time.perf_counter() - t0
    px = n * 128 * 128
    out = {"measurement": "COCO-shaped seg eval (1k imgs 128^2, net10a "
                          "twohead head B k=3, per-pixel Hungarian)",
           "wall_s": round(dt, 2), "imgs_per_s": round(n / dt, 1),
           "mpix_per_s": round(px / dt / 1e6, 1),
           "best_acc_sanity": float(stats["best"])}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = []
    if which in ("all", "cluster"):
        results.append(cluster_eval_cost())
    if which in ("all", "seg"):
        results.append(seg_eval_cost())
