"""Segmentation evaluation (reference: code/utils/segmentation/
segmentation_eval.py): per-pixel argmax predictions flattened, relevancy
mask applied, then the same Hungarian machinery as clustering."""

from typing import Optional

import numpy as np

from iic_tpu.evals.cluster_eval import EvalHistory, cluster_subheads_eval


def segmentation_get_data(config, apply_fn, dataloader):
    """Reference ``_segmentation_get_data`` (segmentation_eval.py:44-140).

    ``apply_fn(imgs) -> (H, bn, k, h, w)`` softmax maps; dataloader yields
    (imgs, flat_targets (bn, h, w), mask (bn, h, w)).
    Returns (flat_predss (H, M), flat_targets (M,)) with the mask applied.
    """
    assert config.output_k <= 255
    # the relevancy mask is applied PER BATCH (the reference masks once at
    # the end, segmentation_eval.py:131-137 — same result): the host never
    # holds more than one batch of irrelevant pixels, so COCO-scale evals
    # (~1e8 pixels) accumulate only the masked survivors
    predss, targets = [], []
    for imgs, flat_targets, mask in dataloader:
        x_outs = apply_fn(imgs)  # (H, bn, k, h, w)
        assert x_outs.shape[0] == config.num_sub_heads
        assert x_outs.shape[2] == config.output_k
        m = np.asarray(mask).reshape(-1).astype(bool)
        preds = np.asarray(x_outs.argmax(axis=2))  # (H, bn, h, w)
        predss.append(preds.reshape(preds.shape[0], -1)[:, m]
                      .astype(np.int32))
        targets.append(np.asarray(flat_targets).reshape(-1)[m]
                       .astype(np.int32))
    flat_predss = np.concatenate(predss, axis=1)
    flat_targets = np.concatenate(targets)
    return flat_predss, flat_targets


def segmentation_eval(config, apply_fn,
                      mapping_assignment_dataloader,
                      mapping_test_dataloader,
                      history: Optional[EvalHistory] = None,
                      return_only: bool = False):
    """Reference ``segmentation_eval`` (segmentation_eval.py:12-41)."""
    stats = cluster_subheads_eval(
        config, apply_fn,
        mapping_assignment_dataloader=mapping_assignment_dataloader,
        mapping_test_dataloader=mapping_test_dataloader,
        get_data_fn=segmentation_get_data)

    if return_only or history is None:
        return stats

    acc = stats["best"]
    is_best = (len(history.epoch_acc) > 0) and (acc > max(history.epoch_acc))
    history.epoch_stats.append(stats)
    history.epoch_acc.append(acc)
    history.epoch_avg_subhead_acc.append(stats["avg"])
    return is_best
