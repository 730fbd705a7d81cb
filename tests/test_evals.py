"""Eval machinery tests: vote matrix vs brute force, Hungarian vs sklearn
semantics, original (many-to-one) match, full cluster_subheads_eval flow in
IID and IID+ modes, segmentation masked eval."""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp

from iic_tpu.evals import (
    EvalHistory, accuracy, cluster_eval, cluster_subheads_eval,
    hungarian_match, original_match, reorder_preds, segmentation_get_data,
    vote_matrix)


def test_vote_matrix_matches_bruteforce():
    rng = np.random.default_rng(0)
    preds = rng.integers(0, 7, 500)
    targets = rng.integers(0, 7, 500)
    v = np.asarray(vote_matrix(jnp.asarray(preds), jnp.asarray(targets),
                               7, 7))
    brute = np.zeros((7, 7))
    for c1 in range(7):
        for c2 in range(7):
            brute[c1, c2] = ((preds == c1) & (targets == c2)).sum()
    np.testing.assert_array_equal(v, brute)


def test_hungarian_recovers_permutation():
    rng = np.random.default_rng(1)
    k = 10
    targets = rng.integers(0, k, 2000)
    perm = rng.permutation(k)
    preds = perm[targets]  # predictions = permuted labels
    match = hungarian_match(jnp.asarray(preds), jnp.asarray(targets), k, k)
    reordered = reorder_preds(preds, match)
    assert accuracy(reordered, targets, k) == 1.0
    # every output channel mapped exactly once
    assert sorted(p for p, _ in match) == list(range(k))


def test_hungarian_with_noise():
    rng = np.random.default_rng(2)
    k = 5
    targets = rng.integers(0, k, 5000)
    perm = rng.permutation(k)
    preds = perm[targets].copy()
    noise_idx = rng.choice(5000, 500, replace=False)
    preds[noise_idx] = rng.integers(0, k, 500)
    match = hungarian_match(jnp.asarray(preds), jnp.asarray(targets), k, k)
    reordered = reorder_preds(preds, match)
    assert accuracy(reordered, targets, k) > 0.85


def test_original_match_many_to_one():
    # 4 output channels, 2 gt classes: channels 0,1 -> class 0; 2,3 -> 1
    preds = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    targets = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    match = original_match(jnp.asarray(preds), jnp.asarray(targets), 4, 2)
    assert dict(match) == {0: 0, 1: 0, 2: 1, 3: 1}
    reordered = reorder_preds(preds, match)
    assert accuracy(reordered, targets, 4) == 1.0


def _fake_loader_and_apply(rng, num_sub_heads=3, k=5, n_batches=4, bn=32):
    """Loader yielding (imgs, targets); apply_fn maps imgs deterministically
    to per-sub-head softmax outputs where sub-head 1 is perfect (under a
    permutation) and others are noisy."""
    perm = rng.permutation(k)
    batches = []
    for _ in range(n_batches):
        targets = rng.integers(0, k, bn)
        batches.append((targets, targets))

    def apply_fn(imgs):
        targets = np.asarray(imgs)
        outs = np.zeros((num_sub_heads, len(targets), k), np.float32)
        for h in range(num_sub_heads):
            for b, t in enumerate(targets):
                if h == 1:
                    outs[h, b, perm[t]] = 1.0  # perfect, permuted
                else:
                    outs[h, b, rng.integers(0, k)] = 1.0  # noise
        return jnp.asarray(outs)

    return batches, apply_fn, perm


def test_cluster_subheads_eval_iid_mode():
    rng = np.random.default_rng(3)
    batches, apply_fn, _ = _fake_loader_and_apply(rng)
    cfg = SimpleNamespace(num_sub_heads=3, output_k=5, gt_k=5,
                          mode="IID", eval_mode="hung")
    stats = cluster_subheads_eval(cfg, apply_fn, batches, batches)
    assert stats["best_train_sub_head"] == 1
    assert stats["best"] == 1.0
    assert stats["worst"] <= stats["best"]
    assert len(stats["test_accs"]) == 3


def test_cluster_subheads_eval_iid_plus_mode():
    rng = np.random.default_rng(4)
    batches, apply_fn, _ = _fake_loader_and_apply(rng)
    test_batches, _, _ = _fake_loader_and_apply(rng)  # new targets
    cfg = SimpleNamespace(num_sub_heads=3, output_k=5, gt_k=5,
                          mode="IID+", eval_mode="hung")
    stats = cluster_subheads_eval(cfg, apply_fn, batches, batches)
    assert stats["best"] == 1.0  # match transfers to same distribution


def test_cluster_eval_history_and_is_best():
    rng = np.random.default_rng(5)
    batches, apply_fn, _ = _fake_loader_and_apply(rng)
    cfg = SimpleNamespace(num_sub_heads=3, output_k=5, gt_k=5,
                          mode="IID", eval_mode="hung")
    history = EvalHistory()
    is_best, stats = cluster_eval(cfg, apply_fn, batches, batches,
                                  history=history)
    assert not is_best  # first epoch never "best" (reference :356)
    assert len(history.epoch_acc) == 1
    is_best2, _ = cluster_eval(cfg, apply_fn, batches, batches,
                               history=history)
    assert not is_best2  # same acc, not strictly greater
    history.truncate(0)
    assert len(history.epoch_acc) == 1


def test_segmentation_get_data_masks():
    cfg = SimpleNamespace(num_sub_heads=2, output_k=3, gt_k=3,
                          mode="IID", eval_mode="hung", input_sz=8)
    rng = np.random.default_rng(6)
    h = w = 8

    def apply_fn(imgs):
        # (H, bn, k, h, w): argmax = class 1 everywhere for head 0,
        # class 2 for head 1
        bn = imgs.shape[0]
        outs = np.zeros((2, bn, 3, h, w), np.float32)
        outs[0, :, 1] = 1.0
        outs[1, :, 2] = 1.0
        return jnp.asarray(outs)

    imgs = np.zeros((4, 3, h, w), np.float32)
    targets = np.full((4, h, w), 1, np.int32)
    mask = np.zeros((4, h, w), np.float32)
    mask[:, :4] = 1  # only top half relevant

    preds, tgts = segmentation_get_data(cfg, apply_fn,
                                        [(imgs, targets, mask)])
    assert preds.shape == (2, 4 * 4 * 8)
    assert (preds[0] == 1).all()
    assert (preds[1] == 2).all()
    assert (tgts == 1).all()
