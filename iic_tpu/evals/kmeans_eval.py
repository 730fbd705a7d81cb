"""K-means-on-features evaluation.

Mirror of the reference's segmentation k-means baseline eval
(code/utils/segmentation/baselines/kmeans_segmentation_eval.py:18-188):
fit MiniBatchKMeans on a pixel-feature sample (masked), predict on the full
set, Hungarian-match cluster ids to ground truth, accuracy (+optional
NMI/ARI). Also a clustering-level variant replacing the reference's
outdated ``multioutput_k_means_assess`` (code/utils/cluster/
k_means_assess.py — which asserts False) with a working implementation.
"""

import numpy as np

from iic_tpu.evals.metrics import (
    accuracy, ari, hungarian_match, nmi, reorder_preds)

GET_NMI_ARI = False


def train_kmeans_on_features(features_fn, dataloader, gt_k,
                             max_num_samples=50_000, seed=0,
                             verbose=False):
    """Fit MiniBatchKMeans on masked per-pixel features.

    ``features_fn(imgs) -> (bn, d, h, w)`` feature maps; dataloader yields
    (imgs, labels, mask)."""
    from sklearn.cluster import MiniBatchKMeans

    rng = np.random.default_rng(seed)
    chunks = []
    n_batches = max(len(dataloader), 1)
    per_batch = max(max_num_samples // n_batches, 1)
    for b_i, (imgs, _, mask) in enumerate(dataloader):
        if verbose:
            print(f"kmeans eval: sampling features, batch {b_i}")
        feats = np.asarray(features_fn(imgs))  # (bn, d, h, w)
        bn, d = feats.shape[:2]
        flat = feats.transpose(0, 2, 3, 1).reshape(-1, d)
        m = np.asarray(mask).reshape(-1).astype(bool)
        flat = flat[m]
        take = min(per_batch, len(flat))
        idx = rng.choice(len(flat), take, replace=False)
        chunks.append(flat[idx])
    samples = np.concatenate(chunks)[:max_num_samples]
    if len(samples) < max_num_samples:
        # no silent caps: sparse masks undersample the fixed per-batch
        # quota; say so instead of quietly fitting on fewer samples
        print(f"kmeans eval: sampled {len(samples)} of the requested "
              f"{max_num_samples} pixel features (sparse masks)")
    kmeans = MiniBatchKMeans(n_clusters=gt_k, random_state=seed,
                             n_init="auto")
    kmeans.fit(samples)
    return kmeans


def apply_trained_kmeans(features_fn, dataloader, kmeans, verbose=False):
    """Predict cluster ids per masked pixel; returns (preds, targets)."""
    preds_l, targets_l = [], []
    for b_i, (imgs, labels, mask) in enumerate(dataloader):
        if verbose:
            print(f"kmeans eval: predicting, batch {b_i}")
        feats = np.asarray(features_fn(imgs))
        bn, d = feats.shape[:2]
        flat = feats.transpose(0, 2, 3, 1).reshape(-1, d)
        m = np.asarray(mask).reshape(-1).astype(bool)
        preds_l.append(kmeans.predict(flat[m]).astype(np.int32))
        targets_l.append(np.asarray(labels).reshape(-1)[m].astype(np.int32))
    return np.concatenate(preds_l), np.concatenate(targets_l)


def kmeans_segmentation_eval(features_fn, dataloader, gt_k,
                             max_num_samples=50_000, seed=0,
                             verbose=False):
    """Full pipeline; returns stats dict with acc (+nmi/ari if enabled).
    ``verbose``: per-batch progress prints (reference doersch.py:285
    passes config.verbose through its k-means eval)."""
    kmeans = train_kmeans_on_features(features_fn, dataloader, gt_k,
                                      max_num_samples, seed, verbose=verbose)
    preds, targets = apply_trained_kmeans(features_fn, dataloader, kmeans,
                                          verbose=verbose)
    match = hungarian_match(preds, targets, preds_k=gt_k, targets_k=gt_k)
    reordered = reorder_preds(preds, match)
    stats = {"acc": accuracy(reordered, targets, gt_k), "match": match}
    if GET_NMI_ARI:
        stats["nmi"] = nmi(reordered, targets)
        stats["ari"] = ari(reordered, targets)
    return stats


def kmeans_cluster_assess(features, targets, gt_k, seed=0):
    """Working replacement for the reference's stale
    ``multioutput_k_means_assess``: k-means on (N, d) image features,
    Hungarian, accuracy."""
    from sklearn.cluster import KMeans

    kmeans = KMeans(n_clusters=gt_k, random_state=seed, n_init=10)
    preds = kmeans.fit_predict(np.asarray(features)).astype(np.int32)
    targets = np.asarray(targets).astype(np.int32)
    match = hungarian_match(preds, targets, preds_k=gt_k, targets_k=gt_k)
    reordered = reorder_preds(preds, match)
    return accuracy(reordered, targets, gt_k)
