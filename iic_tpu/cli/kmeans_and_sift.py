"""CLI: k-means on dense SIFT + colour features segmentation baseline.
Mirror of code/scripts/segmentation/baselines/kmeans_and_sift.py (the
reference uses vlfeat dense SIFT; here cv2's SIFT evaluated on a dense
keypoint grid — the patent-free OpenCV implementation)."""

import sys

import numpy as np

from iic_tpu.cli._args import parse_seg_args
from iic_tpu.evals.metrics import accuracy, hungarian_match, reorder_preds


def dense_sift_color_features(img_u8, step=8, sift_size=8):
    """Per-grid-point [SIFT(128) | mean RGB(3)] features.
    img (H, W, 3) uint8 -> (n_points, 131), plus the grid coords."""
    import cv2

    grey = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
    h, w = grey.shape
    ys = np.arange(step // 2, h - step // 2, step)
    xs = np.arange(step // 2, w - step // 2, step)
    kps = [cv2.KeyPoint(float(x), float(y), float(sift_size))
           for y in ys for x in xs]
    sift = cv2.SIFT_create()
    _, desc = sift.compute(grey, kps)
    coords = np.array([(int(kp.pt[1]), int(kp.pt[0])) for kp in kps])
    colors = np.stack([
        img_u8[max(r - step // 2, 0):r + step // 2,
               max(c - step // 2, 0):c + step // 2].reshape(-1, 3).mean(0)
        for r, c in coords])
    return np.concatenate([desc, colors], axis=1), coords


def main(argv=None):
    from sklearn.cluster import MiniBatchKMeans

    from iic_tpu.data.seg_pipeline import (
        SegMappingLoader, segmentation_create_dataloaders)

    cfg = parse_seg_args(argv)
    cfg.finalize(twohead=False)
    segmentation_create_dataloaders(cfg)
    loader = SegMappingLoader(cfg, cfg.mapping_assignment_partitions)

    feats_all, labels_all = [], []
    for imgs, labels, masks in loader:
        imgs = np.asarray(imgs)  # (b, C, h, w) post grey/sobel prep
        rgb = (np.clip(imgs[:, :3].transpose(0, 2, 3, 1), 0, 1)
               * 255).astype(np.uint8)
        for i in range(len(rgb)):
            f, coords = dense_sift_color_features(rgb[i])
            lab = labels[i][coords[:, 0], coords[:, 1]]
            m = masks[i][coords[:, 0], coords[:, 1]].astype(bool)
            feats_all.append(f[m])
            labels_all.append(lab[m])
    feats = np.concatenate(feats_all)
    targets = np.concatenate(labels_all).astype(np.int32)

    km = MiniBatchKMeans(n_clusters=cfg.gt_k, random_state=0,
                         n_init="auto")
    preds = km.fit_predict(feats).astype(np.int32)
    match = hungarian_match(preds, targets, cfg.gt_k, cfg.gt_k)
    acc = accuracy(reorder_preds(preds, match), targets, cfg.gt_k)
    print(f"kmeans+SIFT acc: {acc:.6f}")
    sys.stdout.flush()
    return acc


if __name__ == "__main__":
    main()
