"""Dataset preparation utilities.

``potsdam_prepare``: split the ISPRS Potsdam 6000x6000 tiles into 200x200
.mat patches + train/test split lists (mirror of
code/datasets/segmentation/util/potsdam_prepare.py:11-26).

``coco164k_curate``: generate curated image lists containing a minimum
fraction of the target (few/full) classes (mirror of
code/datasets/segmentation/util/coco164k_prepare.py).

``generate_fine_to_coarse`` lives in iic_tpu.data.seg_datasets.
"""

import os
import os.path as osp
from glob import glob

import numpy as np


def potsdam_prepare(raw_root, out_root, patch_side=200,
                    unlabelled_frac=0.8, seed=0):
    """Cut RGBIR tiles (+ optional label tiles) into patch_side^2 .mat
    patches, write imgs/<id>.mat ("img"), gt/<id>.mat ("gt"), and the
    unlabelled_train / labelled_train / labelled_test split lists."""
    import scipy.io as sio

    try:
        import cv2
    except ImportError:
        cv2 = None

    os.makedirs(osp.join(out_root, "imgs"), exist_ok=True)
    os.makedirs(osp.join(out_root, "gt"), exist_ok=True)

    tile_paths = sorted(glob(osp.join(raw_root, "4_Ortho_RGBIR", "*.tif")))
    if not tile_paths:
        tile_paths = sorted(glob(osp.join(raw_root, "*.tif")))
    assert tile_paths, f"no .tif tiles under {raw_root}"

    ids_labelled, ids_unlabelled = [], []
    next_id = 0
    for tile_path in tile_paths:
        img = cv2.imread(tile_path, cv2.IMREAD_UNCHANGED)
        assert img is not None, tile_path
        # label tile naming convention of the ISPRS release
        base = osp.basename(tile_path).replace("RGBIR", "label").replace(
            ".tif", ".tif")
        label_path = osp.join(raw_root, "5_Labels_all", base)
        label = cv2.imread(label_path, cv2.IMREAD_COLOR) \
            if osp.exists(label_path) else None

        h, w = img.shape[:2]
        for y in range(0, h - patch_side + 1, patch_side):
            for x in range(0, w - patch_side + 1, patch_side):
                pid = str(next_id)
                next_id += 1
                patch = img[y:y + patch_side, x:x + patch_side]
                sio.savemat(osp.join(out_root, "imgs", pid + ".mat"),
                            {"img": patch.astype(np.uint8)})
                if label is not None:
                    gt_rgb = label[y:y + patch_side, x:x + patch_side]
                    gt = _potsdam_rgb_to_class(gt_rgb)
                    sio.savemat(osp.join(out_root, "gt", pid + ".mat"),
                                {"gt": gt.astype(np.int32)})
                    ids_labelled.append(pid)
                else:
                    ids_unlabelled.append(pid)

    rng = np.random.default_rng(seed)
    rng.shuffle(ids_labelled)
    n_test = max(len(ids_labelled) // 5, 1)
    test_ids = ids_labelled[:n_test]
    train_ids = ids_labelled[n_test:]

    for name, ids in (("unlabelled_train", ids_unlabelled),
                      ("labelled_train", train_ids),
                      ("labelled_test", test_ids)):
        with open(osp.join(out_root, name + ".txt"), "w") as f:
            f.write("\n".join(ids) + ("\n" if ids else ""))
    # the reference requires this marker (potsdam.py:42)
    with open(osp.join(out_root, "debugged.out"), "w") as f:
        f.write("ok\n")
    return len(ids_unlabelled), len(train_ids), len(test_ids)


# ISPRS Potsdam label colours -> the reference's 6 fine classes
# (0 roads, 1 buildings, 2 vegetation, 3 trees, 4 cars, 5 clutter).
_POTSDAM_COLORS = {
    (255, 255, 255): 0,  # impervious surfaces / roads
    (0, 0, 255): 1,      # buildings
    (0, 255, 255): 2,    # low vegetation
    (0, 255, 0): 3,      # trees
    (255, 255, 0): 4,    # cars
    (255, 0, 0): 5,      # clutter
}


def _potsdam_rgb_to_class(gt_bgr):
    gt = np.full(gt_bgr.shape[:2], 5, np.int32)
    rgb = gt_bgr[:, :, ::-1]
    for colour, cls in _POTSDAM_COLORS.items():
        gt[(rgb == colour).all(axis=-1)] = cls
    return gt


def coco164k_curate(root, split, label_names_coarse, version,
                    min_fraction=0.75, out_name=None, fine_to_coarse=None):
    """Write a curated list of image ids whose annotations contain at least
    ``min_fraction`` pixels of the allowed coarse classes."""
    import cv2

    from iic_tpu.data.seg_datasets import (
        COARSE_NAME_TO_INDEX, load_fine_to_coarse)

    if fine_to_coarse is None:
        fine_to_coarse = load_fine_to_coarse(root)
    allowed = {COARSE_NAME_TO_INDEX[n] for n in label_names_coarse}
    table = np.concatenate([[-1], fine_to_coarse])

    ann_paths = sorted(glob(osp.join(root, "annotations", split, "*.png")))
    kept = []
    for p in ann_paths:
        label = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.int32)
        label[label == 255] = -1
        coarse = table[label + 1]
        frac = np.isin(coarse, list(allowed)).mean()
        if frac >= min_fraction:
            kept.append(osp.basename(p)[:-len(".png")])

    out_name = out_name or f"curated_{version}"
    out_dir = osp.join(root, "curated", split)
    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, out_name + ".txt"), "w") as f:
        f.write("\n".join(kept) + ("\n" if kept else ""))
    return len(kept)
