"""CLI: k-means segmentation baseline on per-pixel colour or dense-SIFT
features. Mirror of the reference's
code/scripts/segmentation/baselines/kmeans_and_sift.py protocol:

- reload the ARCHETYPE config of a fully-unsupervised IID run by
  ``--IID_model_ind`` (reference :170-210) and copy its data settings,
  forced to raw colour (include_rgb, no_sobel; in_channels 3, or 4 with
  Potsdam's IR);
- vectorised per-pixel feature sampling over the train dataloader
  (reference ``_get_vectorised_colour_samples`` :111-167 /
  ``_get_vectorised_sift_samples`` :23-108): colour mode clusters EVERY
  unmasked pixel's raw colour; SIFT mode clusters one 128-d descriptor
  per SIFT_STEP x SIFT_STEP box, sampled at the box-central pixel;
- MiniBatchKMeans(k=gt_k) on ``--max_num_train`` subsampled features
  (reference :238-251), prediction over the mapping-assignment loader,
  Hungarian or many-to-one matching per the archetype's eval_mode
  (``orig_soft`` asserts False exactly like reference :276-277), and the
  matched accuracy written to the run dir (config.pickle + config.txt,
  reference :290-299).

Dense SIFT: the reference uses vlfeat's ``vl_dsift``; this build computes
OpenCV SIFT descriptors on the identical dense grid of box-central
keypoints (patent-free; descriptor values differ from vlfeat's but are
the same 128-bin HOG family, and the clustering protocol is unchanged).
"""

import argparse
import dataclasses
import os
import pickle
import sys

import numpy as np

SIFT_DLEN = 128
SIFT_STEP = 10


def _dense_sift(grey_u8, step=SIFT_STEP):
    """One 128-d descriptor per step x step box, at the box-central pixel
    (reference grid: arange(desc_side) * step + step/2). Returns
    (desc_side^2, 128) uint8, row-major with rows changing slowest —
    the reference's flattening order (:43-50, 79-80)."""
    import cv2

    h, w = grey_u8.shape
    desc_side = int(h / step)
    centres = np.arange(desc_side) * step + step // 2
    kps = [cv2.KeyPoint(float(x), float(y), float(step))
           for y in centres for x in centres]
    sift = cv2.SIFT_create()
    _, descs = sift.compute(grey_u8, kps)
    assert descs.shape == (desc_side * desc_side, SIFT_DLEN)
    return np.clip(descs, 0, 255).astype(np.uint8)


def _iter_train(config, pipeline):
    """Adapt SegTrainPipeline host batches to (imgs_u8 NHWC, mask bool,
    labels=None). The pipeline's host-prepped images ARE the reference
    train loader's img1 (same geometry draws, pre-sobel colour)."""
    for imgs, masks, _key in pipeline.epoch(0):
        yield (np.asarray(imgs), np.asarray(masks).astype(bool), None)


def _iter_mapping(config, loader):
    """Adapt SegMappingLoader batches: with no_sobel + include_rgb its
    transform is raw colour / 255 (NCHW), inverted back to uint8 exactly
    like the reference's ``(imgs * 255.).permute(0, 2, 3, 1)`` (:66)."""
    for imgs, labels, masks in loader:
        imgs = (np.asarray(imgs) * 255.0).astype(np.uint8)
        imgs = imgs.transpose(0, 2, 3, 1)
        yield (imgs, np.asarray(masks).astype(bool),
               np.asarray(labels).astype(np.int32))


def get_vectorised_colour_samples(config, batches, test_code=False):
    """Every unmasked pixel's raw colour (reference :111-167)."""
    feats, labs = [], []
    store_labels = False
    for b_i, (imgs, masks, labels) in enumerate(batches):
        assert imgs.shape[1] == imgs.shape[2] == config.input_sz
        assert imgs.shape[3] == config.in_channels
        feats.append(imgs[masks])
        if labels is not None:
            store_labels = True
            labs.append(labels[masks])
        if test_code and b_i >= 1:
            break
    samples = np.concatenate(feats).reshape(-1, config.in_channels)
    if not store_labels:
        return samples
    return samples, np.concatenate(labs).reshape(-1)


def get_vectorised_sift_samples(config, batches, test_code=False):
    """One descriptor per SIFT_STEP box at the box-central pixel; the
    box-central mask/label decides inclusion (reference :23-108)."""
    import cv2

    desc_side = int(config.input_sz / SIFT_STEP)
    centres = np.arange(desc_side) * SIFT_STEP + SIFT_STEP // 2
    ch, cw = np.meshgrid(centres, centres, indexing="ij")
    ch, cw = ch.reshape(-1), cw.reshape(-1)

    feats, masks_c, labs = [], [], []
    store_labels = False
    for b_i, (imgs, masks, labels) in enumerate(batches):
        assert imgs.shape[1] == imgs.shape[2] == config.input_sz
        for i in range(len(imgs)):
            grey = cv2.cvtColor(np.ascontiguousarray(imgs[i, :, :, :3]),
                                cv2.COLOR_RGB2GRAY)
            feats.append(_dense_sift(grey))
            masks_c.append(masks[i][ch, cw])
            if labels is not None:
                store_labels = True
                labs.append(labels[i][ch, cw])
        if test_code and b_i >= 1:
            break
    descs = np.stack(feats)                       # (n, ds^2, 128)
    keep = np.stack(masks_c)                      # (n, ds^2)
    samples = descs[keep].reshape(-1, SIFT_DLEN)
    if not store_labels:
        return samples
    return samples, np.stack(labs)[keep].reshape(-1)


def main(argv=None):
    from sklearn.cluster import MiniBatchKMeans

    from iic_tpu.data.seg_pipeline import segmentation_create_dataloaders
    from iic_tpu.evals.metrics import (accuracy, hungarian_match,
                                       original_match, reorder_preds)
    from iic_tpu.train.config import config_from_dict, config_to_str

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_ind", type=int, required=True)
    parser.add_argument("--out_root", type=str, default="out")
    parser.add_argument("--IID_model_ind", type=int, required=True)
    parser.add_argument("--max_num_train", type=int, required=True)
    parser.add_argument("--test_code", default=False, action="store_true")
    parser.add_argument("--do_sift", default=False, action="store_true")
    parser.add_argument("--dataset_root", type=str, default="",
                        help="override the archetype's stored dataset_root")
    args = parser.parse_args(argv)
    out_dir = os.path.join(args.out_root, str(args.model_ind))
    os.makedirs(out_dir, exist_ok=True)

    # Archetype-config reload (reference :188-195)
    archetype_path = os.path.join(args.out_root, str(args.IID_model_ind),
                                  "config.pickle")
    print(f"Loading archetype config from: {archetype_path}")
    with open(archetype_path, "rb") as f:
        meta = pickle.load(f)
    config = config_from_dict(meta["config"])
    assert args.IID_model_ind == config.model_ind
    assert config.mode == "IID"  # compare against fully unsup
    if args.dataset_root:
        config.dataset_root = args.dataset_root

    # Raw single-pixel colours: rgb (and ir if nec), no sobel (:201-210)
    config.include_rgb = True
    config.no_sobel = True
    config.sobel = False
    if "Coco" in config.dataset:
        assert not config.using_IR
        config.in_channels = 3
    elif config.dataset == "Potsdam":
        assert config.using_IR
        config.in_channels = 4
    elif config.dataset.startswith("SyntheticSeg"):
        config.in_channels = 4 if config.using_IR else 3

    sample_fn = (get_vectorised_sift_samples if args.do_sift
                 else get_vectorised_colour_samples)

    assert config.num_dataloaders == 1
    train_pipe, map_assign, _map_test = segmentation_create_dataloaders(
        config)

    samples = sample_fn(config, _iter_train(config, train_pipe),
                        test_code=args.test_code)
    print("got training samples")
    sys.stdout.flush()

    if args.test_code:
        print("testing code, taking 10000 samples only")
        samples = samples[:10000, :]
    else:
        num_train = min(samples.shape[0], args.max_num_train)
        print(f"taking {num_train} samples")
        chosen = np.random.default_rng(args.model_ind).choice(
            samples.shape[0], size=num_train, replace=False)
        samples = samples[chosen, :]
        print(samples.shape)
    sys.stdout.flush()

    kmeans = MiniBatchKMeans(n_clusters=config.gt_k, random_state=0,
                             n_init="auto").fit(samples)
    print("trained kmeans")
    sys.stdout.flush()

    # mapping_assignment doubles as the assessment set (it is identical to
    # mapping_test for IID mode — reference :255-263)
    assign_samples, assign_labels = sample_fn(
        config, _iter_mapping(config, map_assign), test_code=args.test_code)
    assign_preds = kmeans.predict(assign_samples).astype(np.int32)
    print("finished prediction for mapping assign/test data")
    sys.stdout.flush()

    if config.eval_mode == "hung":
        match = hungarian_match(assign_preds, assign_labels,
                                preds_k=config.gt_k, targets_k=config.gt_k)
    elif config.eval_mode == "orig":  # flat!
        match = original_match(assign_preds, assign_labels,
                               preds_k=config.gt_k, targets_k=config.gt_k)
    elif config.eval_mode == "orig_soft":
        assert False  # not used (reference :276-277)
    else:
        raise ValueError(config.eval_mode)

    reordered = reorder_preds(assign_preds, match)
    found = np.zeros(config.gt_k)
    for pred_i, _target_i in match:
        found[pred_i] = 1
    assert found.sum() == config.gt_k  # each output cluster must be mapped

    acc = accuracy(reordered, assign_labels, config.gt_k)
    print(f"got acc {acc:.6f}")

    result_config = dict(vars(args))
    result_meta = {
        "config": result_config,
        "history": {"epoch_acc": [float(acc)]},
        "last_epoch": 0,
        "centroids": kmeans.cluster_centers_,
        "match": match,
    }
    with open(os.path.join(out_dir, "config.pickle"), "wb") as f:
        pickle.dump(result_meta, f)
    with open(os.path.join(out_dir, "config.txt"), "w") as f:
        f.write(config_to_str(argparse.Namespace(**result_config))
                + f"\nepoch_acc: {[float(acc)]}\n")
    sys.stdout.flush()
    return acc


if __name__ == "__main__":
    main()
