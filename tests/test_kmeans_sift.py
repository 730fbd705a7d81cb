"""kmeans_and_sift baseline: archetype-config reload, vectorised
per-pixel colour / dense-SIFT sampling, eval-mode dispatch, run-dir
outputs (reference code/scripts/segmentation/baselines/
kmeans_and_sift.py:23-111,170-299)."""

import dataclasses
import os
import pickle

import numpy as np
import pytest

from iic_tpu.cli.kmeans_and_sift import (SIFT_DLEN, SIFT_STEP,
                                         get_vectorised_colour_samples,
                                         get_vectorised_sift_samples, main)
from iic_tpu.train.config import SegConfig


def _write_archetype(out_root, model_ind=77, mode="IID", **kw):
    cfg = SegConfig(
        model_ind=model_ind, arch="SegmentationNet10aTwoHead", mode=mode,
        dataset="SyntheticSeg3x48x32", dataset_root="", gt_k=3,
        output_k_A=6, output_k_B=3, batch_sz=8, num_dataloaders=1,
        input_sz=40, use_random_scale=False, use_random_affine=True,
        no_sobel=False, include_rgb=True, out_root=str(out_root),
        half_T_side_dense=2, num_epochs=2)
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.finalize(twohead=True)
    d = os.path.join(str(out_root), str(model_ind))
    os.makedirs(d, exist_ok=True)
    meta = {"config": dataclasses.asdict(cfg),
            "history": {}, "last_epoch": 0}
    with open(os.path.join(d, "config.pickle"), "wb") as f:
        pickle.dump(meta, f)
    return cfg


def _fake_batches(n=2, b=3, sz=40, c=3, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        imgs = rng.integers(0, 255, (b, sz, sz, c), dtype=np.uint8)
        masks = rng.random((b, sz, sz)) > 0.3
        labels = rng.integers(0, 3, (b, sz, sz)).astype(np.int32)
        yield imgs, masks, labels


class _Cfg:
    input_sz = 40
    in_channels = 3


def test_colour_samples_are_exactly_the_unmasked_pixels():
    batches = list(_fake_batches())
    samples, labels = get_vectorised_colour_samples(_Cfg(), iter(batches))
    n_unmasked = sum(m.sum() for _, m, _ in batches)
    assert samples.shape == (n_unmasked, 3)
    assert labels.shape == (n_unmasked,)
    # first batch, first image: row-major order of unmasked pixels
    imgs, masks, labs = batches[0]
    np.testing.assert_array_equal(samples[: masks[0].sum()],
                                  imgs[0][masks[0]])
    np.testing.assert_array_equal(labels[: masks[0].sum()],
                                  labs[0][masks[0]])


def test_sift_samples_grid_and_masking():
    pytest.importorskip("cv2")
    batches = list(_fake_batches(n=1, b=2))
    samples, labels = get_vectorised_sift_samples(_Cfg(), iter(batches))
    desc_side = 40 // SIFT_STEP
    centres = np.arange(desc_side) * SIFT_STEP + SIFT_STEP // 2
    ch, cw = np.meshgrid(centres, centres, indexing="ij")
    imgs, masks, labs = batches[0]
    keep = np.stack([m[ch, cw] for m in masks]).reshape(-1)
    assert samples.shape == (keep.sum(), SIFT_DLEN)
    assert samples.dtype == np.uint8
    # labels are the box-central pixels' labels, masked identically
    want = np.stack([la[ch, cw] for la in labs]).reshape(-1)[keep]
    np.testing.assert_array_equal(labels, want)


@pytest.mark.parametrize("do_sift", [False, True])
def test_end_to_end_synthetic(tmp_path, do_sift):
    pytest.importorskip("cv2")
    pytest.importorskip("sklearn")
    _write_archetype(tmp_path)
    argv = ["--model_ind", "78", "--IID_model_ind", "77",
            "--max_num_train", "5000", "--test_code",
            "--out_root", str(tmp_path)]
    if do_sift:
        argv.append("--do_sift")
    acc = main(argv)
    assert 0.0 <= acc <= 1.0
    # SyntheticSeg textures are class-dependent: colour k-means must beat
    # chance (1/3) comfortably
    if not do_sift:
        assert acc > 0.45
    d = os.path.join(str(tmp_path), "78")
    with open(os.path.join(d, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    assert meta["history"]["epoch_acc"] == [pytest.approx(acc)]
    assert meta["centroids"].shape[0] == 3
    assert os.path.exists(os.path.join(d, "config.txt"))


def test_rejects_non_iid_archetype(tmp_path):
    _write_archetype(tmp_path, model_ind=79, mode="IID+")
    with pytest.raises(AssertionError):
        main(["--model_ind", "80", "--IID_model_ind", "79",
              "--max_num_train", "100", "--test_code",
              "--out_root", str(tmp_path)])


def test_orig_eval_mode_dispatch(tmp_path):
    # many-to-one matching path: force eval_mode orig on an IID archetype
    cfg = _write_archetype(tmp_path, model_ind=81)
    d = os.path.join(str(tmp_path), "81")
    with open(os.path.join(d, "config.pickle"), "rb") as f:
        meta = pickle.load(f)
    meta["config"]["eval_mode"] = "orig"
    with open(os.path.join(d, "config.pickle"), "wb") as f:
        pickle.dump(meta, f)
    acc = main(["--model_ind", "82", "--IID_model_ind", "81",
                "--max_num_train", "100", "--test_code",
                "--out_root", str(tmp_path)])
    assert 0.0 <= acc <= 1.0
    assert cfg.gt_k == 3
