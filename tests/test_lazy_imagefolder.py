"""--lazy_images: decode-on-demand ImageFolder loaders.

The reference's torchvision ImageFolder decodes per __getitem__, so user
datasets larger than host RAM stream batch by batch; our default reader
decodes the whole folder up front (fast at the published scales). The
lazy path restores the streaming property — LazyImageArray holds paths,
decodes per access on the loaders' prefetch thread — with a strict
contract: BIT-IDENTICAL batches to the eager path."""

import os
from types import SimpleNamespace

import numpy as np

from iic_tpu.data import readers


def _write_folder(root, sizes_by_class, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    n = 0
    for cname in sorted(sizes_by_class):
        cdir = os.path.join(root, cname)
        os.makedirs(cdir, exist_ok=True)
        for i, (h, w) in enumerate(sizes_by_class[cname]):
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            cv2.imwrite(os.path.join(cdir, f"im_{i}.png"), img)
            n += 1
    return n


def _cfg(root, **kw):
    base = dict(
        dataset="ImageFolder", dataset_root=root, mode="IID",
        batch_sz=4, num_dataloaders=2, input_sz=16, gt_k=2,
        crop_orig=True, rand_crop_sz=20, include_rgb=True,
        fluid_warp=False, cutout=False, demean=False,
        per_img_demean=False, batchnorm_track=True, lazy_images=False)
    base.update(kw)
    return SimpleNamespace(**base)


def test_lazy_reader_matches_eager(tmp_path):
    """Same files, same labels, same modal-shape resize, same pixels —
    for int / slice / fancy access and full materialisation."""
    root = str(tmp_path)
    _write_folder(os.path.join(root, "train"),
                  {"b": [(24, 24), (24, 24), (20, 28)],
                   "a": [(24, 24), (16, 24)]})
    eager = readers.load_image_folder(root, "train")
    lazy = readers.load_image_folder_lazy(root, "train")

    assert isinstance(lazy["images"], readers.LazyImageArray)
    assert lazy["images"].shape == eager["images"].shape
    assert len(lazy["images"]) == len(eager["images"])
    np.testing.assert_array_equal(lazy["labels"], eager["labels"])
    np.testing.assert_array_equal(np.asarray(lazy["images"]),
                                  eager["images"])
    np.testing.assert_array_equal(lazy["images"][2], eager["images"][2])
    np.testing.assert_array_equal(lazy["images"][1:4], eager["images"][1:4])
    idx = np.array([4, 0, 2])
    np.testing.assert_array_equal(lazy["images"][idx], eager["images"][idx])
    # select(): lazy reorder — still path-backed, same decoded values
    sub = lazy["images"].select(idx)
    assert isinstance(sub, readers.LazyImageArray)
    np.testing.assert_array_equal(np.asarray(sub), eager["images"][idx])


def test_lazy_reader_decodes_nothing_up_front(tmp_path, monkeypatch):
    """Construction probes headers only; pixel decode happens per access."""
    import cv2

    root = str(tmp_path)
    _write_folder(os.path.join(root, "train"), {"a": [(20, 20)] * 5})
    calls = []
    real = cv2.imread
    monkeypatch.setattr(
        cv2, "imread", lambda *a, **k: calls.append(a) or real(*a, **k))
    d = readers.load_image_folder_lazy(root, "train")
    assert calls == []
    d["images"][3]
    assert len(calls) == 1
    d["images"][1:3]
    assert len(calls) == 3


def test_lazy_pipeline_batches_match_eager(tmp_path):
    """create_basic_clustering_dataloaders under --lazy_images: identical
    train batches (deterministic shuffled order) and identical mapping
    batches, including truncate_pc (which stays decode-on-demand)."""
    from iic_tpu.data.pipeline import (
        MappingLoader, create_basic_clustering_dataloaders)

    root = str(tmp_path)
    _write_folder(os.path.join(root, "train"),
                  {"a": [(24, 24)] * 6, "b": [(24, 24)] * 6})
    _write_folder(os.path.join(root, "none"),
                  {"a": [(24, 24)] * 4, "b": [(24, 24)] * 4}, seed=1)

    pa_e, _, ma_e, _ = create_basic_clustering_dataloaders(_cfg(root))
    pa_l, _, ma_l, _ = create_basic_clustering_dataloaders(
        _cfg(root, lazy_images=True))
    assert isinstance(pa_l.images, readers.LazyImageArray)

    for (b_e, _), (b_l, _) in zip(pa_e.epoch(0, augmented=False),
                                  pa_l.epoch(0, augmented=False)):
        np.testing.assert_array_equal(np.asarray(b_e), np.asarray(b_l))
    for (x_e, y_e), (x_l, y_l) in zip(ma_e, ma_l):
        np.testing.assert_array_equal(np.asarray(x_e), np.asarray(x_l))
        np.testing.assert_array_equal(y_e, y_l)

    # fewer-labels truncation: the lazy loader re-indexes without decoding
    cfg_t = _cfg(root)
    cfg_t.mapping_assignment_partitions = ["none"]
    tr_e = MappingLoader(cfg_t, ["none"], truncate_pc=0.5)
    tr_l = MappingLoader(_cfg(root, lazy_images=True), ["none"],
                         truncate_pc=0.5)
    assert isinstance(tr_l.images, readers.LazyImageArray)
    assert len(tr_l) == len(tr_e)
    for (x_e, y_e), (x_l, y_l) in zip(tr_e, tr_l):
        np.testing.assert_array_equal(np.asarray(x_e), np.asarray(x_l))
        np.testing.assert_array_equal(y_e, y_l)
