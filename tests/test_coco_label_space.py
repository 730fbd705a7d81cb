"""COCO label-space resolution: every Coco* class must resolve
_filter_label / label_filter_table to its Few/Full MIXIN, not the
raising/None base stubs. Regression test for the mixin-order bug the
round-5 paper-parity run test exposed: with bases ordered
(_CocoBase, _CocoFewMixin) the MRO put _SegDatasetBase ahead of the
mixin, so eval raised NotImplementedError and the native train path —
seeing a None table — silently used all-ones relevancy masks (no
coarse/few remap at all). Also locks the Few filter's semantics on a
real on-disk fixture tree (reference cocostuff.py:659-756)."""

import os
import pickle
from types import SimpleNamespace

import numpy as np
import pytest

from iic_tpu.data import seg_datasets as sd

from test_paper_parity_run import _make_coco164k_curated


@pytest.mark.parametrize("cls,mixin", [
    (sd.Coco10kFull, "_CocoFullMixin"), (sd.Coco10kFew, "_CocoFewMixin"),
    (sd.Coco164kFull, "_CocoFullMixin"), (sd.Coco164kFew, "_CocoFewMixin"),
    (sd.Coco164kCuratedFew, "_CocoFewMixin"),
    (sd.Coco164kCuratedFull, "_CocoFullMixin"),
])
def test_coco_mro_resolves_mixin_label_space(cls, mixin):
    assert cls._filter_label.__qualname__.startswith(mixin)
    assert cls.label_filter_table.__qualname__.startswith(mixin)


def _cfg(root, **kw):
    cfg = SimpleNamespace(
        dataset="Coco164kCuratedFew", dataset_root=root, gt_k=3,
        use_coarse_labels=True, coco_164k_curated_version=6,
        input_sz=64, pre_scale_all=False, pre_scale_factor=0.33)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_coco_few_filter_on_disk_fixture(tmp_path):
    _make_coco164k_curated(str(tmp_path), n_train=2, n_val=1, sz=96)
    ds = sd.build_seg_dataset(_cfg(str(tmp_path)), "train2017", "train")
    assert len(ds) == 2

    img, label, mask = ds.get_test(0)
    assert img.shape == (64, 64, 3) and label.shape == (64, 64)
    # fixture fine labels 21/22/23 have coarse parents ground/plant/sky
    # under its identity-mod-27 map -> few indices {2,1,0}; 255 in the
    # png decodes to -1 and must be masked out
    rel = mask.astype(bool)
    assert 0.5 < rel.mean() <= 1.0
    assert set(np.unique(label[rel])) <= {0, 1, 2}
    assert (label[~rel] == -1).all()

    table = ds.label_filter_table()
    assert table is not None and table.shape == (183,)
    # table[raw+1] == per-pixel filter result (the native path contract)
    raw = np.arange(-1, 182, dtype=np.int32).reshape(1, -1)
    per_pixel, m = ds._filter_label(raw)
    np.testing.assert_array_equal(np.where(m, per_pixel, -1)[0],
                                  table[raw[0] + 1])

    # train sample: mask comes from the SAME filter (all-ones would be
    # the silent pre-fix failure mode)
    timg, tmask = ds.get_train(0, np.random.default_rng(0))
    assert timg.shape == (64, 64, 3)
    assert 0.0 < tmask.mean() <= 1.0


def test_coco_full_filter_table_matches_pointwise(tmp_path):
    _make_coco164k_curated(str(tmp_path), n_train=2, n_val=1, sz=96)
    # CuratedFull wants its own curated list name; reuse the Few tree
    os.rename(
        os.path.join(tmp_path, "curated", "train2017",
                     "Coco164kFew_Stuff_6.txt"),
        os.path.join(tmp_path, "curated", "train2017",
                     "Coco164kFull_Stuff_Coarse_7.txt"))
    cfg = _cfg(str(tmp_path), dataset="Coco164kCuratedFull", gt_k=15,
               coco_164k_curated_version=7)
    ds = sd.build_seg_dataset(cfg, "train2017", "train")
    table = ds.label_filter_table()
    assert table is not None
    raw = np.arange(-1, 182, dtype=np.int32).reshape(1, -1)
    per_pixel, m = ds._filter_label(raw)
    np.testing.assert_array_equal(np.where(m, per_pixel, -1)[0],
                                  table[raw[0] + 1])
    # coarse stuff-only space: 15 classes, things (coarse < 12) masked
    kept = table[table >= 0]
    assert kept.size and kept.max() == 14


def test_coco10k_reader_on_disk_fixture(tmp_path):
    """The Coco10k layout (imageLists/<split>.txt, images/<id>.jpg,
    annotations/<id>.mat with "S" in 1..182 — reference cocostuff.py
    _Coco10k) was the one reader path with no on-disk coverage."""
    import cv2
    import scipy.io as sio

    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "images")
    os.makedirs(tmp_path / "annotations")
    os.makedirs(tmp_path / "imageLists")
    fine_to_coarse = {f: f % 27 for f in range(182)}
    with open(tmp_path / "fine_to_coarse_dict.pickle", "wb") as f:
        pickle.dump({"fine_index_to_coarse_index": fine_to_coarse}, f)
    ids = [f"img{i}" for i in range(3)]
    for image_id in ids:
        assert cv2.imwrite(str(tmp_path / "images" / f"{image_id}.jpg"),
                           rng.randint(0, 256, (96, 96, 3), np.uint8))
        # "S" is 1-based raw fine labels (reader subtracts 1)
        s = rng.choice([22, 23, 24], (96, 96)).astype(np.float64)
        sio.savemat(str(tmp_path / "annotations" / f"{image_id}.mat"),
                    {"S": s})
    with open(tmp_path / "imageLists" / "train.txt", "w") as f:
        f.write("\n".join(ids) + "\n")

    cfg = _cfg(str(tmp_path), dataset="Coco10kFew")
    ds = sd.build_seg_dataset(cfg, "train", "train")
    assert len(ds) == 3
    img, label, mask = ds.get_test(0)
    assert img.shape == (64, 64, 3)
    # fine 21/22/23 (after the -1 shift) -> few {0,1,2}; everything kept
    rel = mask.astype(bool)
    assert rel.all()
    assert set(np.unique(label)) <= {0, 1, 2}


def test_coco_few_things_variants(tmp_path):
    """include_things_labels / incl_animal_things grow the Few label
    space (person-things / animal-things) and select the matching
    curated list name (reference cocostuff.py:659-756, _CocoFew)."""
    _make_coco164k_curated(str(tmp_path), n_train=1, n_val=1, sz=64)
    cases = [
        (dict(include_things_labels=True), 4,
         "Coco164kFew_Stuff_People_6", "person-things"),
        (dict(incl_animal_things=True), 4,
         "Coco164kFew_Stuff_Animals_6", "animal-things"),
        (dict(include_things_labels=True, incl_animal_things=True), 5,
         "Coco164kFew_Stuff_People_Animals_6", "animal-things"),
    ]
    for extra, gt_k, list_name, last_class in cases:
        cfg = _cfg(str(tmp_path), gt_k=gt_k, **extra)
        assert sd._curated_few_name(cfg) == list_name
        src = os.path.join(tmp_path, "curated", "train2017",
                           "Coco164kFew_Stuff_6.txt")
        dst = os.path.join(tmp_path, "curated", "train2017",
                           list_name + ".txt")
        if not os.path.exists(dst):
            import shutil
            shutil.copy(src, dst)
        ds = sd.build_seg_dataset(cfg, "train2017", "train")
        assert ds.label_names[-1] == last_class
        assert len(ds.label_names) == gt_k
        table = ds.label_filter_table()
        kept = table[table >= 0]
        assert kept.max() == gt_k - 1
