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
