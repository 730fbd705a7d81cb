"""Segmentation data layer tests: host geometry parity, device augmentation
structure (affine inverse correctness, flip bookkeeping), pipeline shapes,
label filtering, end-to-end seg trainer smoke."""

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu.data.seg_transforms import (
    pad_and_or_crop, pad_if_too_small, seg_random_affine)
from iic_tpu.data.seg_pipeline import (
    SegMappingLoader, SegTrainPipeline, make_seg_augment,
    segmentation_create_dataloaders)
from iic_tpu.ops.affine import perform_affine_tf


def test_pad_if_too_small_centres():
    img = np.ones((4, 6), np.float32)
    out = pad_if_too_small(img, 8)
    assert out.shape == (8, 8)
    assert out.sum() == img.sum()
    # centred: rows 2..5, cols 1..6
    assert out[2:6, 1:7].sum() == img.sum()


def test_pad_and_or_crop_modes():
    img = np.arange(100, dtype=np.float32).reshape(10, 10)
    out, (hc, wc) = pad_and_or_crop(img, 4, mode="centre")
    assert out.shape == (4, 4)
    assert hc == 5 and wc == 5
    out2, _ = pad_and_or_crop(img, 4, mode="fixed", coords=(hc, wc))
    np.testing.assert_array_equal(out, out2)
    rng = np.random.default_rng(0)
    for _ in range(10):
        out3, (h3, w3) = pad_and_or_crop(img, 4, mode="random", rng=rng)
        assert out3.shape == (4, 4)
        # crop coords map back into the original image
        np.testing.assert_array_equal(
            out3, img[h3 - 2:h3 + 2, w3 - 2:w3 + 2])


def test_seg_random_affine_inverse_roundtrip():
    """affine2_to_1 must invert the warp applied to img2 (interior)."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    img = np.stack([np.sin(4 * xx) * np.cos(3 * yy)])  # (1, 64, 64) smooth
    img_j = jnp.asarray(img)

    warped, aff2to1 = seg_random_affine(
        img_j, jax.random.PRNGKey(3), min_rot=-15, max_rot=15,
        min_shear=-5, max_shear=5, min_scale=0.95, max_scale=1.05)
    restored = perform_affine_tf(warped[None], aff2to1[None])[0]
    interior = (slice(None), slice(16, 48), slice(16, 48))
    np.testing.assert_allclose(np.asarray(restored)[interior],
                               img[interior], atol=0.05)


def _seg_cfg(**kw):
    cfg = SimpleNamespace(
        dataset="SyntheticSeg3x48x32", dataset_root="", mode="IID",
        batch_sz=8, num_dataloaders=1, input_sz=40, gt_k=3,
        output_k=3, output_k_A=6, output_k_B=3, num_sub_heads=1,
        use_coarse_labels=False, pre_scale_all=False, pre_scale_factor=0.5,
        use_random_scale=False, scale_min=0.8, scale_max=1.2,
        jitter_brightness=0.4, jitter_contrast=0.4, jitter_saturation=0.4,
        jitter_hue=0.125, flip_p=0.5, use_random_affine=True,
        aff_min_rot=-10.0, aff_max_rot=10.0, aff_min_shear=-5.0,
        aff_max_shear=5.0, aff_min_scale=0.9, aff_max_scale=1.1,
        sobel=True, no_sobel=False, include_rgb=True, using_IR=False,
        in_channels=5, dataloader_batch_sz=8, eval_mode="hung",
        eval_batch_sz=None, batchnorm_track=True, num_epochs=2,
        half_T_side_dense=2, half_T_side_sparse_min=0,
        half_T_side_sparse_max=0)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_seg_pipeline_shapes_and_determinism():
    cfg = _seg_cfg()
    pipe, map_a, map_t = segmentation_create_dataloaders(cfg)
    img1, img2, aff, mask = next(pipe.epoch(0, augmented=True))
    assert img1.shape == (8, 4, 40, 40)  # rgb + grey (pre-sobel)
    assert img2.shape == (8, 4, 40, 40)
    assert aff.shape == (8, 2, 3)
    assert mask.shape == (8, 40, 40)
    # determinism per epoch
    a1 = next(pipe.epoch(1, augmented=True))
    a2 = next(pipe.epoch(1, augmented=True))
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))

    imgs, labels, masks = next(iter(map_a))
    assert imgs.shape[1:] == (4, 40, 40)
    assert labels.shape[1:] == (40, 40)
    assert labels.max() < 3
    assert masks.min() >= 0


def test_seg_fast_host_batch_matches_per_sample_path():
    """The batched numpy fast path (_numpy_batch) consumes the SAME rng
    stream and must produce bit-identical batches to the per-sample
    get_train path, across a full epoch (incl. the ragged final batch)."""
    cfg = _seg_cfg(batch_sz=6, dataloader_batch_sz=6)  # 32 imgs: ragged
    fast = SegTrainPipeline(cfg, ["train"], use_native=False)
    slow = SegTrainPipeline(cfg, ["train"], use_native=False,
                            use_fast_host=False)
    assert fast._fast_host and not slow._fast_host
    for (fi, fm, fk), (si, sm, sk) in zip(fast.epoch(0, augmented=False),
                                          slow.epoch(0, augmented=False)):
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(si))
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(sm))
        np.testing.assert_array_equal(np.asarray(fk), np.asarray(sk))


def test_seg_fast_host_mask_cache_budget_gate(monkeypatch):
    """With the raw-mask cache budget forced to 0 the fast path must
    recompute per batch and still produce identical batches (the cache
    is a pure memoisation of keep[lab+1])."""
    monkeypatch.setenv("IIC_TPU_MASK_CACHE_BYTES", "0")
    cfg = _seg_cfg(batch_sz=6, dataloader_batch_sz=6)
    gated = SegTrainPipeline(cfg, ["train"], use_native=False)
    assert gated._mask_cache_budget == 0
    monkeypatch.delenv("IIC_TPU_MASK_CACHE_BYTES")
    cached = SegTrainPipeline(cfg, ["train"], use_native=False)
    for (gi, gm, gk), (ci, cm, ck) in zip(
            gated.epoch(0, augmented=False),
            cached.epoch(0, augmented=False)):
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(ci))
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(cm))
    assert not gated._mask_cache and cached._mask_cache


def test_seg_pipeline_flip_negates_affine_row():
    cfg = _seg_cfg(use_random_affine=False)
    augment = make_seg_augment(cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (16, 40, 40, 3),
                                          dtype=np.uint8))
    masks = jnp.ones((16, 40, 40), jnp.uint8)
    _, img2, aff, _ = jax.jit(augment)(imgs, masks, jax.random.PRNGKey(0))
    aff = np.asarray(aff)
    # identity affine, so flipped samples have top row [-1, 0, 0]
    flipped = aff[:, 0, 0] < 0
    assert 0 < flipped.sum() < 16  # both outcomes occur
    np.testing.assert_allclose(aff[flipped][:, 0], [[-1, 0, 0]] *
                               int(flipped.sum()), atol=1e-6)
    np.testing.assert_allclose(aff[~flipped][:, 0], [[1, 0, 0]] *
                               int((~flipped).sum()), atol=1e-6)


@pytest.mark.slow  # compile-heavy end-to-end trainer
def test_seg_trainer_smoke(tmp_path):
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_trainer import train_segmentation_twohead
    cfg = SegConfig(
        model_ind=3, arch="SegmentationNet10aTwoHead", mode="IID",
        dataset="SyntheticSeg3x48x16", dataset_root="", gt_k=3,
        output_k_A=6, output_k_B=3, num_sub_heads=1, lr=1e-3,
        num_epochs=3, batch_sz=8, num_dataloaders=1,
        out_root=str(tmp_path), input_sz=40, half_T_side_dense=1,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        include_rgb=True, batchnorm_track=True, test_code=True,
        save_freq=1, use_uncollapsed_loss=False)
    cfg.finalize(twohead=True)
    assert cfg.in_channels == 5  # rgb + dx + dy
    state, history = train_segmentation_twohead(cfg)
    assert len(history["eval"].epoch_acc) == 2
    assert np.isfinite(history["epoch_loss_head_B"][0])


def test_potsdam_ir_channel_layout():
    """Potsdam: rgb jittered, ir passed through un-jittered, appended last
    (reference potsdam.py:146-178)."""
    cfg = _seg_cfg(using_IR=True, include_rgb=True)
    augment = make_seg_augment(cfg)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 255, (4, 40, 40, 4), dtype=np.uint8))
    masks = jnp.ones((4, 40, 40), jnp.uint8)
    img1, img2, aff, _ = jax.jit(augment)(imgs, masks,
                                          jax.random.PRNGKey(0))
    assert img1.shape == (4, 5, 40, 40)  # rgb + grey + ir
    # ir channel of img1 unchanged from input
    np.testing.assert_allclose(
        np.asarray(img1)[:, 4], np.asarray(imgs)[..., 3] / 255.0,
        atol=1e-6)


def test_seg_num_dataloaders_repeat_pairing():
    """num_dataloaders=r>1: each batch is the same dataloader_batch_sz base
    images repeated r times with independent augmentation draws (reference
    segmentation_twohead.py:262-303 assembles r parallel sub-batches)."""
    # input_sz == raw size 48 makes the host crop deterministic, so the
    # repeats' raw images must be bit-identical.
    cfg = _seg_cfg(num_dataloaders=2, batch_sz=8, dataloader_batch_sz=4,
                   input_sz=48, use_random_affine=False)
    pipe = SegTrainPipeline(cfg, ["train"])
    imgs_u8, masks_u8, key = next(pipe.epoch(0, augmented=False))
    assert imgs_u8.shape[0] == 8  # dataloader_batch_sz * r
    np.testing.assert_array_equal(np.asarray(imgs_u8)[:4],
                                  np.asarray(imgs_u8)[4:])
    img1, img2, aff, mask = next(pipe.epoch(0, augmented=True))
    assert img1.shape[0] == 8
    # repeats share the base image but get independent img2 jitter draws
    assert np.abs(np.asarray(img2)[:4] - np.asarray(img2)[4:]).max() > 1e-3
    # an epoch still visits every image once per loader
    assert len(pipe) == int(np.ceil(32 / 4))


@pytest.mark.slow  # compile-heavy end-to-end trainer
def test_seg_trainer_smoke_potsdam_ir(tmp_path):
    """Potsdam-shaped IR path end to end: 4-channel raw input, using_IR
    derived from the dataset name, rgb+grey+sobel+ir channel sandwich
    through the trainer."""
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_trainer import train_segmentation_twohead
    cfg = SegConfig(
        model_ind=4, arch="SegmentationNet10aTwoHead", mode="IID",
        dataset="SyntheticSegPotsdam3x48x16", dataset_root="", gt_k=3,
        output_k_A=6, output_k_B=3, num_sub_heads=1, lr=1e-3,
        num_epochs=3, batch_sz=8, num_dataloaders=1,
        out_root=str(tmp_path), input_sz=40, half_T_side_dense=1,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        include_rgb=True, batchnorm_track=True, test_code=True,
        save_freq=1)
    cfg.finalize(twohead=True)
    assert cfg.using_IR and cfg.in_channels == 6  # rgb + dx dy + ir
    state, history = train_segmentation_twohead(cfg)
    assert np.isfinite(history["epoch_loss_head_B"][0])
    assert len(history["eval"].epoch_acc) == 2


def test_seg_resident_pipeline_matches_host_path():
    """Device-resident input mode: identical augment outputs where the crop
    is degenerate (raw size == input_sz), identical shapes otherwise, and
    per-epoch determinism."""
    # degenerate crop: img1/mask must be bit-identical to the host path
    kw = dict(dataset="SyntheticSeg3x40x16", input_sz=40,
              num_dataloaders=2, batch_sz=8, dataloader_batch_sz=4,
              use_random_affine=False)
    pipe_r = SegTrainPipeline(_seg_cfg(**kw), ["train"], resident=True)
    pipe_h = SegTrainPipeline(_seg_cfg(**kw), ["train"], use_native=False)
    (i1r, _, _, mr) = next(pipe_r.epoch(0, augmented=True))
    (i1h, _, _, mh) = next(pipe_h.epoch(0, augmented=True))
    np.testing.assert_allclose(np.asarray(i1r), np.asarray(i1h),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mr), np.asarray(mh))

    # real crop: shapes, dtypes, determinism of the device draws
    pipe = SegTrainPipeline(_seg_cfg(), ["train"], resident=True)
    a = [np.asarray(t[0]) for t in pipe.epoch(3, augmented=True)]
    b = [np.asarray(t[0]) for t in pipe.epoch(3, augmented=True)]
    (i1, i2, aff, m) = next(pipe.epoch(3, augmented=True))
    # sobel path pre-conv channels: rgb(3) + grey(1)
    assert i1.shape == (8, 4, 40, 40) and m.shape == (8, 40, 40)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_seg_resident_trainer_smoke(tmp_path):
    """--resident_data through the full twohead seg trainer."""
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_trainer import train_segmentation_twohead
    cfg = SegConfig(
        model_ind=7, arch="SegmentationNet10aTwoHead", mode="IID",
        dataset="SyntheticSeg3x40x16", dataset_root="", gt_k=3,
        output_k_A=6, output_k_B=3, num_sub_heads=1, lr=1e-3,
        num_epochs=2, batch_sz=8, num_dataloaders=1,
        out_root=str(tmp_path), input_sz=32, half_T_side_dense=1,
        include_rgb=True, batchnorm_track=True, test_code=True,
        save_freq=1, resident_data=True)
    cfg.finalize(twohead=True)
    state, history = train_segmentation_twohead(cfg)
    assert np.isfinite(history["epoch_loss_head_B"][0])


def test_stripes_dataset_texture_only_and_balanced():
    """SyntheticSegStripes (the real-chip seg regression dataset): class
    shares near-uniform and per-class pixel-intensity statistics
    indistinguishable — pointwise colour must carry no class signal, so
    only spatial context (displacement invariance) can beat the prior."""
    from iic_tpu.data.seg_datasets import SyntheticSegStripes

    cfg = _seg_cfg(dataset="SyntheticSegStripes3x64x32", input_sz=64)
    ds = SyntheticSegStripes(cfg, "train", "train")
    assert ds.images.shape == (32, 64, 64, 3)
    lab = ds.labels
    shares = np.bincount(lab.ravel(), minlength=3) / lab.size
    assert shares.max() < 0.45  # majority prior stays near chance
    stats = [(ds.images[..., 0][lab == c].mean(),
              ds.images[..., 0][lab == c].std()) for c in range(3)]
    means, stds = zip(*stats)
    assert max(means) - min(means) < 4.0   # of a 0..255 range
    assert max(stds) - min(stds) < 4.0
    # deterministic (regression band depends on it)
    ds2 = SyntheticSegStripes(cfg, "train", "train")
    np.testing.assert_array_equal(ds.images, ds2.images)
    # test split differs from train (different generator stream)
    ds_t = SyntheticSegStripes(cfg, "test", "test")
    assert ds_t.images.shape[0] == 8
    assert not np.array_equal(ds_t.images[0], ds.images[0])
