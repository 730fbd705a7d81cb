"""Native C++ seg batch-prep vs the numpy path."""

from types import SimpleNamespace

import numpy as np
import pytest

from iic_tpu.native import load_seg_prep


def _cfg(**kw):
    cfg = SimpleNamespace(
        dataset="SyntheticSeg3x48x32", dataset_root="", mode="IID",
        batch_sz=8, num_dataloaders=1, input_sz=40, gt_k=3,
        use_coarse_labels=False, pre_scale_all=False, pre_scale_factor=0.5,
        use_random_scale=False, scale_min=0.8, scale_max=1.2,
        jitter_brightness=0.4, jitter_contrast=0.4, jitter_saturation=0.4,
        jitter_hue=0.125, flip_p=0.5, use_random_affine=False,
        sobel=True, no_sobel=False, include_rgb=True, using_IR=False,
        in_channels=5, dataloader_batch_sz=8, eval_mode="hung",
        eval_batch_sz=None, batchnorm_track=True)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


@pytest.fixture(scope="module")
def native_lib():
    lib = load_seg_prep()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_native_matches_numpy_path(native_lib):
    from iic_tpu.data.seg_pipeline import SegTrainPipeline

    cfg = _cfg()
    pipe_native = SegTrainPipeline(cfg, ["train"], seed=3, use_native=True)
    pipe_numpy = SegTrainPipeline(cfg, ["train"], seed=3, use_native=False)

    imgs_n, masks_n, _ = next(pipe_native.epoch(0))
    imgs_p, masks_p, _ = next(pipe_numpy.epoch(0))
    # identical random draws -> identical crops; no scaling -> bit-equal
    np.testing.assert_array_equal(np.asarray(imgs_n), np.asarray(imgs_p))
    np.testing.assert_array_equal(np.asarray(masks_n), np.asarray(masks_p))


def test_native_with_scaling_close(native_lib):
    from iic_tpu.data.seg_pipeline import SegTrainPipeline

    cfg = _cfg(pre_scale_all=True, pre_scale_factor=0.9, input_sz=32)
    pipe_native = SegTrainPipeline(cfg, ["train"], seed=5, use_native=True)
    pipe_numpy = SegTrainPipeline(cfg, ["train"], seed=5, use_native=False)
    imgs_n, masks_n, _ = next(pipe_native.epoch(0))
    imgs_p, masks_p, _ = next(pipe_numpy.epoch(0))
    # same draws, same crops (masks identical); pixel values differ by a
    # few grey levels (float bilinear vs cv2's fixed-point bilinear)
    np.testing.assert_array_equal(np.asarray(masks_n), np.asarray(masks_p))
    a = np.asarray(imgs_n).astype(np.float32)
    b = np.asarray(imgs_p).astype(np.float32)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.995
    assert np.median(np.abs(a - b)) <= 4


def test_native_mask_from_labels(native_lib):
    """COCO-style label table: mask reflects the filtered labels."""
    import ctypes

    lib = native_lib
    rng = np.random.default_rng(0)
    img = np.ascontiguousarray(
        rng.integers(0, 255, (20, 20, 3), dtype=np.uint8))
    label = np.ascontiguousarray(
        rng.integers(-1, 5, (20, 20)).astype(np.int32))
    # table over v+1 for v in [-1, 5): map v>=2 -> v-2, else masked
    table = np.array([-1, -1, -1, 0, 1, 2], np.int32)

    sz = 16
    imgs_out = np.empty((1, sz, sz, 3), np.uint8)
    masks_out = np.empty((1, sz, sz), np.uint8)
    img_ptrs = (ctypes.c_void_p * 1)(img.ctypes.data)
    lab_ptrs = (ctypes.c_void_p * 1)(label.ctypes.data)
    heights = np.array([20], np.int32)
    widths = np.array([20], np.int32)
    scales = np.array([1.0], np.float32)
    h_cs = np.array([10], np.int32)
    w_cs = np.array([10], np.int32)
    ret = lib.seg_prepare_batch(
        img_ptrs, lab_ptrs,
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        3, 1,
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h_cs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        w_cs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sz, table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(table),
        imgs_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        masks_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 2)
    assert ret == 0
    crop = label[2:18, 2:18]
    np.testing.assert_array_equal(masks_out[0], (crop >= 2).astype(np.uint8))
    np.testing.assert_array_equal(imgs_out[0], img[2:18, 2:18])
