"""Semisup tests: TenCrop structure, block-averaged accuracy, and the full
finetune-from-pretrained-run flow on synthetic data."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iic_tpu.data.semisup import make_tencrop_batch_fn, ten_crop

pytestmark = pytest.mark.slow  # compile-heavy end-to-end suite


def test_ten_crop_structure():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (96, 96, 3)).astype(np.float32))
    crops = ten_crop(img, 64)
    assert crops.shape == (10, 64, 64, 3)
    a = np.asarray(img)
    c = np.asarray(crops)
    np.testing.assert_array_equal(c[0], a[:64, :64])       # tl
    np.testing.assert_array_equal(c[1], a[:64, 32:])       # tr
    np.testing.assert_array_equal(c[2], a[32:, :64])       # bl
    np.testing.assert_array_equal(c[3], a[32:, 32:])       # br
    np.testing.assert_array_equal(c[4], a[16:80, 16:80])   # centre
    # second five are crops of the flipped image
    np.testing.assert_array_equal(c[5], a[:, ::-1][:64, :64])


def test_tencrop_batch_contiguous_blocks():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (3, 96, 96, 3), dtype=np.uint8)
    fn = make_tencrop_batch_fn(64, include_rgb=True)
    out = np.asarray(fn(jnp.asarray(imgs)))
    assert out.shape == (30, 4, 64, 64)  # rgb + grey
    # block i contains crops of image i only: compare means roughly
    for i in range(3):
        block = out[i * 10:(i + 1) * 10]
        ref_mean = imgs[i].astype(np.float32).mean() / 255.0
        assert abs(block[:, :3].mean() - ref_mean) < 0.1


def test_semisup_end_to_end(tmp_path):
    """Pretrain a tiny IID+ run, then finetune with SupHead5: accuracy on
    the synthetic test split should clearly beat chance."""
    from iic_tpu.train.config import ClusterConfig, SemisupConfig
    from iic_tpu.train import train_cluster_single
    from iic_tpu.train.semisup_trainer import train_semisup

    old_cfg = ClusterConfig(
        model_ind=11, arch="ClusterNet6c", mode="IID+",
        dataset="Synthetic10x32x3x128", dataset_root="",
        gt_k=10, output_k=20, lr=1e-3, num_epochs=2, batch_sz=32,
        num_dataloaders=2, num_sub_heads=1, out_root=str(tmp_path),
        crop_orig=True, rand_crop_sz=28, input_sz=24, include_rgb=True,
        batchnorm_track=True, test_code=True, save_freq=1)
    old_cfg.finalize(twohead=False, sobel=True)
    train_cluster_single(old_cfg)

    cfg = SemisupConfig(
        model_ind=12, old_model_ind=11, head_lr=1e-2, trunk_lr=1e-3,
        num_epochs=8, new_batch_sz=32, out_root=str(tmp_path),
        test_code=False, contiguous_sz=10)
    cfg.finalize()
    state, history = train_semisup(cfg)
    assert len(history["epoch_acc"]) >= 2
    assert np.isfinite(history["epoch_loss"][-1])
    # CE loss must collapse and acc clearly beat 10% chance
    assert history["epoch_loss"][-1] < 1.0
    assert max(history["epoch_acc"]) > 0.25


def test_semisup_greyscale_fewer_labels(tmp_path):
    """Greyscale old model (MNIST-family) + --train_label_pc: the semisup
    finetune runs through the greyscale tf2 path with no sobel stage and
    truncates the supervised split to the requested fraction."""
    from iic_tpu.train.config import ClusterConfig, SemisupConfig
    from iic_tpu.train import train_cluster_single
    from iic_tpu.train.semisup_trainer import train_semisup

    old_cfg = ClusterConfig(
        model_ind=13, arch="ClusterNet6c", mode="IID+",
        dataset="Synthetic10x32x1x128", dataset_root="",
        gt_k=10, output_k=20, lr=1e-3, num_epochs=2, batch_sz=32,
        num_dataloaders=2, num_sub_heads=1, out_root=str(tmp_path),
        crop_orig=True, tf1_crop="centre", tf1_crop_sz=28,
        tf2_crop="random", tf2_crop_szs=(28,), input_sz=24,
        rot_val=25.0, no_flip=True,
        batchnorm_track=True, test_code=True, save_freq=1)
    old_cfg.finalize(twohead=False, sobel=False)
    train_cluster_single(old_cfg)

    cfg = SemisupConfig(
        model_ind=14, old_model_ind=13, head_lr=1e-2, trunk_lr=1e-3,
        num_epochs=6, new_batch_sz=16, out_root=str(tmp_path),
        train_label_pc=0.5, test_code=False, contiguous_sz=10)
    cfg.finalize()
    state, history = train_semisup(cfg)
    assert np.isfinite(history["epoch_loss"][-1])
    # 64 random synthetic samples can't generalise in 6 epochs (the real
    # end-to-end evidence is the Digits run in VALIDATION.md); assert the
    # mechanics: the CE loss collapses onto the truncated labelled set
    # through the greyscale tf2 path, and eval produces finite accs
    assert min(history["epoch_loss"]) < 1.0
    assert np.isfinite(history["epoch_acc"]).all()
