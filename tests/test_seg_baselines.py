"""Doersch/Isola baseline tests + FFT joint parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iic_tpu.ops.iid_seg_loss import (
    IID_segmentation_loss_uncollapsed, displacement_joint_dense,
    displacement_joint_dense_fft)

pytestmark = pytest.mark.slow  # compile-heavy end-to-end suite


def test_fft_joint_matches_conv():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (3, 4, 24, 24)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0, 1, (3, 4, 24, 24)).astype(np.float32))
    for half in (0, 2, 5):
        a = np.asarray(displacement_joint_dense(x1, x2, half))
        b = np.asarray(displacement_joint_dense_fft(x1, x2, half))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_uncollapsed_loss_fft_matches_conv():
    rng = np.random.default_rng(1)
    def softmax_maps():
        logits = rng.standard_normal((2, 3, 20, 20)).astype(np.float32)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return jnp.asarray(e / e.sum(axis=1, keepdims=True))
    x1, x2 = softmax_maps(), softmax_maps()
    aff = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (2, 1, 1))
    mask = jnp.ones((2, 20, 20))
    kwargs = dict(lamb=1.0, half_T_side_dense=3, half_T_side_sparse_min=0,
                  half_T_side_sparse_max=0)
    conv, _ = IID_segmentation_loss_uncollapsed(
        x1, x2, aff, mask, joint_impl="conv", **kwargs)
    fft, _ = IID_segmentation_loss_uncollapsed(
        x1, x2, aff, mask, joint_impl="fft", **kwargs)
    np.testing.assert_allclose(float(fft), float(conv), rtol=1e-4,
                               atol=1e-5)


def test_get_patches():
    from iic_tpu.models.seg_baselines import get_patches
    feats = jnp.arange(2 * 1 * 16 * 16, dtype=jnp.float32).reshape(
        2, 1, 16, 16)
    centres = jnp.asarray([[8, 8], [5, 10]], jnp.int32)
    patches = get_patches(feats, centres, 4)
    assert patches.shape == (2, 1, 4, 4)
    np.testing.assert_array_equal(
        np.asarray(patches[0, 0]), np.asarray(feats[0, 0, 6:10, 6:10]))
    np.testing.assert_array_equal(
        np.asarray(patches[1, 0]), np.asarray(feats[1, 0, 3:7, 8:12]))


def test_doersch_pair_sampling():
    from iic_tpu.train.seg_baseline_trainers import sample_doersch_pairs
    centre, other, labels = sample_doersch_pairs(
        jax.random.PRNGKey(0), 64, input_sz=64, patch_side=9)
    assert centre.shape == (64, 2) and labels.shape == (64,)
    assert (labels >= 0).all() and (labels < 9).all()
    # offsets consistent with labels
    offs = np.asarray(other) - np.asarray(centre)
    assert set(np.unique(offs)).issubset({-9, 0, 9})
    # all patches in-bounds
    for pts in (np.asarray(centre), np.asarray(other)):
        assert (pts - 4 >= 0).all() and (pts + 4 < 64).all()


def test_doersch_baseline_smoke(tmp_path):
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_baseline_trainers import train_seg_baseline

    cfg = SegConfig(
        model_ind=51, arch="SegmentationNet10aDoersch", mode="IID",
        dataset="SyntheticSeg3x64x12", dataset_root="", gt_k=3,
        output_k_A=3, output_k_B=3, num_sub_heads=1, lr=1e-3,
        num_epochs=2, batch_sz=4, num_dataloaders=1,
        out_root=str(tmp_path), input_sz=56, half_T_side_dense=0,
        include_rgb=True, batchnorm_track=True, test_code=True,
        save_freq=1, use_doersch_datasets=True)  # colour-dropping on,
    # like the real doersch CLI (reference doersch.py:98 + data.py:104)
    cfg.finalize(twohead=False)
    cfg.doersch_patch_side = 5
    state, history = train_seg_baseline(cfg, kind="doersch")
    assert np.isfinite(history["epoch_loss"][0])
    assert len(history["epoch_acc"]) == 2


def test_isola_baseline_smoke(tmp_path):
    """Isola adjacency baseline end-to-end with the reference's shared
    per-batch patch sampling + masked BCE."""
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_baseline_trainers import train_seg_baseline

    cfg = SegConfig(
        model_ind=52, arch="SegmentationNet10aIsola", mode="IID",
        dataset="SyntheticSeg3x64x12", dataset_root="", gt_k=3,
        output_k_A=3, output_k_B=3, num_sub_heads=1, lr=1e-3,
        num_epochs=2, batch_sz=4, num_dataloaders=1,
        out_root=str(tmp_path), input_sz=56, half_T_side_dense=0,
        include_rgb=True, batchnorm_track=True, test_code=True,
        save_freq=1)
    cfg.finalize(twohead=False)
    cfg.isola_patch_side = 5
    state, history = train_seg_baseline(cfg, kind="isola")
    assert np.isfinite(history["epoch_loss"][0])
    assert len(history["epoch_acc"]) == 2


@pytest.mark.slow
def test_doersch_save_multiple_snapshots(tmp_path):
    """--save_multiple keeps numbered snapshots every 3 epochs
    (reference doersch.py:362-364) alongside latest/best."""
    import os
    from iic_tpu.train.config import SegConfig
    from iic_tpu.train.seg_baseline_trainers import train_seg_baseline

    cfg = SegConfig(
        model_ind=54, arch="SegmentationNet10aDoersch", mode="IID",
        dataset="SyntheticSeg3x64x12", dataset_root="", gt_k=3,
        output_k_A=3, output_k_B=3, num_sub_heads=1, lr=1e-3,
        num_epochs=5, batch_sz=4, num_dataloaders=1,
        out_root=str(tmp_path), input_sz=56, half_T_side_dense=0,
        include_rgb=True, batchnorm_track=True, save_freq=2,
        save_multiple=True, verbose=True)
    cfg.finalize(twohead=False)
    cfg.doersch_patch_side = 5
    train_seg_baseline(cfg, kind="doersch")
    d = os.path.join(str(tmp_path), "54")
    assert os.path.exists(os.path.join(d, "e_3.ckpt"))
    assert not os.path.exists(os.path.join(d, "e_2.ckpt"))
    assert os.path.exists(os.path.join(d, "latest.ckpt"))
