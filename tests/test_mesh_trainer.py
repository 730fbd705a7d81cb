"""Trainer-with-mesh smoke: the full twohead trainer runs sharded over the
8-device virtual CPU mesh via config.n_devices, and a profiler trace is
written when profile_dir is set."""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy end-to-end suite


def test_twohead_trainer_with_mesh_and_profile(tmp_path):
    from iic_tpu.train import ClusterConfig, train_cluster_twohead

    prof_dir = str(tmp_path / "trace")
    cfg = ClusterConfig(
        model_ind=61, arch="ClusterNet6cTwoHead", mode="IID",
        dataset="Synthetic10x28x1x128", dataset_root="",
        gt_k=10, output_k_A=20, output_k_B=10, lr=1e-3, num_epochs=3,
        batch_sz=32, num_dataloaders=2, num_sub_heads=2,
        out_root=str(tmp_path), crop_orig=True, crop_other=True,
        tf1_crop="centre_half", tf1_crop_sz=20, tf2_crop="random",
        tf2_crop_szs=(16, 20, 24), input_sz=24, rot_val=25.0,
        no_flip=True, batchnorm_track=True, test_code=True, save_freq=1,
        n_devices=8, joint_mode="global", profile_dir=prof_dir)
    cfg.finalize(twohead=True, sobel=False)
    state, history = train_cluster_twohead(cfg)
    assert np.isfinite(history["epoch_loss_head_B"][0])
    assert len(history["eval"].epoch_acc) == 2
    # profiler wrote a trace
    assert glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                     recursive=True) or os.listdir(prof_dir)


def test_mesh_trainer_keeps_ragged_final_batch(tmp_path):
    """Dataset size not divisible by the batch: the final ragged batch is
    processed by the unsharded fallback step instead of being dropped
    (reference keeps and slices partial batches)."""
    from iic_tpu.train import ClusterConfig, train_cluster_twohead

    # dbs = 16 (divides the 8-device mesh); N = 44 -> final batch of 12,
    # which does NOT divide 8 and would crash shard_map without fallback
    cfg = ClusterConfig(
        model_ind=9, arch="ClusterNet6cTwoHead", mode="IID",
        dataset="Synthetic10x28x1x44", dataset_root="",
        gt_k=10, output_k_A=20, output_k_B=10,
        lr=1e-3, num_epochs=2, batch_sz=32, num_dataloaders=2,
        num_sub_heads=1, out_root=str(tmp_path),
        crop_orig=True, crop_other=True, tf1_crop="centre",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(24,),
        input_sz=24, rot_val=0.0, no_flip=True, no_jitter=True,
        batchnorm_track=True, save_freq=1, n_devices=8)
    cfg.finalize(twohead=True, sobel=False)
    state, history = train_cluster_twohead(cfg)
    assert np.isfinite(history["epoch_loss_head_B"][0])
    # all 3 batches per head epoch ran (16 + 16 + 12 = all 44 images)
    assert len(history["eval"].epoch_acc) == 2
