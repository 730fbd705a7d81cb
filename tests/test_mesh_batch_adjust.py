"""Mesh batch adjustment: paper batch sizes that don't divide the mesh get
rounded, ragged final batches dropped, and the sharded trainer runs."""

import numpy as np
import pytest


def test_adjust_batch_for_mesh():
    from iic_tpu.train import ClusterConfig
    from iic_tpu.train.cluster_trainer import adjust_batch_for_mesh

    cfg = ClusterConfig(batch_sz=660, num_dataloaders=3, n_devices=8)
    cfg.finalize()
    assert adjust_batch_for_mesh(cfg)
    assert cfg.dataloader_batch_sz % 8 == 0
    assert cfg.batch_sz == cfg.dataloader_batch_sz * 3
    assert cfg.batch_sz == 648  # 216 * 3

    cfg2 = ClusterConfig(batch_sz=640, num_dataloaders=2, n_devices=8)
    cfg2.finalize()
    adjust_batch_for_mesh(cfg2)
    assert cfg2.batch_sz == 640  # already divisible

    cfg3 = ClusterConfig(batch_sz=660, num_dataloaders=3, n_devices=None)
    cfg3.finalize()
    assert not adjust_batch_for_mesh(cfg3)
    assert cfg3.batch_sz == 660


@pytest.mark.slow  # end-to-end trainer (compile-heavy)
def test_trainer_with_indivisible_batch_on_mesh(tmp_path):
    from iic_tpu.train import ClusterConfig, train_cluster_twohead

    cfg = ClusterConfig(
        model_ind=81, arch="ClusterNet6cTwoHead", mode="IID",
        dataset="Synthetic10x28x1x100", dataset_root="",
        gt_k=10, output_k_A=20, output_k_B=10, lr=1e-3, num_epochs=2,
        batch_sz=36, num_dataloaders=2, num_sub_heads=1,  # 18 % 8 != 0
        out_root=str(tmp_path), crop_orig=True, crop_other=True,
        tf1_crop="centre_half", tf1_crop_sz=20, tf2_crop="random",
        tf2_crop_szs=(16, 20, 24), input_sz=24, rot_val=25.0,
        no_flip=True, batchnorm_track=True, test_code=True, save_freq=1,
        n_devices=8)
    cfg.finalize(twohead=True, sobel=False)
    state, history = train_cluster_twohead(cfg)
    assert np.isfinite(history["epoch_loss_head_B"][0])
    assert cfg.dataloader_batch_sz == 16
