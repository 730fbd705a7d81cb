"""Trainer smoke tests (--test_code-mode equivalents): full two-head and
single-head runs on synthetic data, checkpoint save/load round trip,
restart with history truncation, lr schedule."""

import os

import numpy as np
import pytest

from iic_tpu.train import (
    ClusterConfig, set_lr_mult, train_cluster_single, train_cluster_twohead)
from iic_tpu.train import checkpoint as ckpt

pytestmark = pytest.mark.slow  # compile-heavy end-to-end suite


def _cfg(tmp_path, **kw):
    cfg = ClusterConfig(
        model_ind=1, arch="ClusterNet6cTwoHead", mode="IID",
        dataset="Synthetic10x28x1x128", dataset_root="",
        gt_k=10, output_k_A=20, output_k_B=10,
        lr=1e-3, num_epochs=3, batch_sz=32, num_dataloaders=2,
        num_sub_heads=2, out_root=str(tmp_path),
        crop_orig=True, crop_other=True, tf1_crop="centre_half",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(16, 20, 24),
        input_sz=24, rot_val=25.0, no_flip=True,
        batchnorm_track=True, test_code=True, save_freq=1)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg.finalize(twohead=True, sobel=False)


def test_twohead_trainer_smoke(tmp_path):
    cfg = _cfg(tmp_path)
    state, history = train_cluster_twohead(cfg)
    ev = history["eval"]
    assert len(ev.epoch_acc) == 2  # pre-eval + 1 epoch (test_code)
    assert len(history["epoch_loss_head_A"]) == 1
    assert len(history["epoch_loss_head_B"]) == 1
    assert np.isfinite(history["epoch_loss_head_B"][0])
    d = os.path.join(str(tmp_path), "1")
    assert os.path.exists(os.path.join(d, "latest.ckpt"))
    assert os.path.exists(os.path.join(d, "config.pickle"))
    assert os.path.exists(os.path.join(d, "config.txt"))


def test_checkpoint_roundtrip_and_restart(tmp_path):
    cfg = _cfg(tmp_path)
    state, history = train_cluster_twohead(cfg)

    # restart: loads latest, truncates, continues
    cfg2 = _cfg(tmp_path, restart=True)
    state2, history2 = train_cluster_twohead(cfg2)
    assert len(history2["eval"].epoch_acc) >= len(history["eval"].epoch_acc)
    from iic_tpu.train.cluster_trainer import build_net_and_state
    net, tx, template = build_net_and_state(cfg)
    loaded, hist_l, last_epoch = ckpt.load_checkpoint(cfg, template,
                                                      name="latest")
    assert last_epoch is not None


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def test_checkpoint_state_identical(tmp_path):
    from iic_tpu.train.cluster_trainer import build_net_and_state
    cfg = _cfg(tmp_path, model_ind=7)
    net, tx, state = build_net_and_state(cfg)
    ckpt.save_checkpoint(cfg, state, {"eval": None}, "latest", last_epoch=4)
    loaded, hist, last_epoch = ckpt.load_checkpoint(cfg, state, "latest")
    assert last_epoch == 4
    for a, b in zip(_leaves(state.params), _leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(_leaves(state.opt_state), _leaves(loaded.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_single_head_trainer_smoke(tmp_path):
    cfg = ClusterConfig(
        model_ind=2, arch="ClusterNet6c", mode="IID+",
        dataset="Synthetic10x28x1x128", dataset_root="",
        gt_k=10, output_k=25, lr=1e-3, num_epochs=3, batch_sz=32,
        num_dataloaders=2, num_sub_heads=2, out_root=str(tmp_path),
        crop_orig=True, crop_other=True, tf1_crop="centre_half",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(16, 20, 24),
        input_sz=24, rot_val=25.0, no_flip=True,
        batchnorm_track=True, test_code=True, save_freq=1)
    cfg.finalize(twohead=False, sobel=False)
    assert cfg.eval_mode == "orig"
    state, history = train_cluster_single(cfg)
    assert len(history["eval"].epoch_acc) == 2
    assert np.isfinite(history["epoch_loss_head_B"][0])


def test_lr_schedule_multiplies():
    from iic_tpu.train.cluster_trainer import build_net_and_state
    cfg = _cfg.__wrapped__ if hasattr(_cfg, "__wrapped__") else None
    cfg = ClusterConfig(dataset="Synthetic10x28x1", input_sz=24,
                        output_k_A=10, output_k_B=10, num_sub_heads=1,
                        lr=1e-3, batchnorm_track=True,
                        arch="ClusterNet6cTwoHead",
                        crop_orig=False, crop_other=False, rot_val=0.0,
                        no_jitter=True).finalize(twohead=True, sobel=False)
    net, tx, state = build_net_and_state(cfg)
    lr0 = float(state.opt_state.hyperparams["learning_rate"])
    state = set_lr_mult(state, 0.1)
    lr1 = float(state.opt_state.hyperparams["learning_rate"])
    np.testing.assert_allclose(lr1, lr0 * 0.1, rtol=1e-6)


def test_restart_reproduces_uninterrupted_run(tmp_path):
    """Determinism across restart: train 4 epochs straight vs train 2,
    restart, train 2 more — the per-epoch losses and eval accuracies must
    match exactly (PRNG keys derive from (seed, epoch, batch); optimizer
    state and BN stats round-trip through the checkpoint)."""
    def cfg(out, **kw):
        # batch/input shapes identical to _cfg's other tests -> compile
        # cache hits; tiny dataset so the full (non-test_code) epochs stay
        # cheap on the CPU backend
        c = _cfg(out, num_epochs=3, test_code=False, save_freq=1,
                 dataset="Synthetic10x28x1x32")
        for k, v in kw.items():
            setattr(c, k, v)
        return c

    import os
    a_dir = os.path.join(str(tmp_path), "straight")
    b_dir = os.path.join(str(tmp_path), "resumed")
    os.makedirs(a_dir), os.makedirs(b_dir)

    _, hist_straight = train_cluster_twohead(cfg(a_dir))

    _, _ = train_cluster_twohead(cfg(b_dir, num_epochs=2))
    _, hist_resumed = train_cluster_twohead(cfg(b_dir, restart=True))

    np.testing.assert_allclose(hist_resumed["epoch_loss_head_B"],
                               hist_straight["epoch_loss_head_B"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(hist_resumed["epoch_loss_head_A"],
                               hist_straight["epoch_loss_head_A"],
                               rtol=0, atol=0)
    np.testing.assert_array_equal(hist_resumed["eval"].epoch_acc,
                                  hist_straight["eval"].epoch_acc)


def test_twohead_trainer_epoch_scan(tmp_path):
    """--resident_data --epoch_scan through the full twohead trainer:
    whole-epoch fused scan per head, one dispatch per (head, epoch)."""
    cfg = _cfg(tmp_path, resident_data=True, epoch_scan=True,
               test_code=False, num_epochs=3, num_sub_heads=1)
    state, history = train_cluster_twohead(cfg)
    assert len(history["epoch_loss_head_B"]) == 2
    assert np.isfinite(history["epoch_loss_head_B"][-1])
    # IID partitions concat train+test: 128 + 40 imgs -> 168 // 16 = 10
    # steps per head-epoch; heads B and A, 2 trainer epochs
    assert int(state.step) == 10 * 2 * 2
