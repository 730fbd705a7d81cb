"""Orbax checkpoint backend round-trip + make_global_batch on the virtual
mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_orbax_roundtrip(tmp_path):
    from iic_tpu.train import ClusterConfig
    from iic_tpu.train import checkpoint as ckpt
    from iic_tpu.train.cluster_trainer import build_net_and_state

    cfg = ClusterConfig(
        model_ind=71, arch="ClusterNet6cTwoHead", dataset="Synthetic10x28x1",
        output_k_A=10, output_k_B=10, num_sub_heads=1, input_sz=24,
        batchnorm_track=True, out_root=str(tmp_path),
        crop_orig=False, crop_other=False, rot_val=0.0, no_jitter=True)
    cfg.finalize(twohead=True, sobel=False)
    net, tx, state = build_net_and_state(cfg)

    ckpt.save_checkpoint_orbax(cfg, state, {"eval": None}, "latest",
                               last_epoch=3)
    loaded, hist, last_epoch = ckpt.load_checkpoint_orbax(cfg, state,
                                                          "latest")
    assert last_epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_global_batch():
    from iic_tpu.parallel import make_mesh
    from iic_tpu.parallel.mesh import make_global_batch

    mesh = make_mesh(8)
    local = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = make_global_batch(mesh, local)
    assert arr.shape == (16, 4)  # single-process: local == global
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_best_config_pickle_snapshot(tmp_path):
    """Best saves additionally write best_config.pickle (reference
    cluster_sobel_twohead.py:444-449) that stays frozen at the best epoch
    while config.pickle keeps advancing."""
    import os
    import pickle
    from iic_tpu.train import ClusterConfig
    from iic_tpu.train import checkpoint as ckpt
    from iic_tpu.train.cluster_trainer import build_net_and_state

    cfg = ClusterConfig(
        model_ind=72, arch="ClusterNet6cTwoHead", dataset="Synthetic10x28x1",
        output_k_A=10, output_k_B=10, num_sub_heads=1, input_sz=24,
        batchnorm_track=True, out_root=str(tmp_path),
        crop_orig=False, crop_other=False, rot_val=0.0, no_jitter=True)
    cfg.finalize(twohead=True, sobel=False)
    net, tx, state = build_net_and_state(cfg)

    d = os.path.join(str(tmp_path), "72")
    ckpt.save_checkpoint(cfg, state, {"acc": [0.5]}, "best", last_epoch=2)
    assert os.path.exists(os.path.join(d, "best_config.pickle"))
    ckpt.save_checkpoint(cfg, state, {"acc": [0.5, 0.4]}, "latest",
                         last_epoch=3)
    with open(os.path.join(d, "best_config.pickle"), "rb") as f:
        best_meta = pickle.load(f)
    with open(os.path.join(d, "config.pickle"), "rb") as f:
        latest_meta = pickle.load(f)
    assert best_meta["last_epoch"] == 2 and best_meta["history"]["acc"] == [0.5]
    assert latest_meta["last_epoch"] == 3


@pytest.mark.slow
def test_trainer_restart_through_orbax(tmp_path):
    """use_orbax=True routes the trainer's save/load through the Orbax
    backend; restart resumes from the orbax checkpoint."""
    from iic_tpu.train import ClusterConfig, train_cluster_twohead

    def cfg(**kw):
        c = ClusterConfig(
            model_ind=73, arch="ClusterNet6cTwoHead", mode="IID",
            dataset="Synthetic10x28x1x128", dataset_root="",
            gt_k=10, output_k_A=20, output_k_B=10,
            lr=1e-3, num_epochs=3, batch_sz=32, num_dataloaders=2,
            num_sub_heads=2, out_root=str(tmp_path),
            crop_orig=True, crop_other=True, tf1_crop="centre_half",
            tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(16, 20, 24),
            input_sz=24, rot_val=25.0, no_flip=True,
            batchnorm_track=True, test_code=True, save_freq=1,
            use_orbax=True)
        for k, v in kw.items():
            setattr(c, k, v)
        return c.finalize(twohead=True, sobel=False)

    import os
    state, history = train_cluster_twohead(cfg())
    d = os.path.join(str(tmp_path), "73")
    assert os.path.isdir(os.path.join(d, "latest_orbax"))
    assert not os.path.exists(os.path.join(d, "latest.ckpt"))

    state2, history2 = train_cluster_twohead(cfg(restart=True))
    assert len(history2["eval"].epoch_acc) >= len(history["eval"].epoch_acc)
