"""Orbax checkpoint backend round-trip + make_global_batch on the virtual
mesh."""

import numpy as np
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
