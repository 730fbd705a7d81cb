"""Parallel training-step tests on the 8-device virtual CPU mesh: sharded
vs single-device equivalence (global-joint and parity modes), seg step,
grad sync, state replication."""

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from iic_tpu import models
from iic_tpu.data.pipeline import ClusterTrainPipeline
from iic_tpu.data.seg_pipeline import SegTrainPipeline
from iic_tpu.parallel import (
    TrainState, create_train_state, make_cluster_train_step,
    make_mesh, make_seg_train_step)


def _small_cluster_setup(batchnorm_track=True):
    cfg = SimpleNamespace(
        dataset="Synthetic10x28x1", dataset_root="", mode="IID",
        batch_sz=32, num_dataloaders=2, input_sz=24, gt_k=10,
        output_k_A=20, output_k_B=10, num_sub_heads=2,
        crop_orig=True, crop_other=True, tf1_crop="centre_half",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=[16, 20, 24],
        rot_val=25.0, no_flip=True, no_jitter=False,
        include_rgb=False, mix_train=False,
        batchnorm_track=batchnorm_track)
    net = models.build("ClusterNet6cTwoHead", cfg)
    pipe = ClusterTrainPipeline(cfg, [True])
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 1, 24, 24))
    variables = models.init_variables(net, key, x)
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    return cfg, net, pipe, tx, state


def test_single_device_cluster_step_runs():
    cfg, net, pipe, tx, state = _small_cluster_setup()
    step = make_cluster_train_step(net, tx, pipe.augment_pair, lamb=1.0,
                                   head="B")
    base, key = next(pipe.epoch(0, augmented=False))
    state2, loss, loss_nl = step(state, base, key)
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # params changed
    delta = jax.tree_util.tree_map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(),
        state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(delta)) > 0


@pytest.mark.parametrize("joint_mode", ["global", "parity"])
def test_sharded_step_runs_and_state_replicated(joint_mode):
    cfg, net, pipe, tx, state = _small_cluster_setup()
    mesh = make_mesh(8)
    step = make_cluster_train_step(net, tx, pipe.augment_pair, lamb=1.0,
                                   head="B", mesh=mesh,
                                   joint_mode=joint_mode)
    base, key = next(pipe.epoch(0, augmented=False))
    state2, loss, loss_nl = step(state, base, key)
    assert np.isfinite(float(loss))
    # run a second step to confirm state threads through
    state3, loss3, _ = step(state2, base, key)
    assert np.isfinite(float(loss3))


def test_global_joint_sharded_matches_loss_of_full_batch():
    """With identical augmentation draws AND cross-shard BatchNorm stat sync
    (bn_axis_name), the global-joint sharded loss must equal the
    single-device loss on the full batch. Deterministic augment_pair."""
    cfg, net, pipe, tx, state = _small_cluster_setup()
    cfg_sync = SimpleNamespace(**vars(cfg), bn_axis_name="data")
    net_sync = models.build("ClusterNet6cTwoHead", cfg_sync)

    def det_augment(base_u8, key):
        imgs = base_u8.astype(jnp.float32) / 255.0
        imgs = jax.image.resize(
            imgs, (imgs.shape[0], 24, 24, imgs.shape[3]), "bilinear")
        imgs = jnp.transpose(imgs, (0, 3, 1, 2))
        return imgs, imgs + 0.01

    step_single = make_cluster_train_step(net, tx, det_augment, lamb=1.0,
                                          head="B")
    mesh = make_mesh(8)
    step_sharded = make_cluster_train_step(net_sync, tx, det_augment,
                                           lamb=1.0, head="B", mesh=mesh,
                                           joint_mode="global")
    base, key = next(pipe.epoch(0, augmented=False))
    _, loss_single, _ = step_single(state, base, key)
    _, loss_sharded, _ = step_sharded(state, base, key)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=5e-4, atol=1e-5)


def test_seg_step_single_and_sharded():
    cfg = SimpleNamespace(output_k_A=6, output_k_B=3, num_sub_heads=1,
                          input_sz=24, batchnorm_track=True)
    net = models.build("SegmentationNet10aTwoHead", cfg)
    key = jax.random.PRNGKey(0)
    # nets see post-sobel inputs: rgb(3) + dx + dy = 5 channels
    x = jnp.zeros((2, 5, 24, 24))
    variables = models.init_variables(net, key, x)
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 1, (8, 4, 24, 24)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 1, (8, 4, 24, 24)).astype(np.float32))
    aff = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (8, 1, 1))
    mask = jnp.ones((8, 24, 24), jnp.float32)
    batch = (img1, img2, aff, mask)

    step = make_seg_train_step(
        net, tx, lamb=1.0, head="B", half_T_side_dense=2,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        sobel=True, include_rgb=True)
    state2, loss, _ = step(state, batch, key)
    assert np.isfinite(float(loss))

    mesh = make_mesh(8)
    cfg_sync = SimpleNamespace(**vars(cfg), bn_axis_name="data")
    net_sync = models.build("SegmentationNet10aTwoHead", cfg_sync)
    step_sh = make_seg_train_step(
        net_sync, tx, lamb=1.0, head="B", half_T_side_dense=2,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        sobel=True, include_rgb=True, mesh=mesh, joint_mode="global")
    state3, loss_sh, _ = step_sh(state, batch, key)
    assert np.isfinite(float(loss_sh))
    # global-joint loss equals single-device loss (aug-free, identity warp)
    np.testing.assert_allclose(float(loss_sh), float(loss), rtol=5e-4,
                               atol=1e-5)


def test_track_false_no_batch_stats():
    cfg, net, pipe, tx, state = _small_cluster_setup(batchnorm_track=False)
    assert state.batch_stats == {}
    step = make_cluster_train_step(net, tx, pipe.augment_pair, lamb=1.0,
                                   head="A")
    base, key = next(pipe.epoch(0, augmented=False))
    state2, loss, _ = step(state, base, key)
    assert np.isfinite(float(loss))
    assert state2.batch_stats == {}


def test_fused_pair_forward_step():
    """fused_pair_forward=True: one 2B forward per step. Identical to the
    two-forward path when BN is absent from the stats equation (first step,
    identical halves give out == out_tf), and always runs/learns."""
    import optax
    from types import SimpleNamespace
    from iic_tpu import models
    from iic_tpu.data.pipeline import ClusterTrainPipeline
    from iic_tpu.parallel import create_train_state, make_cluster_train_step

    cfg = SimpleNamespace(
        dataset="Synthetic6x24x1x64", dataset_root="", mode="IID",
        batch_sz=16, num_dataloaders=1, input_sz=20, gt_k=6,
        output_k_A=12, output_k_B=6, num_sub_heads=1,
        crop_orig=True, crop_other=True, tf1_crop="centre",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(20,),
        tf3_crop_diff=False, tf3_crop_sz=20, rot_val=0.0,
        always_rot=False, no_flip=True, no_jitter=True,
        mix_train=False, batchnorm_track=True)
    pipe = ClusterTrainPipeline(cfg, [True])
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 1, 20, 20)))
    tx = optax.adam(1e-3)

    base = jnp.asarray(pipe.images[:16])
    key = jax.random.PRNGKey(5)
    losses = {}
    for fused in (False, True):
        step = make_cluster_train_step(
            net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
            fused_pair_forward=fused)
        state = create_train_state(variables, tx)
        state, loss, loss_nl = step(state, base, key)
        assert np.isfinite(float(loss))
        losses[fused] = float(loss)
    # same data, same augmentation draws; only the BN batch-stats
    # population differs (union of views vs per view) -> close but the
    # fused path is a real distinct program
    np.testing.assert_allclose(losses[True], losses[False], atol=0.05)


def _scan_cfg():
    return SimpleNamespace(
        dataset="Synthetic6x24x1x48", dataset_root="", mode="IID",
        batch_sz=16, num_dataloaders=1, input_sz=20, gt_k=6,
        output_k_A=12, output_k_B=6, num_sub_heads=1,
        crop_orig=True, crop_other=True, tf1_crop="centre",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(20,),
        tf3_crop_diff=False, tf3_crop_sz=20, rot_val=0.0,
        always_rot=False, no_flip=True, no_jitter=True,
        mix_train=False, batchnorm_track=True)


def test_cluster_epoch_scan_matches_per_step():
    """Whole-epoch lax.scan runner (epoch_scan=True) reproduces the
    per-step resident path: same index order, same fold_in key derivation,
    so the loss sequence matches (fp-level drift only: the scan body is a
    differently-compiled program and rounding compounds through adam)."""
    cfg = _scan_cfg()
    pipe = ClusterTrainPipeline(cfg, [True], resident=True)
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 1, 20, 20)))
    tx = optax.adam(1e-3)

    step = make_cluster_train_step(
        net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables), tx)
    losses_ps = []
    for base, key in pipe.epoch(4, augmented=False):
        state, loss, _ = step(state, base, key)
        losses_ps.append(float(loss))

    erun = make_cluster_train_step(
        net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
        epoch_scan=True)
    state2 = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables), tx)
    mat, root = pipe.epoch_scan_inputs(4)
    assert mat.shape == (3, 16)
    state2, losses, losses_nl = erun(state2, mat, root)
    np.testing.assert_allclose(losses_ps[0], float(losses[0]), atol=1e-6)
    np.testing.assert_allclose(losses_ps, np.asarray(losses),
                               rtol=2e-2, atol=1e-4)
    assert int(state2.step) == 3


@pytest.mark.slow
def test_cluster_epoch_scan_mesh():
    """epoch_scan under an 8-device mesh: the scan runs inside shard_map,
    the index matrix is sharded over its batch column, losses match the
    sharded per-step path."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    cfg = _scan_cfg()
    pipe = ClusterTrainPipeline(cfg, [True], resident=True)
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 1, 20, 20)))
    tx = optax.adam(1e-3)
    mesh = make_mesh(8)

    step = make_cluster_train_step(
        net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
        mesh=mesh)
    state = jax.device_put(
        create_train_state(jax.tree_util.tree_map(jnp.copy, variables),
                           tx), NamedSharding(mesh, P()))
    losses_ps = []
    for base, key in pipe.epoch(4, augmented=False):
        base = jax.device_put(base, NamedSharding(mesh, P("data")))
        state, loss, _ = step(state, base, key)
        losses_ps.append(float(loss))

    erun = make_cluster_train_step(
        net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
        mesh=mesh, epoch_scan=True)
    state2 = jax.device_put(
        create_train_state(jax.tree_util.tree_map(jnp.copy, variables),
                           tx), NamedSharding(mesh, P()))
    mat, root = pipe.epoch_scan_inputs(4)
    mat = jax.device_put(mat, NamedSharding(mesh, P(None, "data")))
    state2, losses, _ = erun(state2, mat, root)
    np.testing.assert_allclose(losses_ps[0], float(losses[0]), atol=1e-6)
    np.testing.assert_allclose(losses_ps, np.asarray(losses),
                               rtol=2e-2, atol=1e-4)


@pytest.mark.slow
def test_seg_epoch_scan_smoke():
    """Seg epoch_scan: resident gather + crop + augment + displacement MI
    + adam scanned over the epoch in one program."""
    cfg = SimpleNamespace(
        dataset="SyntheticSeg3x36x24", dataset_root="", mode="IID",
        batch_sz=8, num_dataloaders=2, dataloader_batch_sz=4, input_sz=32,
        gt_k=3, output_k_A=6, output_k_B=3, num_sub_heads=1,
        use_coarse_labels=False, pre_scale_all=False,
        use_random_scale=False, jitter_brightness=0.4, jitter_contrast=0.4,
        jitter_saturation=0.4, jitter_hue=0.125, flip_p=0.5,
        use_random_affine=False, sobel=False, no_sobel=True,
        include_rgb=True, using_IR=False, batchnorm_track=True,
        half_T_side_dense=1, half_T_side_sparse_min=0,
        half_T_side_sparse_max=0)
    pipe = SegTrainPipeline(cfg, ["train"], resident=True)
    net = models.build("SegmentationNet10aTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 3, 32, 32)))
    tx = optax.adam(1e-3)
    erun = make_seg_train_step(
        net, tx, lamb=1.0, head="B", half_T_side_dense=1,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0,
        sobel=False, include_rgb=True, use_uncollapsed_loss=True,
        augment=pipe.augment, epoch_scan=True)
    state = create_train_state(variables, tx)
    mat, root = pipe.epoch_scan_inputs(0)
    # 24 imgs / dataloader_batch_sz 4 -> 6 steps; r=2 repeats -> 8 idx cols
    assert mat.shape == (6, 8)
    state, losses, losses_nl = erun(state, mat, root)
    assert losses.shape == (6,) and np.all(np.isfinite(np.asarray(losses)))
    assert int(state.step) == 6
