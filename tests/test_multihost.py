"""Multi-host plumbing, driven single-process on the 8-device virtual mesh:
``make_global_batch`` assembly, per-process pipeline shard selection, and a
shard_mapped train step consuming a globally-assembled batch. (True
multi-process runs need a pod; everything here exercises the same code
paths via make_array_from_process_local_data with process_count == 1.)"""

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp

from iic_tpu.parallel.mesh import (
    make_batch_globalizer, make_global_batch, make_mesh)


def test_make_global_batch_shards_over_mesh():
    mesh = make_mesh(8)
    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = make_global_batch(mesh, local)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), local)
    shards = arr.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (2, 3) for s in shards)
    # device i holds rows [2i, 2i+2)
    by_dev = sorted(shards, key=lambda s: s.index[0].start)
    for i, s in enumerate(by_dev):
        np.testing.assert_array_equal(np.asarray(s.data), local[2*i:2*i+2])


def test_batch_globalizer_identity_single_process():
    mesh = make_mesh(8)
    g = make_batch_globalizer(mesh)
    x = np.ones((8, 2), np.float32)
    assert g(x) is x  # process_count == 1 -> identity
    assert make_batch_globalizer(None)(x) is x


def _cluster_cfg(**kw):
    cfg = SimpleNamespace(
        dataset="Synthetic6x24x1x64", dataset_root="", mode="IID",
        batch_sz=16, num_dataloaders=1, input_sz=20, gt_k=6,
        output_k_A=12, output_k_B=6, num_sub_heads=1,
        crop_orig=True, crop_other=True, tf1_crop="centre",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(20,),
        tf3_crop_diff=False, tf3_crop_sz=20, rot_val=0.0,
        always_rot=False, no_flip=True, no_jitter=True,
        mix_train=False, batchnorm_track=True)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_cluster_pipeline_process_shards_tile_the_batch():
    """Two processes' local shards concatenate to the single-host batch,
    with identical per-batch keys."""
    from iic_tpu.data.pipeline import ClusterTrainPipeline
    cfg = _cluster_cfg()
    full = ClusterTrainPipeline(cfg, [True], process_shard=(0, 1))
    p0 = ClusterTrainPipeline(cfg, [True], process_shard=(0, 2))
    p1 = ClusterTrainPipeline(cfg, [True], process_shard=(1, 2))
    (b_full, k_full) = next(full.epoch(0, augmented=False))
    ((b0, w0), k0) = next(p0.epoch(0, augmented=False))
    ((b1, w1), k1) = next(p1.epoch(0, augmented=False))
    assert isinstance(b0, np.ndarray)  # host-local, not device_put
    np.testing.assert_array_equal(
        np.concatenate([b0, b1]), np.asarray(b_full))
    assert w0.shape == (8,) and w1.shape == (8,)
    np.testing.assert_array_equal(np.concatenate([w0, w1]), np.ones(16))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k_full))


def test_seg_pipeline_process_shards_tile_the_batch():
    """Seg pipeline: global order identical across processes, each process
    preps its contiguous sub-block."""
    from iic_tpu.data.seg_pipeline import SegTrainPipeline
    cfg = SimpleNamespace(
        dataset="SyntheticSeg3x48x32", dataset_root="", mode="IID",
        batch_sz=8, num_dataloaders=1, dataloader_batch_sz=8, input_sz=48,
        gt_k=3, output_k_A=6, output_k_B=3, num_sub_heads=1,
        use_coarse_labels=False, pre_scale_all=False, pre_scale_factor=0.5,
        use_random_scale=False, scale_min=0.8, scale_max=1.2,
        jitter_brightness=0.4, jitter_contrast=0.4, jitter_saturation=0.4,
        jitter_hue=0.125, flip_p=0.5, use_random_affine=False,
        sobel=True, no_sobel=False, include_rgb=True, using_IR=False,
        batchnorm_track=True, half_T_side_dense=1,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0)
    full = SegTrainPipeline(cfg, ["train"], process_shard=(0, 1))
    p0 = SegTrainPipeline(cfg, ["train"], process_shard=(0, 2))
    p1 = SegTrainPipeline(cfg, ["train"], process_shard=(1, 2))
    fi, fm, fk = next(full.epoch(0, augmented=False))
    i0, m0, k0 = next(p0.epoch(0, augmented=False))
    i1, m1, k1 = next(p1.epoch(0, augmented=False))
    assert i0.shape[0] == 4 and i1.shape[0] == 4
    # input_sz == raw size -> host geometry deterministic, so the shards
    # must reproduce the single-host batch content exactly
    np.testing.assert_array_equal(
        np.concatenate([i0, i1]), np.asarray(fi))
    np.testing.assert_array_equal(
        np.concatenate([m0, m1]), np.asarray(fm))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(fk))


def test_sharded_step_consumes_globally_assembled_batch():
    """A shard_mapped cluster train step fed a make_global_batch-assembled
    array produces the same loss as when fed the plain host array."""
    import optax
    from iic_tpu import models
    from iic_tpu.data.pipeline import ClusterTrainPipeline
    from iic_tpu.parallel import create_train_state, make_cluster_train_step

    cfg = _cluster_cfg(bn_axis_name=None)
    mesh = make_mesh(8)
    pipe = ClusterTrainPipeline(cfg, [True])
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 1, 20, 20)))
    tx = optax.adam(1e-3)

    step = make_cluster_train_step(
        net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
        mesh=mesh, joint_mode="global")

    base = np.asarray(pipe.images[:16])
    key = jax.random.PRNGKey(3)

    s1 = create_train_state(variables, tx)
    _, loss_plain, _ = step(s1, base, key)
    s2 = create_train_state(variables, tx)
    _, loss_global, _ = step(s2, make_global_batch(mesh, base), key)
    np.testing.assert_allclose(float(loss_plain), float(loss_global),
                               rtol=1e-6, atol=1e-7)


def test_multihost_ragged_batch_padded_with_zero_weights():
    """pc > 1 with a ragged final batch pads it to bsz (repeating the last
    sample) and carries 0-weights on the padding, so per-process shards
    stay equal and the weighted joint ignores the padding exactly
    (64 images, bsz=24 -> last batch is 16 valid + 8 pad)."""
    from iic_tpu.data.pipeline import ClusterTrainPipeline
    cfg = _cluster_cfg(batch_sz=24)
    p0 = ClusterTrainPipeline(cfg, [True], process_shard=(0, 2))
    p1 = ClusterTrainPipeline(cfg, [True], process_shard=(1, 2))
    batches0 = list(p0.epoch(0, augmented=False))
    batches1 = list(p1.epoch(0, augmented=False))
    assert len(batches0) == 3  # ceil(64 / 24): ragged batch KEPT
    (b0, w0), _ = batches0[-1]
    (b1, w1), _ = batches1[-1]
    assert b0.shape[0] == 12 and b1.shape[0] == 12  # equal shards
    w = np.concatenate([w0, w1])
    np.testing.assert_array_equal(w, (np.arange(24) < 16).astype(w.dtype))
    # padding repeats the last valid sample
    full = ClusterTrainPipeline(cfg, [True], process_shard=(0, 1))
    imgs = np.concatenate([b0, b1])
    last_valid = np.asarray(full.images[63])
    np.testing.assert_array_equal(imgs[16], last_valid)
    np.testing.assert_array_equal(imgs[23], last_valid)
    # drop_last=True still drops it
    pipe2 = ClusterTrainPipeline(cfg, [True], process_shard=(0, 2),
                                 drop_last=True)
    assert len(list(pipe2.epoch(0, augmented=False))) == 2


def test_seg_multihost_ragged_batch_padded_with_zero_masks():
    """Seg pipeline, pc > 1, ragged final batch: padded to batch_sz by
    repeating the last sample with ZEROED relevancy masks — the mask-aware
    seg loss ignores the padding exactly (32 imgs, bsz=12 -> 8 valid +
    4 pad in the last batch)."""
    from types import SimpleNamespace
    from iic_tpu.data.seg_pipeline import SegTrainPipeline
    cfg = SimpleNamespace(
        dataset="SyntheticSeg3x48x32", dataset_root="", mode="IID",
        batch_sz=12, num_dataloaders=1, dataloader_batch_sz=12, input_sz=48,
        gt_k=3, output_k_A=6, output_k_B=3, num_sub_heads=1,
        use_coarse_labels=False, pre_scale_all=False, pre_scale_factor=0.5,
        use_random_scale=False, scale_min=0.8, scale_max=1.2,
        jitter_brightness=0.4, jitter_contrast=0.4, jitter_saturation=0.4,
        jitter_hue=0.125, flip_p=0.5, use_random_affine=False,
        sobel=True, no_sobel=False, include_rgb=True, using_IR=False,
        batchnorm_track=True, half_T_side_dense=1,
        half_T_side_sparse_min=0, half_T_side_sparse_max=0)
    p0 = SegTrainPipeline(cfg, ["train"], process_shard=(0, 2))
    p1 = SegTrainPipeline(cfg, ["train"], process_shard=(1, 2))
    b0 = list(p0.epoch(0, augmented=False))
    b1 = list(p1.epoch(0, augmented=False))
    assert len(b0) == 3  # ceil(32 / 12): ragged batch KEPT
    i0, m0, _ = b0[-1]
    i1, m1, _ = b1[-1]
    assert i0.shape[0] == 6 and i1.shape[0] == 6  # equal shards
    masks = np.concatenate([m0, m1])
    imgs = np.concatenate([i0, i1])
    assert (masks[:8] != 0).any()          # valid rows keep their masks
    np.testing.assert_array_equal(masks[8:], 0)  # padding fully masked
    # padded rows repeat the last valid sample's image
    np.testing.assert_array_equal(imgs[8], imgs[7])
    # full-size batches are untouched
    _, m_first, _ = b0[0]
    assert (m_first != 0).any()


def test_weighted_loss_masks_padding_exactly():
    """Loss level: a 0-weighted padded batch gives the SAME loss as the
    sliced exact batch, whatever garbage sits in the padded rows.
    (Mathematically exact — the padded rows contribute literal zeros to
    the joint; only the f32 accumulation order differs between a 16-row
    and an 11-row matmul, hence rtol at ulp scale.)"""
    from iic_tpu.ops.iid_loss import IID_loss

    rng = np.random.default_rng(0)
    z = rng.dirichlet(np.ones(6), size=16).astype(np.float32)
    z_tf = rng.dirichlet(np.ones(6), size=16).astype(np.float32)
    n_valid = 11
    w = (np.arange(16) < n_valid).astype(np.float32)

    loss_w, loss_nl_w = IID_loss(jnp.asarray(z), jnp.asarray(z_tf),
                                 lamb=1.3, weights=jnp.asarray(w))
    loss_e, loss_nl_e = IID_loss(jnp.asarray(z[:n_valid]),
                                 jnp.asarray(z_tf[:n_valid]), lamb=1.3)
    np.testing.assert_allclose(float(loss_w), float(loss_e),
                               rtol=2e-7, atol=1e-7)
    np.testing.assert_allclose(float(loss_nl_w), float(loss_nl_e),
                               rtol=2e-7, atol=1e-7)
    # all-ones weights are bit-identical to unweighted
    ones = jnp.ones(16, jnp.float32)
    loss_1, _ = IID_loss(jnp.asarray(z), jnp.asarray(z_tf), lamb=1.3,
                         weights=ones)
    loss_u, _ = IID_loss(jnp.asarray(z), jnp.asarray(z_tf), lamb=1.3)
    assert float(loss_1) == float(loss_u)


def test_weighted_step_all_ones_matches_unweighted():
    """Step level: the weighted sharded step with all-ones weights equals
    the unweighted sharded step exactly (same program semantics), so
    multi-host full batches lose nothing to the weighting."""
    import optax
    from iic_tpu import models
    from iic_tpu.data.pipeline import ClusterTrainPipeline
    from iic_tpu.parallel import create_train_state, make_cluster_train_step

    cfg = _cluster_cfg(bn_axis_name=None)
    mesh = make_mesh(8)
    pipe = ClusterTrainPipeline(cfg, [True])
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 1, 20, 20)))
    tx = optax.adam(1e-3)
    base = np.asarray(pipe.images[:16])
    key = jax.random.PRNGKey(3)

    wstep = make_cluster_train_step(
        net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
        mesh=mesh, joint_mode="global", weighted=True)
    step = make_cluster_train_step(
        net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
        mesh=mesh, joint_mode="global")
    s1 = create_train_state(variables, tx)
    _, loss_w, _ = wstep(s1, (base, np.ones(16, np.float32)), key)
    s2 = create_train_state(variables, tx)
    _, loss_u, _ = step(s2, base, key)
    np.testing.assert_allclose(float(loss_w), float(loss_u),
                               rtol=1e-6, atol=1e-7)


def test_replicator_identity_single_process():
    from iic_tpu.parallel.mesh import make_replicator
    mesh = make_mesh(8)
    x = {"a": np.ones(3, np.float32)}
    assert make_replicator(None)(x) is x
    assert make_replicator(mesh)(x) is x  # process_count == 1


def test_mesh_sharded_eval_matches_unsharded():
    """make_eval_apply with a mesh shards the eval batch over the data
    axis (incl. a ragged batch GSPMD pads internally); outputs must equal
    the unsharded forward exactly (running-stats BN)."""
    import optax
    from iic_tpu import models
    from iic_tpu.parallel import create_train_state
    from iic_tpu.train.cluster_trainer import make_eval_apply

    cfg = _cluster_cfg()
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 1, 20, 20)))
    state = create_train_state(variables, optax.adam(1e-3))
    cfg.sobel = False
    cfg.include_rgb = False

    rng = np.random.default_rng(0)
    plain = make_eval_apply(net, state, cfg)
    sharded = make_eval_apply(net, state, cfg, mesh=make_mesh(8))
    for b in (16, 11):  # 11: ragged vs the 8-device mesh
        imgs = jnp.asarray(
            rng.uniform(0, 1, (b, 1, 20, 20)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(sharded(imgs)),
                                   np.asarray(plain(imgs)),
                                   rtol=1e-6, atol=1e-6)
