"""Worker for the true 2-process multi-host test (run as __main__ by
tests/test_multihost_2proc.py, one subprocess per simulated host).

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device mesh spanning both processes. The worker then
exercises the REAL multi-host path end to end — per-process local batch
shard -> ``make_batch_globalizer`` assembly -> replicated TrainState ->
global-joint sharded cluster train step -> checkpoint save on process 0 ->
restore on both -> one more step — and writes its losses to a JSON file.

``compute(mesh, globalize, replicate, ckpt_dir, local_slice)`` is shared
with the parent test, which calls it single-process on the 8-device virtual
mesh: the multi-host losses must equal the single-host ones (the global
batch, mesh size and reduction structure are identical; only the process
layout differs). Reference semantics target: SURVEY.md §2.6/§5.8.
"""

import json
import os
import sys
from types import SimpleNamespace

import numpy as np


def _net_and_batch():
    import jax
    import jax.numpy as jnp
    import optax
    from iic_tpu.models import cluster_nets
    from iic_tpu.parallel.train_step import (
        create_train_state, make_cluster_train_step)

    net = cluster_nets.ClusterNet6c(output_k=6, num_sub_heads=2, input_sz=16)
    base = (np.arange(16 * 1 * 16 * 16, dtype=np.float32)
            .reshape(16, 1, 16, 16) % 97) / 97.0
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(base[:2]))
    tx = optax.adam(1e-3)
    # deterministic pass-through "augmentation": view 2 is a pixel roll
    aug = lambda b, key: (b, jnp.roll(b, 1, axis=-1))  # noqa: E731
    return net, tx, aug, base, variables


def compute(mesh, globalize, replicate, ckpt_dir, local_slice):
    """Two train steps with a checkpoint save/restore between them.
    Returns (loss1, loss2_live, loss2_restored)."""
    import jax
    from iic_tpu.parallel.train_step import (
        create_train_state, make_cluster_train_step)
    from iic_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    net, tx, aug, base, variables = _net_and_batch()
    step = make_cluster_train_step(net, tx, aug, lamb=1.0, head=None,
                                   mesh=mesh, joint_mode="global")
    state = replicate(create_train_state(variables, tx))
    batch = globalize(base[local_slice])

    state1, loss1, _ = step(state, batch, replicate(jax.random.PRNGKey(0)))

    cfg = SimpleNamespace(out_root=ckpt_dir, model_ind=0, use_orbax=False)
    if jax.process_index() == 0:
        save_checkpoint(cfg, jax.device_get(state1), history={},
                        last_epoch=0)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ckpt_written")

    template = create_train_state(variables, tx)
    restored, _, _ = load_checkpoint(cfg, template)
    restored = replicate(restored)

    key2 = replicate(jax.random.PRNGKey(1))
    _, loss2_live, _ = step(state1, batch, key2)
    _, loss2_restored, _ = step(restored, batch, key2)
    return float(loss1), float(loss2_live), float(loss2_restored)


def _pipeline_cfg():
    return SimpleNamespace(
        dataset="Synthetic6x24x1x44", dataset_root="", mode="IID",
        batch_sz=16, num_dataloaders=1, input_sz=20, gt_k=6,
        output_k_A=12, output_k_B=6, num_sub_heads=2,
        crop_orig=True, crop_other=True, tf1_crop="centre",
        tf1_crop_sz=20, tf2_crop="random", tf2_crop_szs=(20,),
        tf3_crop_diff=False, tf3_crop_sz=20, rot_val=0.0,
        always_rot=False, no_flip=True, no_jitter=True,
        mix_train=False, batchnorm_track=True, sobel=False,
        include_rgb=False)


def compute_r3(mesh, globalize, replicate):
    """Round-3 multi-host paths, end to end with real process shards:

    - the WEIGHTED sharded train step on the pipeline's padded ragged
      final batch (44 imgs, bsz 16 -> batch 3 is 12 valid + 4 pad),
    - the multi-host sharded eval forward (replicated gathered outputs),
    - multi-host sub-head selection (_select_sub_head_on_loss).

    Returns (first_loss, ragged_loss, eval_checksum, sub_head) — all
    replicated, so every process must produce identical values.
    first_loss (batch 1, all weights 1) compares tightly across layouts;
    ragged_loss sits behind two Adam updates, which amplify cross-layout
    psum reduction-order ulps (the parent uses a looser tolerance)."""
    import jax
    import jax.numpy as jnp
    import optax
    from iic_tpu import models
    from iic_tpu.data.pipeline import ClusterTrainPipeline
    from iic_tpu.parallel.train_step import (
        create_train_state, make_cluster_train_step)
    from iic_tpu.train.cluster_trainer import (
        _select_sub_head_on_loss, make_eval_apply)

    cfg = _pipeline_cfg()
    pipe = ClusterTrainPipeline(cfg, [True])
    net = models.build("ClusterNet6cTwoHead", cfg)
    variables = models.init_variables(
        net, jax.random.PRNGKey(0), jnp.zeros((2, 1, 20, 20)))
    tx = optax.adam(1e-3)
    weighted = jax.process_count() > 1

    state = replicate(create_train_state(variables, tx))
    first_loss = ragged_loss = None
    if weighted:
        step = make_cluster_train_step(
            net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
            mesh=mesh, joint_mode="global", weighted=True)
        for base, key in pipe.epoch(0, augmented=False):
            state, loss, _ = step(state, globalize(base), replicate(key))
            if first_loss is None:
                first_loss = float(loss)
            ragged_loss = float(loss)  # last batch: 12 valid + 4 pad
    else:
        # single-process reference: emulate the 2-proc padded shards via
        # degenerate process_shard pipelines so the program and inputs
        # are IDENTICAL to the multi-host run
        shards = [ClusterTrainPipeline(cfg, [True], process_shard=(i, 2))
                  for i in range(2)]
        wstep = make_cluster_train_step(
            net, tx, pipe.augment_pair, lamb=1.0, head="B", sobel=False,
            mesh=mesh, joint_mode="global", weighted=True)
        state = create_train_state(variables, tx)
        for (b0w, key), (b1w, _) in zip(shards[0].epoch(0, augmented=False),
                                        shards[1].epoch(0, augmented=False)):
            batch = (np.concatenate([b0w[0], b1w[0]]),
                     np.concatenate([b0w[1], b1w[1]]))
            state, loss, _ = wstep(state, batch, key)
            if first_loss is None:
                first_loss = float(loss)
            ragged_loss = float(loss)

    eval_apply = make_eval_apply(net, state, cfg, head="B", mesh=mesh)
    eval_imgs = (np.arange(20 * 1 * 20 * 20, dtype=np.float32)
                 .reshape(20, 1, 20, 20) % 89) / 89.0  # 20: ragged vs 8
    out = np.asarray(eval_apply(eval_imgs))
    eval_checksum = float(np.float64(out).sum())
    assert out.shape == (cfg.num_sub_heads, 20, cfg.output_k_B), out.shape

    state_sel = create_train_state(variables, tx)
    sub_head = _select_sub_head_on_loss(
        cfg, net, state_sel if not weighted else replicate(state_sel),
        pipe, lamb=1.0, mesh=mesh)
    return first_loss, ragged_loss, eval_checksum, int(sub_head)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    ckpt_dir = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from iic_tpu.parallel.mesh import (
        initialize_distributed, make_batch_globalizer, make_mesh,
        make_replicator)

    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    mesh = make_mesh()
    losses = compute(mesh,
                     globalize=make_batch_globalizer(mesh),
                     replicate=make_replicator(mesh),
                     ckpt_dir=ckpt_dir,
                     local_slice=slice(pid * 8, (pid + 1) * 8))
    r3 = compute_r3(mesh,
                    globalize=make_batch_globalizer(mesh),
                    replicate=make_replicator(mesh))
    with open(f"{out_path}.p{pid}", "w") as f:
        json.dump({"process_id": pid, "losses": losses, "r3": r3}, f)


if __name__ == "__main__":
    main()
