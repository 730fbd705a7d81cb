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
    with open(f"{out_path}.p{pid}", "w") as f:
        json.dump({"process_id": pid, "losses": losses}, f)


if __name__ == "__main__":
    main()
