"""Device mesh helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(SURVEY.md §2.6). The TPU-native equivalent is a 1-D data mesh over ICI with
batch-sharded activations and replicated params; the k x k joint (clustering)
or k x k (x T x T) joint (segmentation) is psum-ed — a tiny all-reduce — so
the default training mode computes the exact *global-batch* MI estimator,
which DataParallel never did. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` before calling ``make_mesh``.
"""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # Silent truncation here would be worse than an error: the
            # trainers align batch_sz to n_devices, so a smaller mesh
            # fails every divisibility check and the whole run quietly
            # takes the unsharded ragged fallback.
            raise ValueError(
                f"requested n_devices={n_devices} but only "
                f"{len(devices)} JAX devices are visible")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up: call once per process before make_mesh; the
    mesh then spans all processes' devices (DCN between hosts, ICI within).
    Arguments default to cluster auto-detection (TPU pod environments)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_global_batch(mesh, local_batch, axis_name="data"):
    """Assemble a globally-sharded batch array from each process's local
    shard (multi-host input pipelines: every host loads only its slice)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def make_batch_globalizer(mesh, axis_name="data"):
    """Per-step batch placement for the trainers.

    Single-process (incl. single-process multi-device): identity — jit
    shards host arrays onto the mesh itself. Multi-host: each pipeline
    yields only this process's shard (numpy); assemble every batch leaf
    into one globally-sharded jax.Array over the DCN+ICI mesh."""
    if mesh is None or jax.process_count() == 1:
        return lambda batch: batch

    def globalize(batch):
        return jax.tree_util.tree_map(
            lambda x: make_global_batch(mesh, np.asarray(x), axis_name),
            batch)

    return globalize


def make_replicator(mesh):
    """Replicated placement for non-batch step inputs (TrainState, PRNG
    keys). Identity single-process; on a multi-host mesh, eager arrays are
    committed to this process's local default device and jit would reject
    them against the global mesh — device_put them with a fully-replicated
    NamedSharding instead (every process holds the same values, so the
    assembly is purely local)."""
    if mesh is None or jax.process_count() == 1:
        return lambda tree: tree

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def replicate(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)),
            tree)

    return replicate


def make_sharded_eval(apply_raw, variables, mesh):
    """Shared eval-forward sharding for the trainers: place each eval
    batch sharded over the mesh's data axis under plain jit (XLA inserts
    the collectives, so batch-stat BN still sees GLOBAL batch statistics
    — identical numerics to the unsharded forward). Ragged final eval
    batches pad to the mesh multiple, then slice.

    Multi-host: every process holds the full eval batch (the mapping
    loaders load the whole set on each host), so each process slices its
    contiguous block, the global array is assembled process-locally, the
    forward runs over the whole DCN+ICI mesh, and the outputs come back
    REPLICATED (jit's out_shardings inserts the all-gather) — every
    process returns the identical full (H, bn, k, ...) host array, so the
    downstream host-side Hungarian/eval code is process-agnostic."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import jax.numpy as jnp

    sharding = NamedSharding(mesh, P("data"))
    n_dev = mesh.size

    if jax.process_count() == 1:
        def apply_sharded(imgs):
            b = imgs.shape[0]
            pad = (-b) % n_dev  # ragged final eval batch: pad, then slice
            if pad:
                imgs = jnp.concatenate(
                    [imgs, jnp.repeat(imgs[-1:], pad, axis=0)])
            out = apply_raw(variables, jax.device_put(imgs, sharding))
            return out[:, :b] if pad else out

        return apply_sharded

    pi, pc = jax.process_index(), jax.process_count()
    replicated = NamedSharding(mesh, P())
    gvars = make_replicator(mesh)(
        jax.tree_util.tree_map(np.asarray, variables))
    apply_repl = jax.jit(lambda v, x: apply_raw(v, x),
                         out_shardings=replicated)

    def apply_sharded_mh(imgs):
        imgs = np.asarray(imgs)
        b = imgs.shape[0]
        pad = (-b) % n_dev
        if pad:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], pad, axis=0)])
        shard = imgs.shape[0] // pc
        garr = jax.make_array_from_process_local_data(
            sharding, imgs[pi * shard:(pi + 1) * shard])
        out = np.asarray(apply_repl(gvars, garr))
        return out[:, :b] if pad else out

    return apply_sharded_mh
