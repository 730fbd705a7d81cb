"""Two-head clustering trainer.

The epoch/head/batch loop of the reference training scripts
(code/scripts/cluster/cluster_sobel_twohead.py:259-459 and
cluster_greyscale_twohead.py) on top of the fused TPU train steps: head
alternation (head_A_first, head_{A,B}_epochs), lr schedule (multiplicative,
Adam moments preserved), NaN watchdog, per-epoch Hungarian eval with
optional double eval, latest/best checkpointing, restart with history
truncation, --test_code smoke mode, per-epoch plots.png.
"""

import dataclasses
import os
import sys
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iic_tpu import models
from iic_tpu.data.pipeline import cluster_twohead_create_dataloaders
from iic_tpu.evals import EvalHistory, cluster_eval, get_subhead_using_loss
from iic_tpu.parallel import (
    create_train_state, make_apply_fn, make_cluster_train_step, make_mesh)
from iic_tpu.parallel.mesh import (make_batch_globalizer,
                                    make_replicator)
from iic_tpu.train import checkpoint as ckpt
from iic_tpu.train.config import config_to_str


def _log(msg):
    print(msg)
    sys.stdout.flush()


def head_order(config):
    """Cluster scripts train head B FIRST by default, --head_A_first flips
    (cluster_sobel_twohead.py:265; opposite default to the seg scripts,
    see seg_trainer.head_order)."""
    return ["A", "B"] if config.head_A_first else ["B", "A"]


def make_optimizer(config):
    assert config.opt == "Adam"  # reference supports Adam only
    return optax.inject_hyperparams(optax.adam)(learning_rate=config.lr)


def set_lr_mult(state, lr_mult):
    """Reference ``update_lr`` (utils/cluster/general.py:20-23): multiply lr
    in place, keeping optimiser moments."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = hp["learning_rate"] * lr_mult
    return dataclasses.replace(state, opt_state=opt_state._replace(
        hyperparams=hp))


def run_epoch_scan(runner, pipe, state, e_i, head, repeats):
    """Drive ``repeats`` fused head-epochs through an epoch_scan runner
    (shared by the cluster and seg trainers). (mat, root) depend only on
    e_i, so they are computed once and reused across repeats — identical
    to the per-step path, which also replays the same order and keys each
    repeat. Returns (state, loss_sum, loss_no_lamb_sum, step_count)."""
    mat, root = pipe.epoch_scan_inputs(e_i)
    loss_sum = loss_nl_sum = 0.0
    n = 0
    for _ in range(repeats):
        state, losses, losses_nl = runner(state, mat, root)
        losses = np.asarray(jax.device_get(losses))
        losses_nl = np.asarray(jax.device_get(losses_nl))
        if not np.all(np.isfinite(losses)):
            _log(f"Loss is NaN/inf ({losses}). Exiting.")
            sys.exit(1)
        loss_sum += float(losses.sum())
        loss_nl_sum += float(losses_nl.sum())
        n += len(losses)
        _log(f"  head {head} epoch-scan {len(losses)} steps "
             f"loss {losses[-1]:.5f} {datetime.now()}")
    return state, loss_sum, loss_nl_sum, n


def _make_history():
    return {
        "eval": EvalHistory(),
        "epoch_loss_head_A": [], "epoch_loss_no_lamb_head_A": [],
        "epoch_loss_head_B": [], "epoch_loss_no_lamb_head_B": [],
    }


def _truncate_history(history, next_epoch):
    history["eval"].truncate(next_epoch - 1)
    for k in ("epoch_loss_head_A", "epoch_loss_no_lamb_head_A",
              "epoch_loss_head_B", "epoch_loss_no_lamb_head_B"):
        del history[k][next_epoch - 1:]


def _save_plots(config, history):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    ev = history["eval"]
    double_eval = getattr(config, "double_eval", False)
    n = 6 + 2 * int(double_eval)
    fig, axarr = plt.subplots(n, sharex=False, figsize=(20, 20))
    panels = [
        ("acc", ev.epoch_acc),
        ("avg_subhead_acc", ev.epoch_avg_subhead_acc),
        ("loss A", history["epoch_loss_head_A"]),
        ("loss no lamb A", history["epoch_loss_no_lamb_head_A"]),
        ("loss B", history["epoch_loss_head_B"]),
        ("loss no lamb B", history["epoch_loss_no_lamb_head_B"]),
    ]
    if double_eval:
        panels += [("double eval acc", ev.double_eval_acc),
                   ("double eval avg subhead acc",
                    ev.double_eval_avg_subhead_acc)]
    for ax, (title, data) in zip(axarr, panels):
        ax.clear()
        ax.plot(data)
        ax.set_title(title)
    fig.canvas.draw_idle()
    fig.savefig(os.path.join(ckpt.run_dir(config), "plots.png"))
    plt.close(fig)


def adjust_batch_for_mesh(config):
    """shard_map needs the per-step base batch divisible by the mesh size;
    round dataloader_batch_sz down to a multiple of n_devices (paper batch
    sizes like 660/700 do not divide 8). Ragged final batches are kept and
    processed by an unsharded step (see make_ragged_fallback) except in
    multi-host runs, where pipelines drop them."""
    n = config.n_devices
    if not n or n <= 1:
        return False
    dbs = config.batch_sz // config.num_dataloaders
    new_dbs = max((dbs // n) * n, n)
    if new_dbs != dbs:
        config.batch_sz = new_dbs * config.num_dataloaders
        config.dataloader_batch_sz = new_dbs
        _log(f"mesh({n}): adjusted batch_sz to {config.batch_sz} "
             f"(dataloader_batch_sz {new_dbs})")
    return True


def mesh_drop_last(config, use_mesh):
    """Pipelines must drop ragged batches only where the trainer cannot
    handle them exactly:

    - single-process + cross-shard-BN nets (the unsharded ragged-fallback
      step cannot run a psum-BN program);
    - multi-host + parity joint mode (a padded batch can leave a shard
      that is ALL padding, whose per-shard joint would normalise zero).

    Everywhere else ragged final batches are kept: single-process meshes
    run them through the unsharded fallback step; multi-host pipelines PAD
    them to the full batch and mask the padding out of the loss exactly
    (weighted cluster joint / zeroed seg relevancy masks)."""
    import jax as _jax
    if not use_mesh:
        return False
    if _jax.process_count() > 1:
        return getattr(config, "joint_mode", "global") == "parity"
    return bool(config.bn_sync)


def host_prefetch_iter(gen, config):
    """Wrap an epoch generator in the background prefetch thread (see
    data/prefetch.py): host prep + upload for batches ahead of the
    consumer overlap its dispatch/wait on batch i — the bench's measured
    end-to-end win. Depth 8 by default (--prefetch_depth): with one host
    core shared between prep, dispatch and transport I/O, prep time
    spikes 5-50x under load (VALIDATION.md round-4 trace), and a deeper
    queue rides the spikes out for ~8 MB/batch of host RAM each.
    Pass-through on pods (shards are assembled per step by the
    globalizer), in resident mode (no per-step host work to hide) and
    under --no_host_prefetch."""
    import jax as _jax
    from iic_tpu.data.prefetch import ThreadedPrefetch
    if (isinstance(gen, ThreadedPrefetch)  # pipeline already wrapped it
            or _jax.process_count() > 1
            or getattr(config, "resident_data", False)
            or getattr(config, "no_host_prefetch", False)):
        return gen
    return ThreadedPrefetch(gen, depth=getattr(config, "prefetch_depth", 8))


def make_ragged_fallback(make_step, full_batch_size, mesh, config):
    """Wrap a sharded step so a ragged final batch (reference
    cluster_sobel_twohead.py:310-315 keeps and slices partial batches)
    runs through a lazily-built UNSHARDED twin step instead of being
    dropped. With the default global-joint mode the unsharded step
    computes the mathematically identical loss; sample counts then match
    the reference exactly. Returns run(step, state, batch, key,
    batch_size)."""
    cache = {}

    def run(step, state, batch, key, batch_size):
        if mesh is None or batch_size == full_batch_size:
            return step(state, batch, key)
        if "step" not in cache:
            _log(f"ragged batch ({batch_size}): building unsharded step")
            cache["step"] = make_step()
        return cache["step"](state, batch, key)

    return run


def build_net_and_state(config):
    """Net + initialised TrainState (+ optimizer) for a cluster config."""
    net = models.build(config.arch, config)
    dummy_c = config.in_channels
    dummy = jnp.zeros((2, dummy_c, config.input_sz, config.input_sz),
                      jnp.float32)
    heads = ("A", "B") if config.twohead else None
    variables = models.init_variables(
        net, jax.random.PRNGKey(config.seed), dummy, heads=heads)
    tx = make_optimizer(config)
    state = create_train_state(variables, tx)
    return net, tx, state


def make_eval_apply(net, state, config, head="B", train_mode=False,
                    mesh=None):
    """Eval forward closure. With a single-process mesh the batch is
    placed sharded over the data axis so the eval forward scales with the
    mesh (ragged batches pad to the mesh multiple). Under plain jit the
    BN reductions stay GLOBAL, so batch-stat BN (batchnorm_track=False
    and the train_mode "double eval") computes identical statistics to
    the unsharded forward."""
    apply_raw = make_apply_fn(net, head=head, sobel=config.sobel,
                              include_rgb=config.include_rgb,
                              train_mode=train_mode)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if mesh is not None:
        from iic_tpu.parallel.mesh import make_sharded_eval
        return make_sharded_eval(apply_raw, variables, mesh)
    return lambda imgs: apply_raw(variables, imgs)


def train_cluster_twohead(config):
    """Run the full two-head clustering workload. Returns (state, history).

    Reference: cluster_sobel_twohead.py / cluster_greyscale_twohead.py main.
    """
    _log(config_to_str(config))
    ckpt.enable_compile_cache(config)

    use_mesh = adjust_batch_for_mesh(config)
    pipe_a, pipe_b, map_assign, map_test = \
        cluster_twohead_create_dataloaders(
            config, seed=config.seed,
            drop_last=mesh_drop_last(config, use_mesh))

    net, tx, state = build_net_and_state(config)

    mesh = None
    if config.n_devices is not None and config.n_devices > 1:
        mesh = make_mesh(config.n_devices)
    to_global = make_batch_globalizer(mesh)
    replicate = make_replicator(mesh)

    lamb_a = getattr(config, "lamb_A", config.lamb)
    lamb_b = getattr(config, "lamb_B", config.lamb)
    loss_impl = ("pallas" if getattr(config, "fused_loss", False)
                 and mesh is None else "xla")
    # multi-host pipelines yield ((batch_shard, weights_shard), key): the
    # weighted step masks padded ragged-batch rows out of the joint exactly
    # (parity mode instead drops ragged batches — mesh_drop_last — and the
    # all-ones weights are discarded in the loop)
    weighted = (mesh is not None and jax.process_count() > 1
                and config.joint_mode == "global")
    steps = {
        "A": make_cluster_train_step(
            net, tx, pipe_a.augment_pair, lamb=lamb_a, head="A",
            sobel=config.sobel, include_rgb=config.include_rgb,
            mesh=mesh, joint_mode=config.joint_mode, loss_impl=loss_impl,
            fused_pair_forward=getattr(config, "fused_pair_forward",
                                       False), weighted=weighted),
        "B": make_cluster_train_step(
            net, tx, pipe_b.augment_pair, lamb=lamb_b, head="B",
            sobel=config.sobel, include_rgb=config.include_rgb,
            mesh=mesh, joint_mode=config.joint_mode, loss_impl=loss_impl,
            fused_pair_forward=getattr(config, "fused_pair_forward",
                                       False), weighted=weighted),
    }
    pipes = {"A": pipe_a, "B": pipe_b}
    lambs = {"A": lamb_a, "B": lamb_b}
    ragged = {
        h: make_ragged_fallback(
            lambda h=h: make_cluster_train_step(
                net, tx, pipes[h].augment_pair, lamb=lambs[h], head=h,
                sobel=config.sobel, include_rgb=config.include_rgb,
                mesh=None, joint_mode=config.joint_mode,
                fused_pair_forward=getattr(config, "fused_pair_forward",
                                           False)),
            config.dataloader_batch_sz, mesh, config)
        for h in ("A", "B")
    }

    heads = head_order(config)
    head_epochs = {"A": config.head_A_epochs, "B": config.head_B_epochs}

    # --epoch_scan: fuse each head's whole epoch into one lax.scan program
    # (resident data, one device dispatch per epoch; ragged batch dropped).
    scan_runners = None
    if getattr(config, "epoch_scan", False) and not config.test_code:
        assert getattr(config, "resident_data", False), (
            "--epoch_scan needs --resident_data")
        scan_runners = {
            h: make_cluster_train_step(
                net, tx, pipes[h].augment_pair, lamb=lambs[h], head=h,
                sobel=config.sobel, include_rgb=config.include_rgb,
                mesh=mesh, joint_mode=config.joint_mode,
                loss_impl=loss_impl,
                fused_pair_forward=getattr(config, "fused_pair_forward",
                                           False),
                epoch_scan=True)
            for h in ("A", "B")
        }

    history = _make_history()
    next_epoch = 1
    if config.restart:
        state, history, last_epoch = ckpt.load_checkpoint(
            config, state,
            name="best" if config.restart_from_best else "latest")
        if config.restart_from_best:
            next_epoch = int(np.argmax(history["eval"].epoch_acc)) + 1
        else:
            next_epoch = last_epoch + 1
        _truncate_history(history, next_epoch)
        _log(f"restarting from epoch {next_epoch}")
    else:
        sub_head = None
        if config.select_sub_head_on_loss:
            sub_head = _select_sub_head_on_loss(config, net, state, pipe_b,
                                                lamb_b, mesh=mesh)
        _pre_eval(config, net, state, map_assign, map_test, history,
                  sub_head, mesh=mesh)

    last_saved = next_epoch - 1  # epoch of the on-disk latest weights
    state = replicate(state)  # multi-host: init/restored state is local
    for e_i in range(next_epoch, config.num_epochs):
        _log(f"Starting e_i: {e_i} {datetime.now()}")
        if getattr(config, "profile_dir", "") and e_i == next_epoch:
            # one-epoch device trace (SURVEY.md §5.1)
            jax.profiler.start_trace(config.profile_dir)
        if e_i in set(config.lr_schedule):
            state = set_lr_mult(state, config.lr_mult)

        for head in heads:
            avg_loss = avg_loss_nl = 0.0
            count = 0
            if scan_runners is not None:
                state, avg_loss, avg_loss_nl, count = run_epoch_scan(
                    scan_runners[head], pipes[head], state, e_i, head,
                    head_epochs[head])
            repeats = 0 if scan_runners is not None else head_epochs[head]
            for _ in range(repeats):
                it = host_prefetch_iter(
                    pipes[head].epoch(e_i, augmented=False,
                                      prefetch=False), config)
                for b_i, (base, key) in enumerate(it):
                    if jax.process_count() > 1 and not weighted:
                        base = base[0]  # parity: all-ones weights dropped
                    # size of the GLOBAL batch (multi-host pipelines yield
                    # per-process shards) — the ragged check compares it
                    # to the global dataloader_batch_sz
                    gbase = to_global(base)
                    gsz = int((gbase[0] if weighted else gbase).shape[0])
                    state, loss, loss_nl = ragged[head](
                        steps[head], state, gbase,
                        replicate(key), gsz)
                    loss, loss_nl = float(loss), float(loss_nl)
                    if not np.isfinite(loss):
                        _log(f"Loss is NaN/inf ({loss}). Exiting.")
                        sys.exit(1)
                    avg_loss += loss
                    avg_loss_nl += loss_nl
                    count += 1
                    if b_i % 100 == 0:
                        _log(f"  head {head} batch {b_i} loss {loss:.5f} "
                             f"{datetime.now()}")
                    if config.test_code and b_i >= 1:
                        break
                if hasattr(it, "close"):
                    it.close()  # early-exit safe; no-op when exhausted
            history[f"epoch_loss_head_{head}"].append(avg_loss / count)
            history[f"epoch_loss_no_lamb_head_{head}"].append(
                avg_loss_nl / count)

        is_best = _epoch_eval(config, net, state, map_assign, map_test,
                              history, mesh=mesh)
        if getattr(config, "save_progression", False):
            # MNIST progression point clouds, figure 3 of the paper
            # (reference cluster_greyscale_twohead.py:269-277)
            from iic_tpu.utils.render import save_progress
            save_progress(config, make_eval_apply(net, state, config),
                          map_assign, map_test, index=e_i)
        _log(f"Epoch {e_i}: acc {history['eval'].epoch_acc[-1]:.6f} "
             f"avg {history['eval'].epoch_avg_subhead_acc[-1]:.6f} "
             f"loss A {history['epoch_loss_head_A'][-1]:.5f} "
             f"loss B {history['epoch_loss_head_B'][-1]:.5f}")

        if getattr(config, "profile_dir", "") and e_i == next_epoch:
            jax.profiler.stop_trace()

        _save_plots(config, history)
        if e_i % config.save_freq == 0 or e_i == config.num_epochs - 1:
            ckpt.save_checkpoint(config, state, history, "latest",
                                 last_epoch=e_i)
            last_saved = e_i
        if is_best:
            ckpt.save_checkpoint(config, state, history, "best",
                                 last_epoch=last_saved)
        # config.pickle/txt every epoch (reference :449-455); last_epoch
        # stays pinned to the epoch of the on-disk latest weights
        ckpt.save_meta(config, history, last_saved)
        if config.test_code:
            break

    ckpt.wait_for_orbax()  # commit any in-flight async save
    return state, history


def _pre_eval(config, net, state, map_assign, map_test, history, sub_head,
              mesh=None):
    double_apply = None
    if config.double_eval:
        double_apply = make_eval_apply(net, state, config, train_mode=True)
    cluster_eval(
        config, make_eval_apply(net, state, config, mesh=mesh),
        map_assign, map_test, history=history["eval"],
        double_eval_apply_fn=double_apply, use_sub_head=sub_head)
    _log(f"Pre: {history['eval'].epoch_stats[-1]}")


def _epoch_eval(config, net, state, map_assign, map_test, history,
                mesh=None):
    double_apply = None
    if config.double_eval:
        double_apply = make_eval_apply(net, state, config, train_mode=True)
    is_best, _ = cluster_eval(
        config, make_eval_apply(net, state, config, mesh=mesh),
        map_assign, map_test, history=history["eval"],
        double_eval_apply_fn=double_apply)
    return is_best


def train_cluster_single(config):
    """Single-head IID+ clustering workload (semisup overclustering
    pretraining). Reference: cluster_sobel.py:101-347 / cluster_greyscale.py.
    Returns (state, history)."""
    from iic_tpu.data.pipeline import cluster_create_dataloaders

    _log(config_to_str(config))
    ckpt.enable_compile_cache(config)
    use_mesh = adjust_batch_for_mesh(config)
    pipe, map_assign, map_test = cluster_create_dataloaders(
        config, seed=config.seed,
        drop_last=mesh_drop_last(config, use_mesh))
    net, tx, state = build_net_and_state(config)

    mesh = None
    if config.n_devices is not None and config.n_devices > 1:
        mesh = make_mesh(config.n_devices)
    to_global = make_batch_globalizer(mesh)
    replicate = make_replicator(mesh)

    weighted = (mesh is not None and jax.process_count() > 1
                and config.joint_mode == "global")

    def _make_step(step_mesh):
        return make_cluster_train_step(
            net, tx, pipe.augment_pair, lamb=config.lamb, head=None,
            sobel=config.sobel, include_rgb=config.include_rgb,
            mesh=step_mesh, joint_mode=config.joint_mode,
            weighted=weighted and step_mesh is not None)

    step = _make_step(mesh)
    ragged = make_ragged_fallback(lambda: _make_step(None),
                                  config.dataloader_batch_sz, mesh, config)

    history = _make_history()
    next_epoch = 1
    if config.restart:
        state, history, last_epoch = ckpt.load_checkpoint(
            config, state,
            name="best" if config.restart_from_best else "latest")
        next_epoch = (int(np.argmax(history["eval"].epoch_acc)) + 1
                      if config.restart_from_best else last_epoch + 1)
        _truncate_history(history, next_epoch)
        _log(f"restarting from epoch {next_epoch}")
    else:
        apply_fn = make_eval_apply(net, state, config, head=None)
        cluster_eval(config, apply_fn, map_assign, map_test,
                     history=history["eval"])
        _log(f"Pre: {history['eval'].epoch_stats[-1]}")

    last_saved = next_epoch - 1  # epoch of the on-disk latest weights
    state = replicate(state)  # multi-host: init/restored state is local
    for e_i in range(next_epoch, config.num_epochs):
        _log(f"Starting e_i: {e_i} {datetime.now()}")
        if getattr(config, "profile_dir", "") and e_i == next_epoch:
            # one-epoch device trace (SURVEY.md §5.1)
            jax.profiler.start_trace(config.profile_dir)
        if e_i in set(config.lr_schedule):
            state = set_lr_mult(state, config.lr_mult)

        avg_loss = avg_loss_nl = 0.0
        count = 0
        it = host_prefetch_iter(
            pipe.epoch(e_i, augmented=False, prefetch=False), config)
        for b_i, (base, key) in enumerate(it):
            if jax.process_count() > 1 and not weighted:
                base = base[0]  # parity: all-ones weights dropped
            gbase = to_global(base)  # global batch size, not the shard's
            state, loss, loss_nl = ragged(
                step, state, gbase, replicate(key),
                int((gbase[0] if weighted else gbase).shape[0]))
            loss, loss_nl = float(loss), float(loss_nl)
            if not np.isfinite(loss):
                _log(f"Loss is NaN/inf ({loss}). Exiting.")
                sys.exit(1)
            avg_loss += loss
            avg_loss_nl += loss_nl
            count += 1
            if config.test_code and b_i >= 1:
                break
        if hasattr(it, "close"):
            it.close()  # early-exit safe; no-op when exhausted
        history["epoch_loss_head_B"].append(avg_loss / count)
        history["epoch_loss_no_lamb_head_B"].append(avg_loss_nl / count)

        apply_fn = make_eval_apply(net, state, config, head=None)
        is_best, _ = cluster_eval(config, apply_fn, map_assign, map_test,
                                  history=history["eval"])
        _log(f"Epoch {e_i}: acc {history['eval'].epoch_acc[-1]:.6f} "
             f"loss {avg_loss / count:.5f}")
        if getattr(config, "profile_dir", "") and e_i == next_epoch:
            jax.profiler.stop_trace()

        _save_plots(config, history)
        if e_i % config.save_freq == 0 or e_i == config.num_epochs - 1:
            ckpt.save_checkpoint(config, state, history, "latest",
                                 last_epoch=e_i)
            last_saved = e_i
        if is_best:
            ckpt.save_checkpoint(config, state, history, "best",
                                 last_epoch=last_saved)
        # config.pickle/txt every epoch (reference :449-455); last_epoch
        # stays pinned to the epoch of the on-disk latest weights
        ckpt.save_meta(config, history, last_saved)
        if config.test_code:
            break

    ckpt.wait_for_orbax()  # commit any in-flight async save
    return state, history


def _select_sub_head_on_loss(config, net, state, pipe_b, lamb, mesh=None):
    """Reference get_subhead_using_loss over head-B dataloaders.

    Multi-host: each process feeds its unaugmented batch shard; the pair
    augmentation, forward and per-sub-head weighted IID loss all run in
    one jitted program over the global mesh (padded ragged rows are
    0-weighted out of the joint), so the accumulated per-sub-head losses —
    and the argmin — are identical on every process."""
    apply_raw = make_apply_fn(net, head="B", sobel=config.sobel,
                              include_rgb=config.include_rgb)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if jax.process_count() == 1:
        def pairs():
            for imgs, imgs_tf in pipe_b.epoch(0, augmented=True):
                yield (apply_raw(variables, imgs),
                       apply_raw(variables, imgs_tf))

        return get_subhead_using_loss(config, pairs(), lamb=lamb)

    assert mesh is not None, "multi-host selection needs the global mesh"
    from iic_tpu.ops.iid_loss import IID_loss
    to_global = make_batch_globalizer(mesh)
    replicate = make_replicator(mesh)
    gvars = replicate(variables)

    @jax.jit
    def batch_losses(base, w, key):
        imgs, imgs_tf = pipe_b.augment_pair(base, key)
        out = apply_raw(gvars, imgs)        # (H, bn, k)
        out_tf = apply_raw(gvars, imgs_tf)
        wt = jnp.tile(w, out.shape[1] // base.shape[0])
        losses, _ = jax.vmap(
            lambda a, b: IID_loss(a, b, lamb=lamb, weights=wt))(out, out_tf)
        return losses

    loss_per_sub_head = np.zeros(config.num_sub_heads)
    for (base, w), key in pipe_b.epoch(0, augmented=False):
        losses = batch_losses(to_global(np.asarray(base)),
                              to_global(np.asarray(w)), replicate(key))
        loss_per_sub_head += np.asarray(losses)
    return int(np.argmin(loss_per_sub_head))
