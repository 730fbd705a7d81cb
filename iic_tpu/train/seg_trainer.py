"""Segmentation trainers.

Epoch/head/batch loops of the reference segmentation scripts
(code/scripts/segmentation/segmentation_twohead.py:162-442 and
segmentation.py) on the fused TPU seg train steps: head alternation, loss
selected by use_uncollapsed_loss, NaN watchdog, per-epoch masked Hungarian
eval, latest/best checkpoints, restart, --test_code smoke mode, plots.
"""

import sys
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp

from iic_tpu import models
from iic_tpu.data.seg_pipeline import segmentation_create_dataloaders
from iic_tpu.evals.segmentation_eval import segmentation_eval
from iic_tpu.parallel import (
    create_train_state, make_mesh, make_seg_apply_fn, make_seg_train_step)
from iic_tpu.parallel.mesh import (make_batch_globalizer,
                                    make_replicator)
from iic_tpu.train import checkpoint as ckpt
from iic_tpu.train.cluster_trainer import (
    _make_history, _save_plots, _truncate_history, adjust_batch_for_mesh,
    host_prefetch_iter, make_optimizer, make_ragged_fallback,
    mesh_drop_last, run_epoch_scan, set_lr_mult)
from iic_tpu.train.config import config_to_str


def _log(msg):
    print(msg)
    sys.stdout.flush()


def head_order(config):
    """The seg scripts train head A FIRST by default, with --head_B_first
    flipping — the OPPOSITE default of the cluster scripts
    (segmentation_twohead.py:179-181 vs cluster_sobel_twohead.py:265)."""
    return ["B", "A"] if config.head_B_first else ["A", "B"]


def build_seg_net_and_state(config):
    net = models.build(config.arch, config)
    dummy = jnp.zeros((2, config.in_channels, config.input_sz,
                       config.input_sz), jnp.float32)
    heads = ("A", "B") if config.twohead else None
    variables = models.init_variables(
        net, jax.random.PRNGKey(config.seed), dummy, heads=heads)
    tx = make_optimizer(config)
    state = create_train_state(variables, tx)
    return net, tx, state


def make_seg_eval_apply(net, state, config, head="B", mesh=None):
    """Eval forward; with a mesh the batch is placed sharded over the data
    axis (ragged batches padded; multi-host processes slice their block
    and get replicated outputs back — see make_sharded_eval), so per-pixel
    eval scales with the mesh. Plain jit keeps BN reductions global, so
    batch-stat BN (batchnorm_track=False, the seg default) matches the
    unsharded forward exactly."""
    apply_raw = make_seg_apply_fn(net, head=head, sobel=config.sobel,
                                  include_rgb=config.include_rgb,
                                  using_IR=config.using_IR)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if mesh is not None:
        from iic_tpu.parallel.mesh import make_sharded_eval
        return make_sharded_eval(apply_raw, variables, mesh)
    return lambda imgs: apply_raw(variables, imgs)


def train_segmentation_twohead(config):
    """Two-head unsupervised segmentation (IIC). Returns (state, history)."""
    _log(config_to_str(config))
    ckpt.enable_compile_cache(config)

    use_mesh = adjust_batch_for_mesh(config)
    pipe, map_assign, map_test = segmentation_create_dataloaders(
        config, seed=config.seed,
        drop_last=mesh_drop_last(config, use_mesh))
    net, tx, state = build_seg_net_and_state(config)

    mesh = None
    if config.n_devices is not None and config.n_devices > 1:
        mesh = make_mesh(config.n_devices)
    to_global = make_batch_globalizer(mesh)
    replicate = make_replicator(mesh)

    common = dict(
        half_T_side_dense=config.half_T_side_dense,
        half_T_side_sparse_min=config.half_T_side_sparse_min,
        half_T_side_sparse_max=config.half_T_side_sparse_max,
        sobel=config.sobel, include_rgb=config.include_rgb,
        using_IR=config.using_IR,
        use_uncollapsed_loss=config.use_uncollapsed_loss,
        warp_impl="matmul_exact" if config.exact_warp else "matmul",
        joint_impl=getattr(config, "joint_impl", "pallas"),
        augment=pipe.augment, mesh=mesh, joint_mode=config.joint_mode,
        fused_pair_forward=getattr(config, "fused_pair_forward", False))
    steps = {
        "A": make_seg_train_step(net, tx, lamb=config.lamb_A, head="A",
                                 **common),
        "B": make_seg_train_step(net, tx, lamb=config.lamb_B, head="B",
                                 **common),
    }
    common_unsharded = dict(common, mesh=None)
    lambs = {"A": config.lamb_A, "B": config.lamb_B}
    ragged = {
        h: make_ragged_fallback(
            lambda h=h: make_seg_train_step(net, tx, lamb=lambs[h],
                                            head=h, **common_unsharded),
            config.batch_sz, mesh, config)
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
            h: make_seg_train_step(net, tx, lamb=lambs[h], head=h,
                                   epoch_scan=True, **common)
            for h in ("A", "B")
        }

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
        if not getattr(config, "no_pre_eval", False):
            segmentation_eval(
                config, make_seg_eval_apply(net, state, config, mesh=mesh),
                map_assign, map_test,
                history=history["eval"])
            _log(f"Pre: {history['eval'].epoch_stats[-1]}")
        else:
            history["eval"].epoch_acc.append(0.0)
            history["eval"].epoch_avg_subhead_acc.append(0.0)
            history["eval"].epoch_stats.append({})

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
                    scan_runners[head], pipe, state, e_i, head,
                    head_epochs[head])
            repeats = 0 if scan_runners is not None else head_epochs[head]
            for _ in range(repeats):
                it = host_prefetch_iter(
                    pipe.epoch(e_i, augmented=False), config)
                for b_i, (imgs, masks, key) in enumerate(it):
                    # global batch size, not the per-process shard's
                    gimgs, gmasks = to_global((imgs, masks))
                    state, loss, loss_nl = ragged[head](
                        steps[head], state, (gimgs, gmasks),
                        replicate(key), int(gimgs.shape[0]))
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

        is_best = segmentation_eval(
            config, make_seg_eval_apply(net, state, config, mesh=mesh),
            map_assign, map_test,
            history=history["eval"])
        _log(f"Epoch {e_i}: acc {history['eval'].epoch_acc[-1]:.6f} "
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


def train_segmentation_single(config):
    """Single-head IID+ segmentation (overclustering).
    Reference: code/scripts/segmentation/segmentation.py."""
    _log(config_to_str(config))
    ckpt.enable_compile_cache(config)

    use_mesh = adjust_batch_for_mesh(config)
    pipe, map_assign, map_test = segmentation_create_dataloaders(
        config, seed=config.seed,
        drop_last=mesh_drop_last(config, use_mesh))
    net, tx, state = build_seg_net_and_state(config)

    mesh = None
    if config.n_devices is not None and config.n_devices > 1:
        mesh = make_mesh(config.n_devices)
    to_global = make_batch_globalizer(mesh)
    replicate = make_replicator(mesh)

    def _make_step(step_mesh):
        return make_seg_train_step(
            net, tx, lamb=config.lamb, head=None,
            half_T_side_dense=config.half_T_side_dense,
            half_T_side_sparse_min=config.half_T_side_sparse_min,
            half_T_side_sparse_max=config.half_T_side_sparse_max,
            sobel=config.sobel, include_rgb=config.include_rgb,
            using_IR=config.using_IR,
            use_uncollapsed_loss=config.use_uncollapsed_loss,
            warp_impl="matmul_exact" if config.exact_warp else "matmul",
            joint_impl=getattr(config, "joint_impl", "pallas"),
            augment=pipe.augment, mesh=step_mesh,
            joint_mode=config.joint_mode,
            fused_pair_forward=getattr(config, "fused_pair_forward",
                                       False))

    step = _make_step(mesh)
    ragged = make_ragged_fallback(lambda: _make_step(None),
                                  config.batch_sz, mesh, config)

    history = _make_history()
    next_epoch = 1
    if config.restart:
        state, history, last_epoch = ckpt.load_checkpoint(
            config, state,
            name="best" if config.restart_from_best else "latest")
        next_epoch = (int(np.argmax(history["eval"].epoch_acc)) + 1
                      if config.restart_from_best else last_epoch + 1)
        _truncate_history(history, next_epoch)
    else:
        if not getattr(config, "no_pre_eval", False):
            segmentation_eval(
                config, make_seg_eval_apply(net, state, config, head=None,
                                        mesh=mesh),
                map_assign, map_test,
                history=history["eval"])
            _log(f"Pre: {history['eval'].epoch_stats[-1]}")
        else:
            history["eval"].epoch_acc.append(0.0)
            history["eval"].epoch_avg_subhead_acc.append(0.0)
            history["eval"].epoch_stats.append({})

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
        it = host_prefetch_iter(pipe.epoch(e_i, augmented=False), config)
        for b_i, (imgs, masks, key) in enumerate(it):
            gimgs, gmasks = to_global((imgs, masks))  # global batch size
            state, loss, loss_nl = ragged(
                step, state, (gimgs, gmasks), replicate(key),
                int(gimgs.shape[0]))
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

        is_best = segmentation_eval(
            config, make_seg_eval_apply(net, state, config, head=None,
                                        mesh=mesh),
            map_assign, map_test,
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
