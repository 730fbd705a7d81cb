"""Fused, shard_map-able training steps.

One jitted program per (head, workload): on-device augmentation -> sobel ->
double forward -> per-sub-head IID loss -> grads -> optax update. Under a
mesh the batch is sharded over the ``data`` axis, params/optimizer state are
replicated, and two reduction modes are offered (SURVEY.md §5.8):

  - ``joint_mode="global"`` (default): psum the unnormalised k x k joint
    before the log terms — the exact global-batch MI estimator (a k x k
    all-reduce over ICI, essentially free).
  - ``joint_mode="parity"``: per-shard joint, mean of per-shard losses —
    numerically equivalent to the reference's DataParallel behaviour.

Replicated-param gradients are reduced with psum (global: the per-shard grad
is the shard's contribution to the one global loss) or pmean (parity: the
loss is a mean over shards).
"""

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from iic_tpu.ops.iid_loss import IID_loss
from iic_tpu.ops.iid_seg_loss import (
    IID_segmentation_loss, IID_segmentation_loss_uncollapsed)
from iic_tpu.ops.sobel import sobel_process


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(variables, tx):
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _forward(net, params, batch_stats, imgs, **kw):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
        out, upd = net.apply(variables, imgs, train=True,
                             mutable=["batch_stats"], **kw)
        return out, upd["batch_stats"]
    out = net.apply(variables, imgs, train=True, **kw)
    return out, batch_stats


def _reduce_grads(grads, axis_name, joint_mode):
    if axis_name is None:
        return grads
    red = jax.lax.psum if joint_mode == "global" else jax.lax.pmean
    return jax.tree_util.tree_map(lambda g: red(g, axis_name), grads)


def _sync_batch_stats(bs, axis_name):
    """Running BN stats are updated per shard with per-shard batches; average
    them so the returned (replicated-spec) state is consistent across the
    mesh. (The reference's DataParallel keeps replica-0's stats — averaging
    is the strictly-better estimate of the same quantity.)"""
    if axis_name is None or not bs:
        return bs
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name), bs)


def make_cluster_train_step(net, tx, augment_pair, lamb, head,
                            sobel=False, include_rgb=False,
                            mesh=None, axis_name="data",
                            joint_mode="global", loss_impl="xla",
                            fused_pair_forward=False, epoch_scan=False,
                            weighted=False):
    """Build the jitted clustering train step for one head.

    step(state, base_u8 (b, H, W, C) uint8, key) ->
        (state, loss, loss_no_lamb)

    Mirrors the hot loop of cluster_sobel_twohead.py:286-355 with
    augmentation fused on device. ``loss_impl="pallas"`` routes each
    sub-head's loss through the fused single-pass kernel (single-device
    only: the sharded global-joint mode needs the psum between joint and
    log terms). ``fused_pair_forward`` runs ONE forward over the
    concatenated (imgs, imgs_tf) 2B batch instead of two B forwards —
    fewer launches / larger matmuls; BN batch statistics are then
    computed over the union of both views (the reference computes them
    per view), so it is a documented opt-in deviation.

    ``weighted=True``: the batch is a tuple (base_u8, weights (b,)) and
    the joint masks zero-weight samples out exactly — the multi-host
    trainers pad ragged final batches to the full batch size and weight
    the padding 0, so sample counts match the reference without dropping
    (VERDICT r2 #7). Requires the global-joint mode (a parity-mode shard
    consisting entirely of padding would normalise a zero joint). BN
    batch statistics do still see the padded rows — the one documented
    deviation, confined to the final batch of an epoch.
    """
    if loss_impl == "pallas":
        assert mesh is None, "fused kernel is per-shard; use xla with mesh"
    if weighted:
        assert joint_mode == "global", (
            "weighted (padded-batch) steps need joint_mode='global'")
        assert not epoch_scan, "epoch_scan pipelines are single-process"

    def step_fn(state, batch, key, axis):
        if weighted:
            base_u8, base_weights = batch
        else:
            base_u8, base_weights = batch, None
        if axis is not None:
            # decorrelate augmentation draws across shards
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        imgs, imgs_tf = augment_pair(base_u8, key)
        if sobel:
            imgs = sobel_process(imgs, include_rgb)
            imgs_tf = sobel_process(imgs_tf, include_rgb)

        head_kw = {} if head is None else {"head": head}

        def _pair_forward(params, batch_stats):
            if fused_pair_forward:
                both, bs = _forward(net, params, batch_stats,
                                    jnp.concatenate([imgs, imgs_tf]),
                                    **head_kw)
                out, out_tf = jnp.split(both, 2, axis=1)
                return out, out_tf, bs
            out, bs = _forward(net, params, batch_stats, imgs, **head_kw)
            out_tf, bs = _forward(net, params, bs, imgs_tf, **head_kw)
            return out, out_tf, bs

        def loss_fn(params):
            out, out_tf, bs = _pair_forward(params, state.batch_stats)
            if loss_impl == "pallas":
                from iic_tpu.ops.pallas import iid_loss_fused
                pairs = [iid_loss_fused(out[i], out_tf[i], lamb)
                         for i in range(out.shape[0])]
                losses = jnp.stack([p[0] for p in pairs])
                losses_nl = jnp.stack([p[1] for p in pairs])
            else:
                if base_weights is not None:
                    # augment_pair tiles the base batch r times block-wise
                    w = jnp.tile(base_weights,
                                 out.shape[1] // base_u8.shape[0])
                else:
                    w = None
                losses, losses_nl = jax.vmap(
                    lambda a, b: IID_loss(a, b, lamb=lamb, weights=w,
                                          axis_name=axis if joint_mode ==
                                          "global" else None)
                )(out, out_tf)
            loss = losses.mean()
            loss_nl = losses_nl.mean()
            if axis is not None and joint_mode != "global":
                loss = jax.lax.pmean(loss, axis)
                loss_nl = jax.lax.pmean(loss_nl, axis)
            return loss, (loss_nl, bs)

        (loss, (loss_nl, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = _reduce_grads(grads, axis, joint_mode)
        bs = _sync_batch_stats(bs, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, batch_stats=bs,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, loss, loss_nl

    if epoch_scan:
        return _wrap_epoch_scan(step_fn, mesh, axis_name)
    return _wrap(step_fn, mesh, axis_name,
                 batch_arity=2 if weighted else 0)


def make_seg_train_step(net, tx, lamb, head, half_T_side_dense,
                        half_T_side_sparse_min, half_T_side_sparse_max,
                        sobel=False, include_rgb=False, using_IR=False,
                        use_uncollapsed_loss=False, augment=None,
                        warp_impl="matmul", joint_impl="pallas",
                        mesh=None, axis_name="data", joint_mode="global",
                        fused_pair_forward=False, epoch_scan=False):
    """Build the jitted segmentation train step for one head.

    Without ``augment``: step(state, (img1, img2, affine2_to_1, mask), key).
    With ``augment`` (fused pipeline): step(state, (imgs_u8, masks_u8), key)
    and the paired augmentation runs inside the same jitted program.
    ``fused_pair_forward``: one 2B forward over concat(img1, img2) — see
    make_cluster_train_step (BN stats over the union of views).

    Mirrors segmentation_twohead.py:262-357.
    """
    if use_uncollapsed_loss:
        def loss_impl(*a, **kw):
            return IID_segmentation_loss_uncollapsed(
                *a, joint_impl=joint_impl, **kw)
    else:
        loss_impl = IID_segmentation_loss  # collapsed: box-filter + matmul

    def step_fn(state, batch, key, axis):
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        if augment is not None:
            imgs_u8, masks_u8 = batch
            key, k_aug = jax.random.split(key)
            img1, img2, affine2_to_1, mask = augment(imgs_u8, masks_u8,
                                                     k_aug)
        else:
            img1, img2, affine2_to_1, mask = batch
        if sobel:
            img1 = sobel_process(img1, include_rgb, using_IR=using_IR)
            img2 = sobel_process(img2, include_rgb, using_IR=using_IR)

        head_kw = {} if head is None else {"head": head}

        def loss_fn(params):
            if fused_pair_forward:
                both, bs = _forward(net, params, state.batch_stats,
                                    jnp.concatenate([img1, img2]),
                                    **head_kw)
                out1, out2 = jnp.split(both, 2, axis=1)
            else:
                out1, bs = _forward(net, params, state.batch_stats, img1,
                                    **head_kw)
                out2, bs = _forward(net, params, bs, img2, **head_kw)
            # out: (num_sub_heads, b, k, h, w)
            sub_keys = jax.random.split(key, out1.shape[0])
            losses, losses_nl = jax.vmap(
                lambda x1, x2, k_: loss_impl(
                    x1, x2, affine2_to_1, mask, lamb=lamb,
                    half_T_side_dense=half_T_side_dense,
                    half_T_side_sparse_min=half_T_side_sparse_min,
                    half_T_side_sparse_max=half_T_side_sparse_max,
                    key=k_, warp_impl=warp_impl,
                    axis_name=axis if joint_mode == "global" else None)
            )(out1, out2, sub_keys)
            loss = losses.mean()
            loss_nl = losses_nl.mean()
            if axis is not None and joint_mode != "global":
                loss = jax.lax.pmean(loss, axis)
                loss_nl = jax.lax.pmean(loss_nl, axis)
            return loss, (loss_nl, bs)

        (loss, (loss_nl, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = _reduce_grads(grads, axis, joint_mode)
        bs = _sync_batch_stats(bs, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, batch_stats=bs,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, loss, loss_nl

    if epoch_scan:
        assert augment is not None, "epoch_scan needs the fused augment"
        return _wrap_epoch_scan(step_fn, mesh, axis_name, batch_arity=2)
    return _wrap(step_fn, mesh, axis_name,
                 batch_arity=2 if augment is not None else 4)


def _wrap_epoch_scan(step_fn, mesh, axis_name, batch_arity=0):
    """Fuse a WHOLE EPOCH into one jitted program: ``lax.scan`` over the
    per-step train step. Pairs with the pipelines' resident mode
    (--resident_data): batches are rows of an index matrix, the scan body
    gathers/augments/steps entirely on device, and the host dispatches ONE
    program per epoch instead of one per step — the XLA-idiomatic training
    loop (no per-step dispatch, no host round-trips).

    Returned callable: epoch_fn(state, idx_matrix (nb, bsz) int32,
    root_key) -> (state, losses (nb,), losses_no_lamb (nb,)). Per-step keys
    are fold_in(root_key, b_i), identical to the per-step pipeline path, so
    the loss sequence matches the non-scan resident run exactly. Under a
    mesh the index matrix is sharded over its batch column and the scan
    runs inside shard_map. State buffers are donated."""

    def epoch_fn(state, idx_matrix, root_key, axis):
        def body(carry, inp):
            idxs, b_i = inp
            key = jax.random.fold_in(root_key, b_i)
            batch = (idxs,) * batch_arity if batch_arity else idxs
            new_state, loss, loss_nl = step_fn(carry, batch, key, axis=axis)
            return new_state, (loss, loss_nl)

        nb = idx_matrix.shape[0]
        state, (losses, losses_nl) = jax.lax.scan(
            body, state, (idx_matrix, jnp.arange(nb)))
        return state, losses, losses_nl

    if mesh is None:
        fn = partial(epoch_fn, axis=None)
        return jax.jit(lambda state, idx_matrix, root_key:
                       fn(state, idx_matrix, root_key),
                       donate_argnums=(0,))
    sharded = jax.shard_map(
        partial(epoch_fn, axis=axis_name),
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def _wrap(step_fn, mesh, axis_name, batch_arity=0, n_outs=3):
    """jit the step, inserting shard_map when a mesh is given."""
    if mesh is None:
        fn = partial(step_fn, axis=None)
        return jax.jit(lambda state, batch, key: fn(state, batch, key))

    batch_spec = ((P(axis_name),) * batch_arity if batch_arity
                  else P(axis_name))
    sharded = jax.shard_map(
        partial(step_fn, axis=axis_name),
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(),) * n_outs,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_semisup_train_step(forward, augment, tx, mesh=None,
                            axis_name="data"):
    """Build the jitted semisup finetune step (reference
    IID_semisup_STL10.py:227-256: tf2 augmentation -> sobel -> trunk
    features -> SupHead5 -> CrossEntropy -> both Adams step).

    step(state, (imgs_u8, labels), key) -> (state, loss)

    ``forward(params, batch_stats, imgs, train)`` -> (logits, batch_stats)
    and ``augment(imgs_u8, key)`` -> NCHW float32 (sobel included) are
    supplied by the trainer. Under a mesh the batch is sharded over the
    data axis, params/opt-state replicated; the per-shard CE mean is
    pmean'd (equal shard sizes, so it equals the global-batch mean the
    reference computes) and grads are pmean'd — the exact analogue of the
    reference's 4-GPU DataParallel semisup runs
    (examples/commands.txt:89)."""

    def step_fn(state, batch, key, axis):
        imgs_u8, labels = batch
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        imgs = augment(imgs_u8, key)

        def loss_fn(params):
            logits, bs = forward(params, state.batch_stats, imgs, True)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, bs

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = _reduce_grads(grads, axis, "parity")  # CE mean -> pmean
        if axis is not None:
            loss = jax.lax.pmean(loss, axis)
        bs = _sync_batch_stats(bs, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, batch_stats=bs,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, loss

    return _wrap(step_fn, mesh, axis_name, batch_arity=2, n_outs=2)


def make_apply_fn(net, head=None, sobel=False, include_rgb=False,
                  train_mode=False):
    """Eval-time forward closure factory for the eval stack: returns
    apply_fn(variables, imgs) jitted; bind variables with functools.partial
    per evaluation. ``train_mode=True`` reproduces "double eval" (BN in
    batch-stats mode, without updating stats)."""

    @jax.jit
    def apply_fn(variables, imgs):
        if sobel:
            imgs = sobel_process(imgs, include_rgb)
        kwargs = {} if head is None else {"head": head}
        v = {"params": variables["params"]}
        bs = variables.get("batch_stats") or None
        if bs:
            v["batch_stats"] = bs
        if train_mode:
            out = net.apply(v, imgs, train=True,
                            mutable=["batch_stats"], **kwargs)[0]
        else:
            out = net.apply(v, imgs, train=False, **kwargs)
        return out

    return apply_fn


def make_seg_apply_fn(net, head=None, sobel=False, include_rgb=False,
                      using_IR=False, train_mode=False):
    @jax.jit
    def apply_fn(variables, imgs):
        if sobel:
            imgs = sobel_process(imgs, include_rgb, using_IR=using_IR)
        kwargs = {} if head is None else {"head": head}
        v = {"params": variables["params"]}
        bs = variables.get("batch_stats") or None
        if bs:
            v["batch_stats"] = bs
        if train_mode:
            out = net.apply(v, imgs, train=True,
                            mutable=["batch_stats"], **kwargs)[0]
        else:
            out = net.apply(v, imgs, train=False, **kwargs)
        return out

    return apply_fn
