"""Triplets baseline trainer.

Mirror of code/scripts/cluster/baselines/triplets_sobel.py /
triplets_greyscale.py: anchor = tf1(x), positive = tf2(x), negative =
tf1(x') for shuffled x'; KL triplet loss on logits; eval = Hungarian match
of argmax outputs over the test loader (``triplets_eval``,
code/utils/cluster/baselines/triplets.py:176-229) with per-class mass /
accuracy tracking, or optional k-means on features.
"""

import sys
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iic_tpu import models
from iic_tpu.data.pipeline import (
    ClusterTrainPipeline, MappingLoader, _twohead_partitions)
from iic_tpu.evals.metrics import accuracy, hungarian_match, reorder_preds
from iic_tpu.ops.baselines import triplets_loss
from iic_tpu.ops.sobel import sobel_process
from iic_tpu.parallel import create_train_state
from iic_tpu.parallel.train_step import TrainState
from iic_tpu.train import checkpoint as ckpt
from iic_tpu.train.cluster_trainer import (host_prefetch_iter,
                                           make_optimizer)
from iic_tpu.train.config import config_to_str


def _log(msg):
    print(msg)
    sys.stdout.flush()


def triplets_eval(config, apply_fn, test_loader, history,
                  features_fn=None):
    """Reference ``triplets_eval``: argmax preds over the test loader,
    Hungarian match, acc + per-class mass/accuracy appended to history.
    With ``features_fn`` (config.kmeans_on_features), predictions come from
    k-means fitted on the net's features instead
    (``triplets_get_data_kmeans_on_features``, baselines/triplets.py:134)."""
    preds_l, targets_l = [], []
    if features_fn is not None:
        from sklearn.cluster import KMeans
        feats_l = []
        for imgs, targets in test_loader:
            feats_l.append(np.asarray(features_fn(imgs)))
            targets_l.append(np.asarray(targets))
        feats = np.concatenate(feats_l)
        flat_targets = np.concatenate(targets_l).astype(np.int32)
        km = KMeans(n_clusters=config.gt_k, random_state=config.seed,
                    n_init=10)
        flat_preds = km.fit_predict(feats).astype(np.int32)
    else:
        for imgs, targets in test_loader:
            outs = apply_fn(imgs)  # (bn, output_k) logits
            preds_l.append(np.asarray(outs.argmax(axis=1)))
            targets_l.append(np.asarray(targets))
        flat_preds = np.concatenate(preds_l).astype(np.int32)
        flat_targets = np.concatenate(targets_l).astype(np.int32)

    # k-means variant always produces gt_k clusters
    preds_k = config.gt_k if features_fn is not None else config.output_k
    match = hungarian_match(flat_preds, flat_targets,
                            preds_k=preds_k, targets_k=config.gt_k)
    reordered = reorder_preds(flat_preds, match)
    assert len({p for p, _ in match}) == config.gt_k

    mass = np.zeros((1, config.gt_k))
    per_class_acc = np.zeros((1, config.gt_k))
    for c in range(config.gt_k):
        flags = reordered == c
        actual = flat_targets == c
        mass[0, c] = flags.sum()
        per_class_acc[0, c] = (flags & actual).sum()

    acc = accuracy(reordered, flat_targets, config.gt_k)
    is_best = (len(history["epoch_acc"]) > 0
               and acc > max(history["epoch_acc"]))
    history["epoch_acc"].append(acc)
    history["masses"].append(mass[0].tolist())
    history["per_class_acc"].append(per_class_acc[0].tolist())
    return is_best


def train_triplets(config):
    """Returns (state, history)."""
    _log(config_to_str(config))
    ckpt.enable_compile_cache(config)

    train_parts, _, _, map_test_parts = _twohead_partitions(config)
    config.train_partitions_head_A = train_parts
    config.mapping_test_partitions = map_test_parts

    resident = getattr(config, "resident_data", False)
    pipe = ClusterTrainPipeline(config, train_parts, seed=config.seed,
                                resident=resident)
    test_loader = MappingLoader(config, map_test_parts)

    net = models.build(config.arch, config)
    dummy = jnp.zeros((2, config.in_channels, config.input_sz,
                       config.input_sz))
    variables = net.init(jax.random.PRNGKey(config.seed), dummy)
    tx = make_optimizer(config)
    state = create_train_state(variables, tx)

    sobel = config.sobel
    include_rgb = config.include_rgb
    augment_pair = pipe.augment_pair

    @jax.jit
    def train_step(state, base_u8, neg_u8, key):
        k1, k2 = jax.random.split(key)
        imgs_orig, imgs_pos = augment_pair(base_u8, k1)
        # negative: tf1 of a shuffled batch — reference uses the shuffled
        # loader's tf1 output (triplets.py:79-85); reuse tf1 via
        # augment_pair's first output on the shuffled images.
        imgs_neg, _ = augment_pair(neg_u8, k2)
        if sobel:
            imgs_orig = sobel_process(imgs_orig, include_rgb)
            imgs_pos = sobel_process(imgs_pos, include_rgb)
            imgs_neg = sobel_process(imgs_neg, include_rgb)

        def loss_fn(params):
            def fwd(p, bs, im):
                v = {"params": p}
                if bs:
                    v["batch_stats"] = bs
                    out, upd = net.apply(v, im, train=True,
                                         mutable=["batch_stats"])
                    return out, upd["batch_stats"]
                return net.apply(v, im, train=True), bs

            out_o, bs = fwd(params, state.batch_stats, imgs_orig)
            out_p, bs = fwd(params, bs, imgs_pos)
            out_n, bs = fwd(params, bs, imgs_neg)
            return triplets_loss(out_o, out_p, out_n), bs

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, batch_stats=bs,
                          opt_state=opt_state,
                          step=state.step + 1), loss

    apply_raw = jax.jit(lambda v, im: net.apply(
        v, sobel_process(im, include_rgb) if sobel else im, train=False))
    features_raw = jax.jit(lambda v, im: net.apply(
        v, sobel_process(im, include_rgb) if sobel else im, train=False,
        kmeans_use_features=True))

    def make_apply(state, features=False):
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        raw = features_raw if features else apply_raw
        return lambda im: raw(v, im)

    history = {"epoch_acc": [], "epoch_loss": [], "masses": [],
               "per_class_acc": []}
    next_epoch = 1
    if config.restart:
        state, history, last_epoch = ckpt.load_checkpoint(config, state,
                                                          name="latest")
        next_epoch = last_epoch + 1
        # config.pickle holds the full every-epoch history but
        # latest.ckpt is only saved every save_freq epochs: truncate to
        # the restored weights so re-run epochs are not double-appended
        # (mirrors cluster_trainer._truncate_history). The pre-eval is
        # "epoch 0": epoch e's eval lives at index e, its loss at e - 1.
        for k in ("epoch_acc", "masses", "per_class_acc"):
            del history[k][last_epoch + 1:]
        del history["epoch_loss"][last_epoch:]
    else:
        kf = getattr(config, "kmeans_on_features", False)
        triplets_eval(config, make_apply(state), test_loader, history,
                      features_fn=make_apply(state, features=True)
                      if kf else None)
        _log(f"Pre: acc {history['epoch_acc'][-1]:.6f}")

    n = len(pipe.images)
    bsz = pipe.dataloader_batch_sz
    last_saved = next_epoch - 1  # epoch of the on-disk latest weights
    for e_i in range(next_epoch, config.num_epochs):
        _log(f"Starting e_i: {e_i} {datetime.now()}")
        neg_rng = np.random.default_rng(
            np.random.SeedSequence([config.seed, e_i, 77]))
        neg_order = neg_rng.permutation(n)
        avg_loss = 0.0
        count = 0
        it = host_prefetch_iter(
            pipe.epoch(e_i, augmented=False, prefetch=False), config)
        for b_i, (base, key) in enumerate(it):
            neg_idx = neg_order[b_i * bsz:b_i * bsz + base.shape[0]]
            # resident mode: batches are index arrays; the negative is a
            # shuffled index batch gathered on device by augment_pair
            neg = (jnp.asarray(neg_idx.astype(np.int32)) if resident
                   else jnp.asarray(pipe.images[neg_idx]))
            state, loss = train_step(state, base, neg, key)
            loss = float(loss)
            if not np.isfinite(loss):
                _log(f"Loss is NaN/inf ({loss}). Exiting.")
                sys.exit(1)
            avg_loss += loss
            count += 1
            if config.test_code and b_i >= 1:
                break
        if hasattr(it, "close"):
            it.close()  # early-exit safe; no-op when exhausted
        history["epoch_loss"].append(avg_loss / count)

        kf = getattr(config, "kmeans_on_features", False)
        is_best = triplets_eval(config, make_apply(state), test_loader,
                                history,
                                features_fn=make_apply(state, features=True)
                                if kf else None)
        _log(f"Epoch {e_i}: acc {history['epoch_acc'][-1]:.6f} "
             f"loss {avg_loss / count:.5f}")
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
