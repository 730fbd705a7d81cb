"""Doersch / Isola segmentation baseline trainers.

Mirror of code/scripts/segmentation/baselines/doersch.py and isola.py:
train the siamese patch heads with self-supervised patch-pair objectives
(9-way relative position CE / adjacency BCE), then evaluate by k-means on
penultimate features with Hungarian matching (kmeans_segmentation_eval).

Patch sampling follows the reference convention by default: ONE
(centre, other, label) pair per batch, shared by every image
("pick the same locations for all images, for computational ease" —
code/utils/segmentation/baselines/doersch_utils.py:7-44,
isola_utils.py:83-128), drawn on host with the reference's exact polar
geometry, and the loss is relevancy-masked per sample (a pair counts iff
either patch centre is mask-relevant). ``--per_sample_patches`` switches
to the TPU-native extension: an independent pair per image, sampled on
device from the PRNG key.
"""

import sys
from datetime import datetime

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iic_tpu import models
from iic_tpu.data.seg_pipeline import segmentation_create_dataloaders
from iic_tpu.evals.kmeans_eval import kmeans_segmentation_eval
from iic_tpu.ops.baselines import doersch_loss, isola_loss
from iic_tpu.ops.sobel import sobel_process
from iic_tpu.parallel import create_train_state
from iic_tpu.parallel.train_step import TrainState
from iic_tpu.train import checkpoint as ckpt
from iic_tpu.train.cluster_trainer import make_optimizer
from iic_tpu.train.config import config_to_str

# 3x3 grid of relative positions (incl. centre): the 9 Doersch classes.
_POSITIONS = np.array([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                      np.int32)


def _log(msg):
    print(msg)
    sys.stdout.flush()


def _pol2cart(r, phi):
    """Reference general.py:21-24: returns (y, x) = (r sin phi, r cos phi)."""
    return r * np.sin(phi), r * np.cos(phi)


def compute_doersch_rgb_stats(config, pipe, max_imgs=2000):
    """Masked RGB pixel mean/stddev over the raw train images — the stats
    the Doersch colour-dropping noise draws from (reference
    datasets/segmentation/baselines/doersch.py:78-117, which accumulates
    the prepared train tuples once and caches a pickle under
    ``config.doersch_stats``). Deviation: computed on the raw [0, 1]
    frames rather than one epoch of augmented draws — same distribution
    up to the (mild) colour jitter, and deterministic. Datasets larger
    than ``max_imgs`` are seeded-subsampled (the stats are a mean/std).
    Returns (mean (3,), stddev (3,)) float32."""
    import os
    import pickle

    cache = None
    stats_dir = getattr(config, "doersch_stats", "")
    if stats_dir:
        os.makedirs(stats_dir, exist_ok=True)
        cache = os.path.join(stats_dir, f"{config.dataset}_stats.pickle")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                stats = pickle.load(f)
            return (np.asarray(stats["mean"], np.float32),
                    np.asarray(stats["stddev"], np.float32))

    _log("computing Doersch rgb stats over the train set")
    tot = np.zeros(3, np.float64)
    tot_sq = np.zeros(3, np.float64)
    count = 0
    for d in pipe.datasets:
        n = len(d)
        idxs = range(n)
        if n > max_imgs:
            idxs = np.random.default_rng(config.seed).choice(
                n, max_imgs, replace=False)
        for i in idxs:
            img, label = d._load_raw(i)
            if label is not None:
                _, mask = d._filter_label(np.asarray(label))
            else:
                mask = np.ones(np.asarray(img).shape[:2], bool)
            rgb = np.asarray(img, np.float32)[..., :3] / 255.0
            sel = rgb[mask]  # (n_relevant, 3)
            tot += sel.sum(axis=0)
            tot_sq += (sel.astype(np.float64) ** 2).sum(axis=0)
            count += sel.shape[0]
    assert count > 0, "no relevant pixels for Doersch stats"
    mean = tot / count
    stddev = np.sqrt(np.maximum(tot_sq / count - mean ** 2, 0.0))
    _log(f"Doersch rgb stats: mean {mean} stddev {stddev}")
    if cache:
        with open(cache, "wb") as f:
            pickle.dump({"mean": mean, "stddev": stddev}, f)
    return mean.astype(np.float32), stddev.astype(np.float32)


def doersch_channel_noise(key, img, mean3, std3):
    """Doersch colour-dropping (reference datasets/segmentation/baselines/
    doersch.py:55-73): per image, keep ONE random rgb channel and replace
    the other two with Gaussian noise of the KEPT channel's mean and
    stddev/100 — defeats the chromatic-aberration shortcut. Applied to
    the first 3 channels only; the grey/sobel channels are computed from
    the un-noised image, like the reference (the dataset prepares
    [rgb, grey] before its Doersch wrapper noises the rgb)."""
    b = img.shape[0]
    k1, k2 = jax.random.split(key)
    keep = jax.random.randint(k1, (b,), 0, 3)
    noise = (jax.random.normal(k2, (b, 3) + img.shape[2:], img.dtype)
             * (std3[keep] / 100.0)[:, None, None, None]
             + mean3[keep][:, None, None, None])
    replaced = jnp.arange(3)[None, :] != keep[:, None]  # (b, 3)
    rgb = jnp.where(replaced[:, :, None, None], noise, img[:, :3])
    return jnp.concatenate([rgb, img[:, 3:]], axis=1)


def doersch_set_patches(rng, input_sz, patch_side):
    """One shared (centre (2,), other (2,), position_gt) per batch —
    reference doersch_utils.py:7-44 math verbatim: position_gt in 0..8
    maps to angle position_gt*pi/4 (classes 0 and 8 alias at phi=0; there
    is no centre class), radius uniform in [1.5, 2)*patch_side, centre
    uniform in [1.5p, sz-1.5p), rejection-resample until ``other`` clears
    the floor(p/2) border."""
    assert input_sz > 3 * patch_side, (input_sz, patch_side)
    img_sz = np.array([input_sz, input_sz])
    d_border = np.floor(patch_side / 2.0) * np.ones(2)
    patch = np.array([patch_side, patch_side], np.float64)
    while True:
        position_gt = int(rng.integers(9))
        start, end = 1.5 * patch, img_sz - 1.5 * patch
        centre = np.floor(rng.random(2) * (end - start) + start).astype(int)
        r = rng.random() * (2.0 - 1.5) * patch_side + 1.5 * patch_side
        dh, dw = _pol2cart(r, position_gt * np.pi / 4.0)
        other = (centre + np.array([dh, dw])).astype(np.int32)
        if (other >= d_border).all() and (other < img_sz - d_border).all():
            return centre.astype(np.int32), other, position_gt


def isola_set_patches(rng, input_sz, patch_side):
    """One shared (centre, other, adjacent) per batch — reference
    isola_utils.py:83-128: adjacent pairs are DIAGONAL block neighbours
    (dh, dw both +-patch_side); non-adjacent ones sit at radius
    [2p, max(h,w)) in a uniform random direction."""
    assert input_sz > 3 * patch_side, (input_sz, patch_side)
    img_sz = np.array([input_sz, input_sz])
    d_border = np.floor(patch_side / 2.0) * np.ones(2)
    patch = np.array([patch_side, patch_side], np.float64)
    adjacent = bool(rng.random() < 0.5)
    # The reference never resamples `adjacent` inside its retry loop; on
    # tight geometries a non-adjacent placement can be (near-)infeasible,
    # so re-draw it occasionally there instead of hanging. On standard
    # configs (input_sz >= 4 * patch_side) rejection always terminates, and
    # never resampling keeps the adjacent/non-adjacent marginal exactly
    # distribution-identical to the reference.
    tight = input_sz < 4 * patch_side
    attempt = 0
    while True:
        attempt += 1
        if tight and attempt % 100 == 0:
            adjacent = bool(rng.random() < 0.5)
        start, end = 1.5 * patch, img_sz - 1.5 * patch
        centre = np.floor(rng.random(2) * (end - start) + start).astype(int)
        if adjacent:
            d = np.array([rng.choice([-1, 1]) * patch_side,
                          rng.choice([-1, 1]) * patch_side])
            other = np.floor(centre + d).astype(np.int32)
        else:
            r = rng.random() * (input_sz - 2.0 * patch_side) \
                + 2.0 * patch_side
            dh, dw = _pol2cart(r, rng.random() * 2.0 * np.pi)
            other = (centre + np.array([dh, dw])).astype(np.int32)
        if (other >= d_border).all() and (other < img_sz - d_border).all():
            return centre.astype(np.int32), other, int(adjacent)


def sample_doersch_pairs(key, batch, input_sz, patch_side):
    """Per-sample (centre, other, position_label) — the on-device
    ``--per_sample_patches`` variant (3x3 grid of offsets incl. centre)."""
    k1, k2 = jax.random.split(key)
    margin = patch_side // 2 + patch_side + 1
    centre = jax.random.randint(k1, (batch, 2), margin, input_sz - margin)
    labels = jax.random.randint(k2, (batch,), 0, 9)
    offsets = jnp.asarray(_POSITIONS)[labels] * patch_side
    other = centre + offsets
    return centre, other, labels


def sample_isola_pairs(key, batch, input_sz, patch_side):
    """Per-sample (centre, other, is_adjacent): half adjacent (offset =
    patch_side in a random compass direction), half distant."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    margin = patch_side // 2 + 4 * patch_side + 1
    centre = jax.random.randint(k1, (batch, 2), margin, input_sz - margin)
    is_adj = jax.random.bernoulli(k2, 0.5, (batch,))
    dir_idx = jax.random.randint(k3, (batch,), 0, 8)
    dirs = jnp.asarray(np.concatenate([_POSITIONS[:4], _POSITIONS[5:]]))
    adj_other = centre + dirs[dir_idx] * patch_side
    far_other = centre + dirs[dir_idx] * (
        patch_side * jax.random.randint(k4, (batch, 1), 3, 5))
    other = jnp.where(is_adj[:, None], adj_other, far_other)
    return centre, other, is_adj.astype(jnp.int32)


def train_seg_baseline(config, kind):
    """kind: "doersch" | "isola". Returns (state, history)."""
    _log(config_to_str(config))
    ckpt.enable_compile_cache(config)
    assert kind in ("doersch", "isola")
    config.single_mode = True

    pipe, map_assign, map_test = segmentation_create_dataloaders(
        config, seed=config.seed)
    net = models.build(config.arch, config)
    patch_side = (getattr(config, "doersch_patch_side", 9) if
                  kind == "doersch" else
                  getattr(config, "isola_patch_side", 9))

    dummy = jnp.zeros((2, config.in_channels, config.input_sz,
                       config.input_sz))
    dummy_centres = jnp.full((2, 2), config.input_sz // 2, jnp.int32)
    variables = net.init(
        {"params": jax.random.PRNGKey(config.seed),
         "dropout": jax.random.PRNGKey(1)},
        dummy, centre=dummy_centres, other=dummy_centres, train=True)
    tx = make_optimizer(config)
    state = create_train_state(variables, tx)

    sobel = config.sobel
    include_rgb = config.include_rgb
    using_ir = config.using_IR
    augment = pipe.augment
    # Doersch colour-dropping: rgb channels replaced with stat-matched
    # noise during training (data.py:104, gated exactly like the
    # reference: use_doersch_datasets AND include_rgb, train only)
    noise_stats = None
    if getattr(config, "use_doersch_datasets", False) and include_rgb:
        mean3, std3 = compute_doersch_rgb_stats(config, pipe)
        noise_stats = (jnp.asarray(mean3), jnp.asarray(std3))
    per_sample = getattr(config, "per_sample_patches", False)
    sample_fn = (sample_doersch_pairs if kind == "doersch"
                 else sample_isola_pairs)
    set_fn = (doersch_set_patches if kind == "doersch"
              else isola_set_patches)
    loss_fn_impl = doersch_loss if kind == "doersch" else isola_loss

    @jax.jit
    def train_step(state, imgs_u8, masks_u8, key, centre_in, other_in,
                   labels_in):
        k_aug, k_pairs, k_drop, k_noise = jax.random.split(key, 4)
        img1, _, _, mask = augment(imgs_u8, masks_u8, k_aug)
        if noise_stats is not None:
            img1 = doersch_channel_noise(k_noise, img1, *noise_stats)
        if sobel:
            img1 = sobel_process(img1, include_rgb, using_IR=using_ir)
        if per_sample:
            centre, other, labels = sample_fn(
                k_pairs, img1.shape[0], config.input_sz, patch_side)
        else:  # reference convention: one shared pair per batch
            bn = img1.shape[0]
            centre = jnp.broadcast_to(centre_in, (bn, 2))
            other = jnp.broadcast_to(other_in, (bn, 2))
            labels = labels_in
        # relevancy mask per pair: kept iff either patch centre is in the
        # mask (doersch_utils.py:55-58 / isola_utils.py:27-30)
        gather = jax.vmap(lambda m, c: m[c[0], c[1]])
        mask_per_pred = ((gather(mask, centre) + gather(mask, other))
                         > 0).astype(jnp.float32)

        def loss_fn(params):
            v = {"params": params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
                logits, upd = net.apply(
                    v, img1, centre=centre, other=other, train=True,
                    mutable=["batch_stats"], rngs={"dropout": k_drop})
                bs = upd["batch_stats"]
            else:
                logits = net.apply(v, img1, centre=centre, other=other,
                                   train=True, rngs={"dropout": k_drop})
                bs = state.batch_stats
            return loss_fn_impl(logits, labels, mask_per_pred), bs

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, batch_stats=bs,
                          opt_state=opt_state,
                          step=state.step + 1), loss

    @jax.jit
    def features_fn_raw(variables, imgs):
        if sobel:
            imgs = sobel_process(imgs, include_rgb, using_IR=using_ir)
        return net.apply(variables, imgs, train=False, penultimate=True)

    def make_features_fn(state):
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return lambda imgs: features_fn_raw(v, imgs)

    # --max_num_kmeans_samples (reference doersch.py:36): cap the pixel
    # features sampled for the k-means eval; <= 0 keeps our default.
    cap = getattr(config, "max_num_kmeans_samples", -1)
    kmeans_kwargs = {"max_num_samples": cap} if cap > 0 else {}
    if getattr(config, "verbose", False):  # reference doersch.py:285
        kmeans_kwargs["verbose"] = True

    history = {"epoch_acc": [], "epoch_loss": []}
    next_epoch = 1
    if config.restart:
        state, history, last_epoch = ckpt.load_checkpoint(config, state,
                                                          name="latest")
        next_epoch = last_epoch + 1
        # config.pickle holds the full every-epoch history but
        # latest.ckpt is only saved every save_freq epochs: truncate to
        # the restored weights so re-run epochs are not double-appended.
        # Pre-eval is "epoch 0": epoch e's acc at index e, loss at e - 1.
        del history["epoch_acc"][last_epoch + 1:]
        del history["epoch_loss"][last_epoch:]
    else:
        stats = kmeans_segmentation_eval(
            make_features_fn(state), map_assign, config.gt_k,
            **kmeans_kwargs)
        history["epoch_acc"].append(stats["acc"])
        _log(f"Pre: kmeans acc {stats['acc']:.6f}")

    last_saved = next_epoch - 1  # epoch of the on-disk latest weights
    for e_i in range(next_epoch, config.num_epochs):
        _log(f"Starting e_i: {e_i} {datetime.now()}")
        avg_loss = 0.0
        count = 0
        for b_i, (imgs, masks, key) in enumerate(
                pipe.epoch(e_i, augmented=False)):
            if per_sample:
                centre = other = jnp.zeros((2,), jnp.int32)
                labels = jnp.zeros((), jnp.int32)
            else:
                rng = np.random.default_rng(np.random.SeedSequence(
                    [config.seed, e_i, b_i]))
                c, o, lab = set_fn(rng, config.input_sz, patch_side)
                centre, other = jnp.asarray(c), jnp.asarray(o)
                labels = jnp.asarray(lab, jnp.int32)
            state, loss = train_step(state, imgs, masks, key,
                                     centre, other, labels)
            loss = float(loss)
            if not np.isfinite(loss):
                _log(f"Loss is NaN/inf ({loss}). Exiting.")
                sys.exit(1)
            avg_loss += loss
            count += 1
            if config.test_code and b_i >= 1:
                break
        history["epoch_loss"].append(avg_loss / count)

        stats = kmeans_segmentation_eval(
            make_features_fn(state), map_assign, config.gt_k,
            **kmeans_kwargs)
        acc = stats["acc"]
        is_best = acc > max(history["epoch_acc"])
        history["epoch_acc"].append(acc)
        _log(f"Epoch {e_i}: kmeans acc {acc:.6f} "
             f"loss {avg_loss / count:.5f}")
        if e_i % config.save_freq == 0 or e_i == config.num_epochs - 1:
            ckpt.save_checkpoint(config, state, history, "latest",
                                 last_epoch=e_i)
            last_saved = e_i
        if is_best:
            ckpt.save_checkpoint(config, state, history, "best",
                                 last_epoch=last_saved)
        if getattr(config, "save_multiple", False) and e_i % 3 == 0:
            # extra numbered snapshots (reference doersch.py:362-364)
            ckpt.save_checkpoint(config, state, history, f"e_{e_i}",
                                 last_epoch=e_i)
        # config.pickle/txt every epoch (reference :449-455); last_epoch
        # stays pinned to the epoch of the on-disk latest weights
        ckpt.save_meta(config, history, last_saved)
        if config.test_code:
            break

    ckpt.wait_for_orbax()  # commit any in-flight async save
    return state, history
