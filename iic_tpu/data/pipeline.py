"""TPU-native input pipelines for clustering.

The reference builds ``1 + num_dataloaders`` epoch-aligned torch DataLoaders
over the same deterministic sequential order, zips them, and assembles each
training batch from one tf1 sub-batch repeated ``num_dataloaders`` times
paired with independent tf2 draws (code/utils/cluster/data.py:259-339,
code/scripts/cluster/cluster_sobel_twohead.py:286-315). Here the raw uint8
images ship to HBM once; a single jittable ``augment_pair`` function applies
tf1 once and tf2 ``num_dataloaders`` times on device — the same pairing
distribution with zero host-side augmentation.

Keys derive from (seed, epoch, batch) via fold_in: restart-reproducible.

Train batches: the pipeline yields (base_uint8, key) and exposes
``augment_pair`` so the training step can fuse augmentation into its jit.
Mapping (eval) loaders yield already-transformed tf3 batches + labels.
"""

import numpy as np
import jax
import jax.numpy as jnp

from iic_tpu.data import readers
from iic_tpu.data.transforms import (
    make_greyscale_pair_transforms, make_sobel_pair_transforms)


def _is_greyscale(config):
    if getattr(config, "greyscale", False):
        return True
    if config.dataset in ("MNIST",) or config.dataset.startswith("Digits"):
        return True
    if config.dataset.startswith("Synthetic"):
        # Synthetic<K>x<SZ>x<C>[x<N>]: channels is the third field
        return config.dataset[len("Synthetic"):].split("x")[2] == "1"
    return False


def _load_partitions(config, partitions):
    parts = []
    lazy = getattr(config, "lazy_images", False)
    for p in partitions:
        d = readers.load_dataset(config.dataset, config.dataset_root, p,
                                 lazy=lazy)
        imgs, labels = d["images"], d["labels"]
        if (config.dataset == "STL10" and p == "train+unlabeled"
                and getattr(config, "mix_train", False)):
            # train-part size from the labels (the unlabeled part is -1):
            # 5000 on the real STL10, so identical behaviour there, while
            # synthetic-format fixtures of any size also work
            n_train = int((labels >= 0).sum())
            ids = readers.reorder_train_deterministic_ids(
                n_train=n_train, per=(len(imgs) - n_train) // n_train)
            # .select keeps a lazy array lazy (plain fancy-indexing would
            # materialise the whole 105k-image mix)
            imgs = (imgs.select(ids) if hasattr(imgs, "select")
                    else imgs[ids])
            labels = labels[ids]
        parts.append((imgs, labels))
    if len(parts) == 1:  # keeps a lazy array lazy
        return parts[0]
    labels = np.concatenate([p[1] for p in parts])
    if lazy and all(hasattr(p[0], "select") for p in parts):
        # lazy concat: LazyBinaryArray composes over lazy parts (each part
        # materialises its own items; identity layout transform)
        first = parts[0][0]
        return readers.LazyBinaryArray(
            [p[0] for p in parts], lambda x: x, first.shape[1:]), labels
    images = np.concatenate([np.asarray(p[0]) for p in parts])
    return images, labels


class ClusterTrainPipeline:
    """One object replaces the reference's list of parallel dataloaders."""

    def __init__(self, config, partitions, seed=0, drop_last=False,
                 deterministic_shuffle=False, process_shard=None,
                 preloaded=None, resident=False, resident_share=None):
        self.config = config
        # Multi-host: every process computes the same global batch order but
        # loads/uploads only its contiguous sub-block; the trainer assembles
        # the global array with parallel.make_global_batch. process_shard =
        # (process_index, process_count), default from the jax runtime.
        self.process_shard = process_shard
        # preloaded=(images, labels) shares decoded arrays between
        # pipelines over the same partitions (no re-decode, no extra copy)
        self._preloaded = preloaded
        self.num_dataloaders = config.num_dataloaders
        self.dataloader_batch_sz = config.batch_sz // config.num_dataloaders
        self.seed = seed
        self.drop_last = drop_last
        # DeterministicRandomSampler semantics (reference
        # data.py:590-601): a seeded random-but-fixed visiting order,
        # identical across the parallel loaders so pairs stay aligned.
        # Ours derives the epoch's permutation from (seed, epoch), which is
        # additionally restart-reproducible.
        self.deterministic_shuffle = deterministic_shuffle
        self.images, self.labels = (
            preloaded if preloaded is not None
            else _load_partitions(config, partitions))
        rounder = np.floor if drop_last else np.ceil
        self.num_batches = max(int(rounder(
            len(self.images) / self.dataloader_batch_sz)), 1)

        grey = _is_greyscale(config)
        if grey:
            tf1, tf2, _ = make_greyscale_pair_transforms(config)
        else:
            tf1, tf2, _ = make_sobel_pair_transforms(config)
        r = self.num_dataloaders

        def augment_pair(imgs_u8, key):
            """(b, H, W, C) uint8 + key -> (b*r, C', sz, sz) float32 pair,
            NCHW. tf1 drawn once per image and tiled r times; tf2 drawn r
            times independently (reference pairing semantics)."""
            imgs = imgs_u8.astype(jnp.float32) / 255.0
            b = imgs.shape[0]
            k1, k2 = jax.random.split(key)
            tf1_keys = jax.random.split(k1, b)
            base = jax.vmap(tf1)(imgs, tf1_keys)  # (b, sz, sz, C')
            all_imgs = jnp.tile(base, (r, 1, 1, 1))
            tf2_keys = jax.random.split(k2, b * r)
            tiled = jnp.tile(imgs, (r, 1, 1, 1))
            all_imgs_tf = jax.vmap(tf2)(tiled, tf2_keys)
            # NCHW for the model/public API
            return (jnp.transpose(all_imgs, (0, 3, 1, 2)),
                    jnp.transpose(all_imgs_tf, (0, 3, 1, 2)))

        # resident mode (--resident_data): the raw uint8 set lives in HBM;
        # epoch yields index batches and augment_pair gathers on device —
        # zero per-step host->device traffic (MNIST 45 MB, CIFAR 180 MB,
        # STL10 train+unlabeled 2.9 GB all fit a 16 GB chip). Staging is
        # LAZY (first augment trace) so tools that build pipelines only
        # for mapping loaders or partition tables pay nothing, and
        # ``resident_share`` lets a sibling pipeline over the same images
        # reuse one staged copy (the twohead factory passes it).
        self.resident = resident
        self._res_imgs = None
        self._res_share = resident_share
        if resident:
            pc = (process_shard or
                  (jax.process_index(), jax.process_count()))[1]
            assert pc == 1, "resident mode is single-process"
            base_augment_pair = augment_pair

            def augment_pair(idxs, key):  # noqa: F811 — resident variant
                # staging must happen eagerly (epoch()/stage()), never
                # inside this trace — a device_put under trace would leak
                # a tracer into the cache
                assert self._res_imgs is not None, (
                    "resident pipeline not staged: iterate epoch() or "
                    "call stage() before tracing augment_pair")
                return base_augment_pair(
                    jnp.take(self._res_imgs, idxs, axis=0), key)

        self.augment_pair = augment_pair
        self._augment_jit = jax.jit(augment_pair)

    def stage(self):
        """Eagerly upload the uint8 image set to HBM (resident mode; no-op
        otherwise). Shared with ``resident_share`` siblings over the same
        host array. Called automatically by ``epoch`` /
        ``epoch_scan_inputs``; call directly when using ``augment_pair``
        without iterating."""
        if self.resident and self._res_imgs is None:
            share = self._res_share
            if share is not None and share.images is self.images:
                self._res_imgs = share.stage()
            else:
                self._res_imgs = jax.device_put(
                    np.ascontiguousarray(self.images))
        return self._res_imgs

    def _epoch_order_root(self, epoch_idx):
        """(visiting order | None for sequential, root PRNG key) for one
        epoch — the single source of truth shared by ``epoch()`` and
        ``epoch_scan_inputs`` so their loss sequences stay identical."""
        root = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch_idx)
        order = (np.random.default_rng(np.random.SeedSequence(
            [self.seed, epoch_idx])).permutation(len(self.images))
            if self.deterministic_shuffle else None)
        return order, root

    def epoch(self, epoch_idx, augmented=True, prefetch="auto"):
        """Deterministic sequential batches. ``augmented=False`` yields
        (base_uint8 device array, key) for fusion into a train step;
        otherwise yields the augmented pair.

        One-deep prefetch: batch i+1's host->device copy is issued
        (asynchronously) before batch i is yielded, overlapping upload with
        the consumer's step (SURVEY.md §7 hard part #6).

        ``prefetch``: ``"auto"`` (default) moves the generator onto a
        ThreadedPrefetch thread when the image store is a decode-on-demand
        LazyImageArray, so per-batch decode overlaps the consumer's step
        even for consumers that don't wrap it in ``host_prefetch_iter``
        themselves. ``False`` returns the raw generator — the trainers
        pass this so ``--prefetch_depth`` / ``--no_host_prefetch`` stay in
        control of the one prefetch thread."""
        gen = self._epoch_gen(epoch_idx, augmented)
        if prefetch == "auto" and isinstance(self.images,
                                             readers.LazyImageArray):
            from iic_tpu.data.prefetch import ThreadedPrefetch
            return ThreadedPrefetch(gen, depth=2)
        return gen

    def _epoch_gen(self, epoch_idx, augmented):
        bsz = self.dataloader_batch_sz
        n = len(self.images)
        self.stage()
        order, root = self._epoch_order_root(epoch_idx)
        pi, pc = self.process_shard or (
            jax.process_index(), jax.process_count())
        if pc > 1:
            assert bsz % pc == 0, (bsz, pc)
            assert not augmented, "multi-host yields host-local shards"
        pending = None
        for b_i in range(self.num_batches):
            lo, hi = b_i * bsz, (b_i + 1) * bsz
            if pc > 1:
                # A ragged final batch would give unequal per-process
                # shards: PAD the global batch to bsz by repeating its
                # last sample and carry per-sample weights (0 on the
                # padding) — the trainers run the weighted step, whose
                # joint masks the padding out exactly (reference slices
                # partial batches; sample counts match it exactly).
                gidx = (np.arange(lo, hi) if order is None
                        else np.asarray(order[lo:min(hi, n)]))
                gidx = np.minimum(gidx, n - 1)
                m = min(hi, n) - lo  # valid count
                if m < bsz:
                    gidx = np.concatenate(
                        [gidx[:m], np.full(bsz - m, gidx[m - 1])])
                weights = np.ones(bsz, np.float32)
                weights[m:] = 0.0
                shard = bsz // pc
                sl = slice(pi * shard, (pi + 1) * shard)
                batch = self.images[gidx[sl]]
                key = jax.random.fold_in(root, b_i)
                # host-local numpy shard; the trainer builds the global
                # array over the multi-host mesh (make_global_batch)
                if pending is not None:
                    yield pending
                pending = ((batch, weights[sl]), key)
                continue
            if self.resident:
                batch = (np.arange(lo, min(hi, n), dtype=np.int32)
                         if order is None
                         else order[lo:hi].astype(np.int32))
            elif order is None:
                batch = self.images[lo:hi]
            else:
                batch = self.images[order[lo:hi]]
            key = jax.random.fold_in(root, b_i)
            batch_dev = jax.device_put(batch)  # async upload
            if pending is not None:
                yield pending
            pending = ((self._augment_jit(batch_dev, key)) if augmented
                       else (batch_dev, key))
        if pending is not None:
            yield pending

    def epoch_scan_inputs(self, epoch_idx):
        """(idx_matrix (nb, bsz) int32 device array, root_key) for the
        whole-epoch fused runner (``make_cluster_train_step(...,
        epoch_scan=True)``). Resident mode only. Per-step keys inside the
        scan are fold_in(root_key, b_i) — identical to ``epoch()`` — so the
        loss sequence matches the per-step path exactly. A ragged final
        batch is dropped (use the per-step path for exact sample counts)."""
        assert self.resident, "epoch_scan_inputs needs resident mode"
        self.stage()
        bsz = self.dataloader_batch_sz
        n = len(self.images)
        nb = max(n // bsz, 1)
        assert n >= bsz, (n, bsz)
        order, root = self._epoch_order_root(epoch_idx)
        if order is None:
            order = np.arange(n)
        mat = order[:nb * bsz].reshape(nb, bsz).astype(np.int32)
        return jax.device_put(mat), root

    def __len__(self):
        return self.num_batches


class MappingLoader:
    """tf3 (deterministic) eval loader: yields (imgs NCHW float32, labels).
    Mirrors ``_create_mapping_loader`` (code/utils/cluster/data.py:342-390).
    ``truncate_pc`` keeps a random fixed fraction of the set — the
    reference's TruncatedDataset used by the fewer-labels analysis
    (code/datasets/clustering/truncated_dataset.py:5-20)."""

    def __init__(self, config, partitions, batch_sz=None,
                 truncate_pc=None, truncate_seed=0, preloaded=None):
        self.config = config
        self.batch_sz = batch_sz or config.batch_sz
        self.images, self.labels = (
            preloaded if preloaded is not None
            else _load_partitions(config, partitions))
        if truncate_pc is not None:
            n = int(len(self.images) * truncate_pc)
            rng = np.random.default_rng(truncate_seed)
            idx = rng.permutation(len(self.images))[:n]
            self.images = (self.images.select(idx)  # stays decode-on-demand
                           if hasattr(self.images, "select")
                           else self.images[idx])
            self.labels = self.labels[idx]

        if _is_greyscale(config):
            _, _, tf3 = make_greyscale_pair_transforms(config)
        else:
            _, _, tf3 = make_sobel_pair_transforms(config)

        def transform(imgs_u8):
            imgs = imgs_u8.astype(jnp.float32) / 255.0
            out = jax.vmap(tf3)(imgs)
            return jnp.transpose(out, (0, 3, 1, 2))

        self._transform_jit = jax.jit(transform)

    def _batches(self):
        bsz = self.batch_sz
        n = len(self.images)
        for start in range(0, n, bsz):
            imgs = self.images[start:start + bsz]
            labels = self.labels[start:start + bsz]
            yield self._transform_jit(jnp.asarray(imgs)), labels

    def __iter__(self):
        # background-thread prefetch: the synchronous host part of the
        # upload for batch i+1/i+2 overlaps the consumer blocking on
        # batch i's outputs
        from iic_tpu.data.prefetch import ThreadedPrefetch
        return iter(ThreadedPrefetch(self._batches(), depth=2))

    def __len__(self):
        return int(np.ceil(len(self.images) / self.batch_sz))


def _twohead_partitions(config):
    """Partition tables (code/utils/cluster/data.py:18-75)."""
    ds = config.dataset
    if ("CIFAR" in ds or ds == "MNIST" or ds.startswith("Digits")
            or ds.startswith("Synthetic")):
        train_a = [True, False]
        train_b = train_a
        mapping_assign = [True, False]
        mapping_test = [True, False]
    elif ds == "STL10":
        assert config.mix_train
        if not getattr(config, "stl_leave_out_unlabelled", False):
            train_a = ["train+unlabeled", "test"]
        else:
            train_a = ["train", "test"]
        train_b = ["train", "test"]
        mapping_assign = ["train", "test"]
        mapping_test = ["train", "test"]
    else:
        raise ValueError(ds)
    return train_a, train_b, mapping_assign, mapping_test


def cluster_twohead_create_dataloaders(config, seed=0, drop_last=False):
    """Mirror of ``cluster_twohead_create_dataloaders``
    (code/utils/cluster/data.py:18-101). Returns
    (train_pipeline_head_A, train_pipeline_head_B,
     mapping_assignment_loader, mapping_test_loader)."""
    assert config.mode == "IID"
    train_a, train_b, map_a, map_t = _twohead_partitions(config)
    config.train_partitions_head_A = train_a
    config.train_partitions_head_B = train_b
    config.mapping_assignment_partitions = map_a
    config.mapping_test_partitions = map_t
    resident = getattr(config, "resident_data", False)
    pipe_a = ClusterTrainPipeline(config, train_a, seed=seed,
                                  drop_last=drop_last, resident=resident)
    # heads share decoded arrays (and the one staged HBM copy in resident
    # mode) whenever their partitions coincide — always, except STL10
    # head A's train+unlabeled mix
    share = train_a == train_b
    pipe_b = ClusterTrainPipeline(
        config, train_b, seed=seed + 1, drop_last=drop_last,
        resident=resident,
        preloaded=(pipe_a.images, pipe_a.labels) if share else None,
        resident_share=pipe_a if share else None)
    map_assign = MappingLoader(config, map_a)
    map_test = MappingLoader(
        config, map_t,
        preloaded=((map_assign.images, map_assign.labels)
                   if map_a == map_t else None))
    return pipe_a, pipe_b, map_assign, map_test


def create_basic_clustering_dataloaders(config, seed=0):
    """The README-advertised one-function public API (reference
    ``create_basic_clustering_dataloaders``, code/utils/cluster/
    data.py:502-601): user images in class-per-subfolder layout under
    ``config.dataset_root/train`` (ImageFolder convention), visited in a
    seeded deterministic random order (DeterministicRandomSampler parity),
    same data for both heads. Labelled mapping loaders are built from
    ``dataset_root/none`` only when that directory exists, exactly like the
    reference's ``os.path.exists(test_data_path)`` gate (data.py:566-585).
    ``config.greyscale`` selects the greyscale transform family (the
    reference hardcodes ``greyscale = False`` as a user-editable line).

    Non-ImageFolder dataset names fall back to the built-in twohead factory
    over the packaged readers.

    Returns (train_pipeline_head_A, train_pipeline_head_B,
             mapping_assignment_loader, mapping_test_loader)."""
    import os

    if config.dataset != "ImageFolder":
        return cluster_twohead_create_dataloaders(config, seed=seed)

    assert config.batchnorm_track  # recommended, as in the reference
    train = ["train"]
    config.train_partitions_head_A = train
    config.train_partitions_head_B = train
    pipe_a = ClusterTrainPipeline(config, train, seed=seed,
                                  deterministic_shuffle=True)
    # head B sees the same data/order — share the decoded arrays
    pipe_b = ClusterTrainPipeline(
        config, train, seed=seed, deterministic_shuffle=True,
        preloaded=(pipe_a.images, pipe_a.labels))

    map_assign = map_test = None
    if os.path.isdir(os.path.join(config.dataset_root, "none")):
        config.mapping_assignment_partitions = ["none"]
        config.mapping_test_partitions = ["none"]
        map_assign = MappingLoader(config, ["none"])
        map_test = MappingLoader(config, ["none"],
                                 preloaded=(map_assign.images,
                                            map_assign.labels))
    return pipe_a, pipe_b, map_assign, map_test


def cluster_create_dataloaders(config, seed=0, drop_last=False):
    """Mirror of ``cluster_create_dataloaders`` (data.py:106-178): IID+
    single-head with train/test split. Returns
    (train_pipeline, mapping_assignment_loader, mapping_test_loader)."""
    assert config.mode == "IID+"
    ds = config.dataset
    if ("CIFAR" in ds or ds == "MNIST" or ds.startswith("Digits")
            or ds.startswith("Synthetic")):
        train = [True]
        map_a = [True]
        map_t = [False]
    elif ds == "STL10":
        train = ["train+unlabeled"]
        map_a = ["train"]
        map_t = ["test"]
    else:
        raise ValueError(ds)
    config.train_partitions = train
    config.mapping_assignment_partitions = map_a
    config.mapping_test_partitions = map_t
    return (ClusterTrainPipeline(config, train, seed=seed,
                                 drop_last=drop_last,
                                 resident=getattr(config, "resident_data",
                                                  False)),
            MappingLoader(config, map_a),
            MappingLoader(config, map_t))
