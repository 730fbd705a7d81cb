"""Segmentation input pipeline.

The reference does the entire paired augmentation per-image on GPU inside
``__getitem__`` with num_workers forced to 0 (SURVEY.md §5.2). Here the
host does only the variable-shape geometry (decode, prescale, random scale,
crop — see seg_datasets), and one jitted batched program does the rest on
device: colour jitter of img2, grey/sobel channel prep, random RSS affine
of img2 (recording affine2_to_1), random flip (negating the top affine row
— reference cocostuff.py:203-216), producing the training 4-tuple
(img1, img2, affine2_to_1, mask) the loss consumes.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from iic_tpu.data.seg_datasets import build_seg_dataset
from iic_tpu.data.seg_transforms import seg_random_affine
from iic_tpu.data.transforms import append_grey, color_jitter


def make_seg_augment(config):
    """Batched jittable device augmentation:
    (b, sz, sz, C_raw) uint8 + key -> (img1, img2, affine2_to_1) with imgs
    NCHW float32. C_raw = 3 (rgb) or 4 (rgb + ir, Potsdam)."""
    using_ir = config.using_IR
    sobel = config.sobel
    include_rgb = config.include_rgb
    flip_p = config.flip_p
    use_random_affine = getattr(config, "use_random_affine", False)
    aff = dict(
        min_rot=getattr(config, "aff_min_rot", -30.0),
        max_rot=getattr(config, "aff_max_rot", 30.0),
        min_shear=getattr(config, "aff_min_shear", -10.0),
        max_shear=getattr(config, "aff_max_shear", 10.0),
        min_scale=getattr(config, "aff_min_scale", 0.8),
        max_scale=getattr(config, "aff_max_scale", 1.2))
    jb = config.jitter_brightness
    jc = config.jitter_contrast
    js = config.jitter_saturation
    jh = config.jitter_hue

    def one(img_u8, key):
        img = img_u8.astype(jnp.float32) / 255.0
        if using_ir:
            rgb, ir = img[..., :3], img[..., 3:4]
        else:
            rgb, ir = img, None
        ks = jax.random.split(key, 4)
        img1 = rgb
        img2 = color_jitter(rgb, ks[0], brightness=jb, contrast=jc,
                            saturation=js, hue=jh)
        if sobel:
            img1 = append_grey(img1, include_rgb)
            img2 = append_grey(img2, include_rgb)
        elif not include_rgb:
            from iic_tpu.data.transforms import to_grey
            img1, img2 = to_grey(img1), to_grey(img2)
        if ir is not None:
            img1 = jnp.concatenate([img1, ir], axis=-1)
            img2 = jnp.concatenate([img2, ir], axis=-1)

        img1 = jnp.transpose(img1, (2, 0, 1))
        img2 = jnp.transpose(img2, (2, 0, 1))

        if use_random_affine:
            img2, aff2to1 = seg_random_affine(img2, ks[1], **aff)
        else:
            aff2to1 = jnp.array([[1.0, 0, 0], [0, 1.0, 0]], jnp.float32)

        # reference flips when rand() > flip_p (cocostuff.py:212)
        do_flip = jax.random.uniform(ks[2]) > flip_p
        img2 = jnp.where(do_flip, img2[:, :, ::-1], img2)
        aff2to1 = jnp.where(
            do_flip, aff2to1 * jnp.array([[-1.0], [1.0]]), aff2to1)
        return img1, img2, aff2to1

    def augment(imgs_u8, masks_u8, key):
        b = imgs_u8.shape[0]
        keys = jax.random.split(key, b)
        img1, img2, aff2to1 = jax.vmap(one)(imgs_u8, keys)
        return img1, img2, aff2to1, masks_u8.astype(jnp.float32)

    return augment


class SegTrainPipeline:
    """Yields (imgs_u8, masks_u8, key) host-prepped batches + exposes
    ``augment`` for fusion into the train step. Replaces the reference's
    paired seg dataloaders (code/utils/segmentation/data.py:85-126);
    shuffles per epoch when num_dataloaders == 1 (the reference's
    ``do_shuffle``), keeps deterministic sequential order otherwise.

    num_dataloaders = r > 1 reproduces the reference's r-parallel-loader
    pairing (segmentation_twohead.py:262-303): each training batch is the
    same ``dataloader_batch_sz`` base images repeated r times, every repeat
    with an independent geometry/augmentation draw, for a total of
    ``batch_sz`` pairs per step.

    ``use_native=True`` (default: auto) routes the per-sample host geometry
    (scale / pad+crop / label remap+mask) through the threaded C++ library
    (iic_tpu/native/seg_prep.cpp) instead of the per-sample numpy path —
    same random draws, same coordinate conventions.

    ``resident=True`` stages the whole dataset in HBM once (uint8 images +
    pointwise-filtered relevancy masks, centre-padded to >= input_sz) and
    moves the per-draw random crop on device: ``epoch`` then yields
    (idx_batch, idx_batch, key) and ``self.augment`` gathers + crops +
    augments inside the fused train step — zero per-step host work or
    host->device traffic. Requires uniform raw shapes, no random scale
    (``pre_scale_all`` is applied once at staging), single process. The
    crop-start distribution is identical to the host path's
    ``pad_and_or_crop(mode="random")`` (uniform over [0, H - sz]); only the
    RNG stream differs. Uniform raw shapes restrict it to fixed-tile
    datasets (Potsdam 200^2 tiles ~ 500 MB, synthetic sets); real COCO's
    variable image sizes need the streaming host path. Staging is LAZY
    (first epoch/augment use), so tools that build the pipeline only for
    its partition tables pay nothing."""

    def __init__(self, config, partitions, seed=0, use_native=None,
                 drop_last=False, process_shard=None, resident=False,
                 use_fast_host=True):
        self.config = config
        self.seed = seed
        # (process_index, process_count) — multi-host input sharding; every
        # process computes the same global order/draws but preps only its
        # contiguous sub-block of each batch (see ClusterTrainPipeline).
        self.process_shard = process_shard
        self.datasets = [build_seg_dataset(config, p, "train")
                         for p in partitions]
        self.lengths = [len(d) for d in self.datasets]
        self.total = sum(self.lengths)
        self.batch_sz = config.dataloader_batch_sz
        self.drop_last = drop_last
        rounder = np.floor if drop_last else np.ceil
        self.num_batches = max(int(rounder(self.total / self.batch_sz)), 1)
        self.shuffle = config.num_dataloaders == 1
        self.augment = make_seg_augment(config)
        self.resident = resident
        self._staged = False
        self._resident_augment = None
        if resident:
            pc = (process_shard or
                  (jax.process_index(), jax.process_count()))[1]
            assert pc == 1, "resident mode is single-process"
            self._base_augment = self.augment

            def resident_augment_dispatch(idxs, idxs2, key):
                # staging must happen eagerly (epoch()/stage()), never
                # inside this trace — a device_put under trace would leak
                # a tracer into the cache
                assert self._staged, (
                    "resident pipeline not staged: iterate epoch() or "
                    "call stage() before tracing augment")
                return self._resident_augment(idxs, idxs2, key)

            self.augment = resident_augment_dispatch
        self._augment_jit = jax.jit(self.augment)

        self._native = None
        # batched numpy fast path (see _numpy_batch); tests disable it to
        # lock its parity with the per-sample path
        self._fast_host = use_fast_host
        # raw-frame relevancy-mask cache for the fast path (uint8 per
        # image; ~10 MB at Potsdam/bench tile scale, budget-gated so
        # COCO-scale sets degrade to recompute instead of filling RAM)
        self._mask_cache = {}
        self._mask_cache_bytes = 0
        self._mask_cache_budget = int(os.environ.get(
            "IIC_TPU_MASK_CACHE_BYTES", 256 * 1024 * 1024))
        # auto mode enables the native path only on multi-core hosts: its
        # win is thread-level parallelism across samples; single-threaded,
        # cv2's SIMD resize in the numpy path is faster (measured).
        if use_native is None:
            use_native_now = (os.cpu_count() or 1) >= 4
        else:
            use_native_now = use_native
        if use_native_now:
            from iic_tpu.native import load_seg_prep
            self._native = load_seg_prep()
            if use_native and self._native is None:
                raise RuntimeError("native seg_prep unavailable")

    def stage(self):
        """Eagerly decode + upload the dataset (resident mode; no-op
        otherwise). Called automatically by ``epoch`` /
        ``epoch_scan_inputs``; call directly when using ``augment``
        without iterating."""
        if self.resident and not self._staged:
            self._stage_resident()
            self._staged = True

    def _stage_resident(self):
        """Upload the whole dataset to HBM once and install the resident
        augment (gather + random-crop on device before the standard
        augmentation). Masks are the pointwise label filter of the
        zero-padded label map — identical to the host path, which filters
        after padding/cropping."""
        cfg = self.config
        assert not getattr(cfg, "use_random_scale", False), (
            "resident mode does per-draw geometry on device with static "
            "shapes; random rescale needs the host path")
        sz = cfg.input_sz
        from iic_tpu.data.seg_transforms import pad_if_too_small
        imgs, masks = [], []
        for d in self.datasets:
            for i in range(len(d)):
                img, label = d._load_raw(i)
                if getattr(cfg, "pre_scale_all", False):
                    import cv2
                    from iic_tpu.data.seg_datasets import _resize_pair
                    img, label = _resize_pair(
                        img.astype(np.float32), label,
                        cfg.pre_scale_factor, cv2)
                img = pad_if_too_small(np.asarray(img), sz)
                if label is not None:
                    label = pad_if_too_small(np.asarray(label), sz)
                    _, mask = d._filter_label(label)
                else:
                    mask = np.ones(img.shape[:2], bool)
                imgs.append(img.astype(np.uint8))
                masks.append(mask.astype(np.uint8))
        shapes = {im.shape for im in imgs}
        assert len(shapes) == 1, (
            f"resident mode needs uniform raw shapes, got {shapes}; "
            "use pre_scale_all or the host path")
        res_imgs = jax.device_put(np.stack(imgs))
        res_masks = jax.device_put(np.stack(masks))
        h, w = res_imgs.shape[1:3]
        base_augment = self._base_augment

        def resident_augment(idxs, _idxs_unused, key):
            k_crop, k_aug = jax.random.split(key)
            b_imgs = jnp.take(res_imgs, idxs, axis=0)
            b_masks = jnp.take(res_masks, idxs, axis=0)
            starts = jax.random.randint(
                k_crop, (idxs.shape[0], 2), 0,
                jnp.array([h - sz + 1, w - sz + 1]))

            def crop(im, m, s):
                im_c = jax.lax.dynamic_slice(
                    im, (s[0], s[1], 0), (sz, sz, im.shape[2]))
                m_c = jax.lax.dynamic_slice(m, (s[0], s[1]), (sz, sz))
                return im_c, m_c

            b_imgs, b_masks = jax.vmap(crop)(b_imgs, b_masks, starts)
            return base_augment(b_imgs, b_masks, k_aug)

        self._resident_augment = resident_augment

    def _locate(self, global_idx):
        for d, n in zip(self.datasets, self.lengths):
            if global_idx < n:
                return d, global_idx
            global_idx -= n
        raise IndexError

    def _sample(self, global_idx, rng):
        d, i = self._locate(global_idx)
        return d.get_train(i, rng)

    def _numpy_batch(self, idxs, rng):
        """Host prep for one batch on the numpy path. Uses a BATCHED fast
        path when no rescale is active, the batch's raw shapes are uniform
        and >= input_sz, and the label filter has table form: the random
        crop centres are drawn per sample in exactly the order
        ``pad_and_or_crop(mode="random")`` draws them (2 ``rng.integers``
        calls each — identical rng stream, identical batches), then the
        pixel work is b memcpy crops + one table lookup instead of ~10
        Python/numpy ops per sample (measured 57 -> ~5 ms/batch at the
        bench shape on the 1-CPU host). Falls back to per-sample
        ``get_train`` otherwise."""
        cfg = self.config
        sz = cfg.input_sz
        use_fast = (self._fast_host
                    and not getattr(cfg, "pre_scale_all", False)
                    and not getattr(cfg, "use_random_scale", False))
        if use_fast:
            located = [self._locate(int(i)) for i in idxs]
            raws = [d._load_raw(i) for d, i in located]
            shapes = {r[0].shape for r in raws}
            h, w = raws[0][0].shape[:2]
            have_labels = all(r[1] is not None for r in raws)
            table = located[0][0].label_filter_table()
            tables_ok = (not have_labels) or (
                table is not None and all(
                    np.array_equal(d.label_filter_table(), table)
                    for d, _ in located[1:]))
            use_fast = (len(shapes) == 1 and h >= sz and w >= sz
                        and tables_ok)
        if not use_fast:
            samples = [self._sample(int(i), rng) for i in idxs]
            return (np.stack([s[0] for s in samples]),
                    np.stack([s[1] for s in samples]))

        b = len(idxs)
        half = sz // 2
        if sz % 2 == 1:
            h_c_max, w_c_max = h - 1 - half, w - 1 - half
        else:
            h_c_max, w_c_max = h - half, w - half
        starts = np.empty((b, 2), np.int64)
        for j in range(b):  # same 2 draws/sample as pad_and_or_crop
            starts[j, 0] = int(rng.integers(half, h_c_max + 1)) - half
            starts[j, 1] = int(rng.integers(half, w_c_max + 1)) - half
        c = raws[0][0].shape[2] if raws[0][0].ndim == 3 else 1
        imgs = np.empty((b, sz, sz, c), np.uint8)
        for j, (img, _) in enumerate(raws):
            y, x = starts[j]
            imgs[j] = img[y:y + sz, x:x + sz].reshape(sz, sz, c)
        if have_labels:
            # The raw-frame relevancy mask keep[lab+1] is static per
            # image; cache it (uint8, budget-gated) so the per-batch
            # mask work is a memcpy crop like the image crop instead of
            # a 2M-element table lookup per batch (13 -> ~3 ms/batch on
            # the 1-CPU bench host; table-lookup-per-crop and
            # crop-of-cached-mask commute, so batches are identical).
            keep = (table >= 0).astype(np.uint8)
            masks = np.empty((b, sz, sz), np.uint8)
            for j, ((_, lab), (d, i)) in enumerate(zip(raws, located)):
                ck = (id(d), int(i))
                m_raw = self._mask_cache.get(ck)
                if m_raw is None:
                    m_raw = keep[lab + 1]
                    if (self._mask_cache_bytes + m_raw.nbytes
                            <= self._mask_cache_budget):
                        self._mask_cache[ck] = m_raw
                        self._mask_cache_bytes += m_raw.nbytes
                y, x = starts[j]
                masks[j] = m_raw[y:y + sz, x:x + sz]
        else:
            masks = np.ones((b, sz, sz), np.uint8)
        return imgs, masks

    def _draw_geometry(self, dataset, img_shape, rng):
        """Replicate get_train's random draws: (combined scale, crop
        centre in the scaled+padded frame)."""
        cfg = self.config
        scale = 1.0
        if getattr(cfg, "pre_scale_all", False):
            scale *= cfg.pre_scale_factor
        if getattr(cfg, "use_random_scale", False):
            scale *= (rng.random() * (cfg.scale_max - cfg.scale_min)
                      + cfg.scale_min)
        h, w = img_shape[:2]
        sh = max(int(round(h * scale)), 1) if scale != 1.0 else h
        sw = max(int(round(w * scale)), 1) if scale != 1.0 else w
        sz = cfg.input_sz
        ph, pw = max(sh, sz), max(sw, sz)
        h_c_min = w_c_min = int(sz / 2.0)
        if sz % 2 == 1:
            h_c_max, w_c_max = ph - 1 - sz // 2, pw - 1 - sz // 2
        else:
            h_c_max, w_c_max = ph - sz // 2, pw - sz // 2
        h_c = int(rng.integers(h_c_min, h_c_max + 1))
        w_c = int(rng.integers(w_c_min, w_c_max + 1))
        return scale, h_c, w_c

    def _native_batch(self, idxs, rng):
        import ctypes

        cfg = self.config
        sz = cfg.input_sz
        b = len(idxs)
        raws = []
        for gi in idxs:
            d, i = self._locate(int(gi))
            img, label = d._load_raw(i)
            table = d.label_filter_table()
            raws.append((np.ascontiguousarray(img),
                         None if table is None else
                         np.ascontiguousarray(label.astype(np.int32))
                         if label is not None else None,
                         table))

        channels = raws[0][0].shape[2]
        heights = np.array([r[0].shape[0] for r in raws], np.int32)
        widths = np.array([r[0].shape[1] for r in raws], np.int32)
        scales = np.empty(b, np.float32)
        h_cs = np.empty(b, np.int32)
        w_cs = np.empty(b, np.int32)
        for j, r in enumerate(raws):
            s, h_c, w_c = self._draw_geometry(None, r[0].shape, rng)
            scales[j], h_cs[j], w_cs[j] = s, h_c, w_c

        table = raws[0][2]
        have_labels = table is not None and all(
            r[1] is not None for r in raws)
        if table is None:
            table = np.zeros(1, np.int32)

        img_ptrs = (ctypes.c_void_p * b)(
            *[r[0].ctypes.data for r in raws])
        if have_labels:
            lab_ptrs = (ctypes.c_void_p * b)(
                *[r[1].ctypes.data for r in raws])
        else:
            lab_ptrs = None

        imgs_out = np.empty((b, sz, sz, channels), np.uint8)
        masks_out = np.empty((b, sz, sz), np.uint8)
        ret = self._native.seg_prepare_batch(
            img_ptrs, lab_ptrs,
            heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            channels, b,
            scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h_cs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            w_cs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sz,
            table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(table),
            imgs_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            masks_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            os.cpu_count() or 1)
        assert ret == 0
        return imgs_out, masks_out

    def _epoch_order_root(self, epoch_idx):
        """(visiting order, root PRNG key, order rng) for one epoch — the
        single source of truth shared by ``epoch()`` and
        ``epoch_scan_inputs`` so their loss sequences stay identical. The
        returned rng continues from the permutation draw (the host
        geometry rng when single-process)."""
        order_rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch_idx]))
        order = (order_rng.permutation(self.total) if self.shuffle
                 else np.arange(self.total))
        root = jax.random.fold_in(
            jax.random.PRNGKey(self.seed + 7919), epoch_idx)
        return order, root, order_rng

    def epoch(self, epoch_idx, augmented=False):
        self.stage()
        pi, pc = self.process_shard or (
            jax.process_index(), jax.process_count())
        # the visiting order is GLOBAL (identical on every process); the
        # per-sample geometry rng is per-process so shards' augmentation
        # draws are decorrelated
        order, root, order_rng = self._epoch_order_root(epoch_idx)
        rng = (order_rng if pc == 1 else np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch_idx, 97, pi])))
        r = self.config.num_dataloaders
        if self.resident:
            assert pc == 1, "resident mode is single-process"
            for b_i in range(self.num_batches):
                idxs = order[b_i * self.batch_sz:(b_i + 1) * self.batch_sz]
                if r > 1:
                    idxs = np.concatenate([idxs] * r)
                idxs_dev = jax.device_put(idxs.astype(np.int32))
                key = jax.random.fold_in(root, b_i)
                yield (self._augment_jit(idxs_dev, idxs_dev, key)
                       if augmented else (idxs_dev, idxs_dev, key))
            return
        if pc > 1:
            assert self.batch_sz % pc == 0, (self.batch_sz, pc)
            assert not augmented, "multi-host yields host-local shards"
        pending = None  # one-deep prefetch: overlap upload with the step
        for b_i in range(self.num_batches):
            idxs = order[b_i * self.batch_sz:(b_i + 1) * self.batch_sz]
            n_valid = len(idxs)
            if pc > 1 and n_valid < self.batch_sz:
                # ragged final batch: PAD to batch_sz by repeating the
                # last sample — its relevancy masks are then ZEROED, so
                # the mask-aware seg loss ignores the padding exactly
                # (reference keeps+slices partial batches; sample counts
                # match it exactly)
                idxs = np.concatenate(
                    [idxs, np.full(self.batch_sz - n_valid, idxs[-1])])
            if r > 1:  # r independent draws of the same base images
                idxs = np.concatenate([idxs] * r)
            if pc > 1:  # prep only this process's contiguous sub-block
                shard = len(idxs) // pc
                pad_from = None
                if n_valid < self.batch_sz:
                    # padding rows of this shard (per r-repeat block)
                    valid = np.tile(
                        np.arange(self.batch_sz) < n_valid, r)
                    pad_from = ~valid[pi * shard:(pi + 1) * shard]
                idxs = idxs[pi * shard:(pi + 1) * shard]
            if self._native is not None:
                imgs, masks = self._native_batch(idxs, rng)
            else:
                imgs, masks = self._numpy_batch(idxs, rng)
            key = jax.random.fold_in(root, b_i)
            if pc > 1:
                if pad_from is not None:
                    masks = masks.copy()
                    masks[pad_from] = 0
                if pending is not None:
                    yield pending
                pending = (imgs, masks, key)
                continue
            imgs_dev = jax.device_put(imgs)
            masks_dev = jax.device_put(masks)
            if pending is not None:
                yield pending
            pending = (self._augment_jit(imgs_dev, masks_dev, key)
                       if augmented else (imgs_dev, masks_dev, key))
        if pending is not None:
            yield pending

    def epoch_scan_inputs(self, epoch_idx):
        """(idx_matrix (nb, batch_sz*r) int32, root_key) for the
        whole-epoch fused runner (``make_seg_train_step(...,
        epoch_scan=True)``). Resident mode only; key derivation matches
        ``epoch()`` so per-step losses are identical; a ragged final batch
        is dropped."""
        assert self.resident, "epoch_scan_inputs needs resident mode"
        self.stage()
        bsz = self.batch_sz
        nb = max(self.total // bsz, 1)
        assert self.total >= bsz, (self.total, bsz)
        order, root, _ = self._epoch_order_root(epoch_idx)
        mat = order[:nb * bsz].reshape(nb, bsz)
        r = self.config.num_dataloaders
        if r > 1:  # r independent draws of the same base images
            mat = np.tile(mat, (1, r))
        return jax.device_put(mat.astype(np.int32)), root

    def __len__(self):
        return self.num_batches


class SegMappingLoader:
    """Eval loader: yields (imgs NCHW float32 with sobel-ready channels,
    label (b, sz, sz) int32, mask (b, sz, sz)). Mirrors the reference's
    mapping loaders over purpose="test" datasets
    (code/utils/segmentation/data.py:129-149)."""

    def __init__(self, config, partitions, batch_sz=None):
        self.config = config
        self.batch_sz = batch_sz or config.eval_batch_sz or config.batch_sz
        self.datasets = [build_seg_dataset(config, p, "test")
                         for p in partitions]
        self.lengths = [len(d) for d in self.datasets]
        self.total = sum(self.lengths)
        sobel = config.sobel
        include_rgb = config.include_rgb
        using_ir = config.using_IR

        def transform(imgs_u8):
            imgs = imgs_u8.astype(jnp.float32) / 255.0
            if using_ir:
                rgb, ir = imgs[..., :3], imgs[..., 3:4]
            else:
                rgb, ir = imgs, None
            if sobel:
                out = jax.vmap(lambda im: append_grey(im, include_rgb))(rgb)
            elif not include_rgb:
                from iic_tpu.data.transforms import to_grey
                out = jax.vmap(to_grey)(rgb)
            else:
                out = rgb
            if ir is not None:
                out = jnp.concatenate([out, ir], axis=-1)
            return jnp.transpose(out, (0, 3, 1, 2))

        self._transform_jit = jax.jit(transform)

    def _get(self, global_idx):
        for d, n in zip(self.datasets, self.lengths):
            if global_idx < n:
                return d.get_test(global_idx)
            global_idx -= n
        raise IndexError

    def _batches(self):
        for start in range(0, self.total, self.batch_sz):
            samples = [self._get(i)
                       for i in range(start,
                                      min(start + self.batch_sz,
                                          self.total))]
            imgs = np.stack([s[0] for s in samples])
            labels = np.stack([s[1] for s in samples])
            masks = np.stack([s[2] for s in samples])
            yield self._transform_jit(jnp.asarray(imgs)), labels, masks

    def __iter__(self):
        # background-thread prefetch: decode/stack/upload of batch i+1/i+2
        # overlaps the consumer blocking on batch i's outputs
        from iic_tpu.data.prefetch import ThreadedPrefetch
        return iter(ThreadedPrefetch(self._batches(), depth=2))

    def __len__(self):
        return int(np.ceil(self.total / self.batch_sz))


def segmentation_create_dataloaders(config, seed=0, drop_last=False):
    """Partition tables + loaders (reference code/utils/segmentation/
    data.py:12-56). Returns (train_pipeline, mapping_assignment_loader,
    mapping_test_loader)."""
    # flag accepted for CLI parity but refused exactly like the reference
    # dataset does (cocostuff.py:63-64 asserts mask_input is never set)
    assert not getattr(config, "mask_input", False), \
        "mask_input is unsupported (the reference asserts it off too)"
    train, map_a, map_t = seg_partitions(config)

    config.train_partitions = train
    config.mapping_assignment_partitions = map_a
    config.mapping_test_partitions = map_t
    return (SegTrainPipeline(config, train, seed=seed,
                             drop_last=drop_last,
                             resident=getattr(config, "resident_data",
                                              False)),
            SegMappingLoader(config, map_a),
            SegMappingLoader(config, map_t))


def seg_partitions(config):
    """Per-mode partition tables (reference code/utils/segmentation/
    general.py + data.py:12-56), derivable from (mode, dataset) alone —
    analysis tools reloading a stored config rebuild them with this.
    Returns (train, mapping_assignment, mapping_test) partition lists."""
    ds = config.dataset
    if config.mode == "IID+":
        if "Coco10k" in ds:
            train, map_a, map_t = ["train"], ["train"], ["test"]
        elif "Coco164k" in ds:
            train = ["train2017"]
            map_a, map_t = ["train2017"], ["val2017"]
        elif ds == "Potsdam":
            train = ["unlabelled_train", "labelled_train"]
            map_a, map_t = ["labelled_train"], ["labelled_test"]
        elif ds.startswith("SyntheticSeg"):
            train, map_a, map_t = ["train"], ["train"], ["test"]
        else:
            raise NotImplementedError(ds)
    elif config.mode == "IID":
        if "Coco10k" in ds:
            train = map_a = map_t = ["all"]
        elif "Coco164k" in ds:
            train = map_a = map_t = ["train2017", "val2017"]
        elif ds == "Potsdam":
            train = ["unlabelled_train", "labelled_train", "labelled_test"]
            map_a = map_t = ["labelled_train", "labelled_test"]
        elif ds.startswith("SyntheticSeg"):
            train = map_a = map_t = ["train"]
        else:
            raise NotImplementedError(ds)
    else:
        raise ValueError(config.mode)
    return train, map_a, map_t
