"""Semisup data utilities.

``ten_crop``: device-side equivalent of torchvision TenCrop + the
reference's ``TenCropAndFinish`` wrapper (code/utils/semisup/dataset.py:
7-31) — each test image expands into 10 crops (4 corners + centre, then the
same five of the horizontally flipped image), finished with the grey-channel
append. Implemented batched: (B, H, W, C) -> (B*10, sz, sz, C'), keeping the
contiguous 10-crop blocks the block-averaged eval expects
(code/utils/semisup/general.py:46-94).
"""

import numpy as np
import jax
import jax.numpy as jnp

from iic_tpu.data.transforms import append_grey


def ten_crop(img, crop_sz):
    """(H, W, C) -> (10, crop_sz, crop_sz, C), torchvision TenCrop order:
    tl, tr, bl, br, centre, then the same five of the flipped image."""
    h, w = img.shape[:2]
    s = crop_sz

    def five(im):
        tl = im[:s, :s]
        tr = im[:s, w - s:]
        bl = im[h - s:, :s]
        br = im[h - s:, w - s:]
        top = (h - s) // 2
        left = (w - s) // 2
        centre = im[top:top + s, left:left + s]
        return [tl, tr, bl, br, centre]

    crops = five(img) + five(img[:, ::-1, :])
    return jnp.stack(crops)


def make_tencrop_batch_fn(input_sz, include_rgb, grey_append=True):
    """Batched jitted: (B, H, W, C) uint8 -> (B*10, C', sz, sz) NCHW f32,
    contiguous per-image blocks of 10."""

    def fn(imgs_u8):
        imgs = imgs_u8.astype(jnp.float32) / 255.0
        crops = jax.vmap(lambda im: ten_crop(im, input_sz))(imgs)
        # (B, 10, s, s, C) -> (B*10, s, s, C)
        b = crops.shape[0]
        crops = crops.reshape((b * 10,) + crops.shape[2:])
        if grey_append:
            crops = jax.vmap(lambda im: append_grey(im, include_rgb))(crops)
        return jnp.transpose(crops, (0, 3, 1, 2))

    return jax.jit(fn)


class SemisupTrainLoader:
    """Shuffled supervised train loader: yields (base_uint8, labels, key);
    augmentation (tf2 with optional random_affine/cutout) is fused into the
    train step like the clustering pipeline."""

    def __init__(self, config, images, labels, batch_sz, seed=0):
        self.images = images
        self.labels = labels
        self.batch_sz = batch_sz
        self.seed = seed
        self.num_batches = int(np.ceil(len(images) / batch_sz))

    def epoch(self, epoch_idx):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch_idx]))
        order = rng.permutation(len(self.images))
        root = jax.random.fold_in(jax.random.PRNGKey(self.seed + 13),
                                  epoch_idx)
        for b_i in range(self.num_batches):
            idx = order[b_i * self.batch_sz:(b_i + 1) * self.batch_sz]
            yield (jnp.asarray(self.images[idx]),
                   jnp.asarray(self.labels[idx]),
                   jax.random.fold_in(root, b_i))

    def __len__(self):
        return self.num_batches
