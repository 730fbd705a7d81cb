"""On-device paired-augmentation transforms.

The reference composes PIL/torchvision transforms on the CPU per image
(code/utils/cluster/transforms.py:107-334, sobel_make_transforms /
greyscale_make_transforms). Here every augmentation is a jittable pure
function of a PRNG key operating on float32 (H, W, C) images in [0, 1],
vmapped over the batch inside the training step — the input pipeline ships
raw uint8 to HBM once, and the augmented pair never touches the host.

Parity notes (SURVEY.md §7 "hard parts" #3): crops/flips/jitter factors match
torchvision's sampling distributions; resampling is bilinear everywhere
(torchvision's RandomRotation defaulted to NEAREST — documented deviation,
validated distributionally); grey conversion uses the ITU-R 601 weights PIL
and cv2 share.
"""

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from iic_tpu.ops.affine import affine_grid, grid_sample

# PIL ``to_grayscale`` / cv2 COLOR_RGB2GRAY weights (host numpy: module
# import must not initialise the XLA backend — see ops/sobel.py).
_GREY_W = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def to_grey(img):
    """(H, W, 3) -> (H, W, 1) luma."""
    return jnp.sum(img * _GREY_W, axis=-1, keepdims=True)


def append_grey(img, include_rgb):
    """``custom_greyscale_to_tensor`` (cluster/transforms.py:12-25): grey
    only, or rgb with grey appended last."""
    grey = to_grey(img)
    if include_rgb:
        return jnp.concatenate([img, grey], axis=-1)  # (H, W, 4)
    return grey  # (H, W, 1)


def center_crop(img, crop_sz):
    # torchvision CenterCrop rounds the offset half UP (py2 round(3.5)=4),
    # so odd size differences shift by +1 vs plain floor
    h, w = img.shape[:2]
    top = (h - crop_sz + 1) // 2
    left = (w - crop_sz + 1) // 2
    return jax.lax.dynamic_slice(
        img, (top, left, 0), (crop_sz, crop_sz, img.shape[2]))


def random_crop(img, key, crop_sz):
    """torchvision RandomCrop: uniform over valid top-left corners."""
    h, w = img.shape[:2]
    kt, kl = jax.random.split(key)
    top = jax.random.randint(kt, (), 0, h - crop_sz + 1)
    left = jax.random.randint(kl, (), 0, w - crop_sz + 1)
    return jax.lax.dynamic_slice(
        img, (top, left, 0), (crop_sz, crop_sz, img.shape[2]))


def resize(img, out_sz):
    """Bilinear (antialiased on downscale, like PIL)."""
    return jax.image.resize(
        img, (out_sz, out_sz, img.shape[2]), method="bilinear")


def random_flip(img, key):
    """RandomHorizontalFlip p=0.5."""
    flip = jax.random.bernoulli(key)
    return jnp.where(flip, img[:, ::-1, :], img)


def random_rotation(img, key, max_deg, p=0.5, always=False):
    """torchvision RandomApply([RandomRotation(max_deg)], p): rotate about
    the centre by U(-max_deg, max_deg), zero fill. Bilinear resampling."""
    k_apply, k_angle = jax.random.split(key)
    angle = jax.random.uniform(k_angle, (), minval=-max_deg, maxval=max_deg)
    a = jnp.radians(angle)
    cos, sin = jnp.cos(a), jnp.sin(a)
    theta = jnp.array([[cos, -sin, 0.0], [sin, cos, 0.0]], jnp.float32)
    data = jnp.transpose(img, (2, 0, 1))[None]  # (1, C, H, W)
    grid = affine_grid(theta[None], data.shape)
    rotated = jnp.transpose(grid_sample(data, grid)[0], (1, 2, 0))
    if always:
        return rotated
    do = jax.random.bernoulli(k_apply, p)
    return jnp.where(do, rotated, img)


def random_affine_img(img, key, max_rot=18.0, scale_min=0.9, scale_max=1.1,
                      max_shear=10.0, max_translate=0.1, p=0.5):
    """torchvision RandomApply([RandomAffine(18, translate=(.1,.1),
    scale=(.9,1.1), shear=10)], p) used by the semisup transforms
    (cluster/transforms.py:152-161). Bilinear, zero fill."""
    ks = jax.random.split(key, 6)
    a = jnp.radians(jax.random.uniform(ks[0], (), minval=-max_rot,
                                       maxval=max_rot))
    shear = jnp.radians(jax.random.uniform(ks[1], (), minval=-max_shear,
                                           maxval=max_shear))
    scale = jax.random.uniform(ks[2], (), minval=scale_min, maxval=scale_max)
    tx = jax.random.uniform(ks[3], (), minval=-max_translate,
                            maxval=max_translate) * 2.0
    ty = jax.random.uniform(ks[4], (), minval=-max_translate,
                            maxval=max_translate) * 2.0
    cos, sin = jnp.cos(a), jnp.sin(a)
    # forward content transform (rotate by a, shear, magnify by scale);
    # grid_sample's theta maps OUTPUT->INPUT coords, so pass its inverse —
    # torchvision RandomAffine does the same (_get_inverse_affine_matrix),
    # otherwise scale>1 would shrink instead of magnify
    fwd = jnp.array(
        [[cos * scale, -jnp.sin(a + shear) * scale, tx],
         [sin * scale, jnp.cos(a + shear) * scale, ty]], jnp.float32)
    m = fwd[:, :2]
    inv_m = jnp.linalg.inv(m)
    theta = jnp.concatenate([inv_m, -inv_m @ fwd[:, 2:]], axis=1)
    data = jnp.transpose(img, (2, 0, 1))[None]
    grid = affine_grid(theta[None], data.shape)
    warped = jnp.transpose(grid_sample(data, grid)[0], (1, 2, 0))
    do = jax.random.bernoulli(ks[5], p)
    return jnp.where(do, warped, img)


def random_cutout(img, key, min_box, max_box):
    """``custom_cutout`` (cluster/transforms.py:28-44): zero a random box of
    side in [min_box, max_box], centre uniform over valid positions."""
    h, w = img.shape[:2]
    kb, kx, ky = jax.random.split(key, 3)
    box_sz = jax.random.randint(kb, (), min_box, max_box + 1)
    half = jnp.floor(box_sz / 2.0).astype(jnp.int32)
    # Reference: x_c = np.random.randint(half, w - half) — uniform over the
    # valid centres. randint's bounds must be traceable, so draw U[0, 1) and
    # scale by the (data-dependent) valid range instead.
    n_x = jnp.maximum(w - 2 * half, 1)
    n_y = jnp.maximum(h - 2 * half, 1)
    x_c = half + jnp.floor(
        jax.random.uniform(kx, ()) * n_x).astype(jnp.int32)
    y_c = half + jnp.floor(
        jax.random.uniform(ky, ()) * n_y).astype(jnp.int32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = ((xs >= x_c - half) & (xs < x_c + half)
              & (ys >= y_c - half) & (ys < y_c + half))
    return jnp.where(inside[:, :, None], 0.0, img)


# ----------------------------------------------------------- colour jitter

def _adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _adjust_contrast(img, f):
    # torchvision: blend with the mean of the grey image.
    if img.shape[-1] == 3:
        mean = jnp.mean(to_grey(img))
    else:
        mean = jnp.mean(img)
    return jnp.clip((img - mean) * f + mean, 0.0, 1.0)


def _adjust_saturation(img, f):
    if img.shape[-1] != 3:
        return img  # no-op on grey
    grey = to_grey(img)
    return jnp.clip(grey + (img - grey) * f, 0.0, 1.0)


def _adjust_hue(img, d):
    """Shift hue by d (in [-0.5, 0.5] turns) via RGB<->HSV."""
    if img.shape[-1] != 3:
        return img
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    c = maxc - minc
    s = jnp.where(maxc > 0, c / jnp.maximum(maxc, 1e-12), 0.0)
    safe_c = jnp.maximum(c, 1e-12)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(c > 0, h, 0.0)

    h = (h + d) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                       [v, q, p, p, t, v])
    g_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                       [t, v, v, q, p, p])
    b_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                       [p, p, t, v, v, q])
    return jnp.stack([r_out, g_out, b_out], axis=-1)


def color_jitter(img, key, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.125):
    """torchvision ColorJitter: each factor sampled uniformly, the four
    adjustments applied in a random order."""
    ks = jax.random.split(key, 5)
    bf = jax.random.uniform(ks[0], (), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    cf = jax.random.uniform(ks[1], (), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    sf = jax.random.uniform(ks[2], (), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    hd = jax.random.uniform(ks[3], (), minval=-hue, maxval=hue)

    ops = [
        lambda im: _adjust_brightness(im, bf),
        lambda im: _adjust_contrast(im, cf),
        lambda im: _adjust_saturation(im, sf),
        lambda im: _adjust_hue(im, hd),
    ]
    order = jax.random.permutation(ks[4], 4)

    def apply_step(i, im):
        return jax.lax.switch(order[i], ops, im)

    return jax.lax.fori_loop(0, 4, apply_step, img)


def random_choice_crop_resize(img, key, crop_szs: Sequence[int], out_sz,
                              crop_mode="random"):
    """torchvision RandomChoice over RandomCrop(sz) for sz in crop_szs, then
    Resize(out_sz) (greyscale tf2, cluster/transforms.py:268-292). Static
    branches under ``lax.switch`` keep shapes known to XLA."""
    k_choice, k_crop = jax.random.split(key)

    def make_branch(sz):
        def branch(operand):
            im, kc = operand
            if crop_mode == "random":
                cropped = random_crop(im, kc, sz)
            elif crop_mode == "centre":
                cropped = center_crop(im, sz)
            else:  # centre_half: 50/50 random or centre
                kc1, kc2 = jax.random.split(kc)
                cropped = jnp.where(
                    jax.random.bernoulli(kc1),
                    random_crop(im, kc2, sz), center_crop(im, sz))
            return resize(cropped, out_sz)
        return branch

    branches = [make_branch(sz) for sz in crop_szs]
    idx = jax.random.randint(k_choice, (), 0, len(crop_szs))
    return jax.lax.switch(idx, branches, (img, k_crop))


def crop_half_or_centre(img, key, crop_sz):
    """'centre_half' crop mode: 50/50 RandomCrop or CenterCrop
    (cluster/transforms.py:231-236)."""
    k1, k2 = jax.random.split(key)
    return jnp.where(jax.random.bernoulli(k1),
                     random_crop(img, k2, crop_sz),
                     center_crop(img, crop_sz))


def per_img_demean(img):
    """(cluster/transforms.py:99-104): subtract per-image per-channel mean.
    NB the reference sums over dims (1, 2) of a CHW tensor, i.e. spatial."""
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    return img - mean


# -------------------------------------------------------- composed pipelines

def make_sobel_pair_transforms(config):
    """tf1/tf2/tf3 for the colour (sobel) clustering path
    (``sobel_make_transforms``, cluster/transforms.py:107-217), as jittable
    per-image functions. The sobel filtering itself happens later, in the
    training step (``sobel_process``), exactly like the reference.

    Returns (tf1(img), tf2(img, key), tf3(img)) mapping (H, W, 3) float32
    in [0,1] -> (input_sz, input_sz, C') with C' = 4 if include_rgb else 1.
    """
    include_rgb = config.include_rgb
    crop_orig = getattr(config, "crop_orig", True)
    rand_crop_sz = config.rand_crop_sz
    input_sz = config.input_sz
    fluid_warp = getattr(config, "fluid_warp", False)
    rot_val = getattr(config, "rot_val", 0.0)
    rand_crop_szs_tf = tuple(getattr(config, "rand_crop_szs_tf", ()))
    cutout = getattr(config, "cutout", False)
    # reference rejects the combination (cluster/transforms.py:165):
    # cutout boxes are sized against the pre-fluid-warp crop geometry
    assert not (cutout and fluid_warp), "cutout + fluid_warp unsupported"
    cutout_p = getattr(config, "cutout_p", 0.5)
    cutout_max_box = getattr(config, "cutout_max_box", 0.7)
    use_random_affine = getattr(config, "use_random_affine", False)
    affine_p = getattr(config, "affine_p", 0.5)
    demean = getattr(config, "demean", False)
    data_mean = tuple(getattr(config, "data_mean", ()) or ())
    data_std = tuple(getattr(config, "data_std", ()) or ())
    do_per_img_demean = getattr(config, "per_img_demean", False)

    def finish(img):
        out = append_grey(img, include_rgb)
        if demean and data_mean:
            mean = jnp.asarray(data_mean, jnp.float32)
            std = jnp.asarray(data_std, jnp.float32)
            out = (out - mean) / std
        if do_per_img_demean:
            out = per_img_demean(out)
        return out

    def tf1(img, key=None):
        if crop_orig:
            if key is None:
                img = center_crop(img, rand_crop_sz)
            else:
                img = random_crop(img, key, rand_crop_sz)
            img = resize(img, input_sz)
        return finish(img)

    def tf2(img, key):
        ks = jax.random.split(key, 7)
        if fluid_warp:
            # rotation option + random crop size choice
            # (cluster/transforms.py:135-145)
            if rot_val > 0:
                img = random_rotation(img, ks[6], rot_val, p=0.5)
            img = random_choice_crop_resize(
                img, ks[0], rand_crop_szs_tf or (rand_crop_sz,), input_sz)
        else:
            img = random_crop(img, ks[0], rand_crop_sz)
        if use_random_affine:
            img = random_affine_img(img, ks[3], p=affine_p)
        if cutout:
            do = jax.random.bernoulli(ks[4], cutout_p)
            cut = random_cutout(img, ks[5],
                                int(rand_crop_sz * 0.2),
                                int(rand_crop_sz * cutout_max_box))
            img = jnp.where(do, cut, img)
        if not fluid_warp:
            img = resize(img, input_sz)
        img = random_flip(img, ks[1])
        img = color_jitter(img, ks[2])
        return finish(img)

    def tf3(img):
        if crop_orig:
            img = center_crop(img, rand_crop_sz)
            img = resize(img, input_sz)
        return finish(img)

    return tf1, tf2, tf3


def make_greyscale_pair_transforms(config):
    """tf1/tf2/tf3 for the greyscale (MNIST) path
    (``greyscale_make_transforms``, cluster/transforms.py:220-334).

    Returns (tf1(img, key), tf2(img, key), tf3(img)) on (H, W, 1) float32.
    """
    crop_orig = getattr(config, "crop_orig", True)
    crop_other = getattr(config, "crop_other", True)
    tf1_crop = getattr(config, "tf1_crop", "centre_half")
    tf1_crop_sz = getattr(config, "tf1_crop_sz", 20)
    tf2_crop = getattr(config, "tf2_crop", "random")
    tf2_crop_szs = tuple(getattr(config, "tf2_crop_szs", (16, 20, 24)))
    tf3_crop_diff = getattr(config, "tf3_crop_diff", False)
    tf3_crop_sz = getattr(config, "tf3_crop_sz", tf1_crop_sz)
    input_sz = config.input_sz
    rot_val = getattr(config, "rot_val", 25.0)
    always_rot = getattr(config, "always_rot", False)
    no_flip = getattr(config, "no_flip", True)
    no_jitter = getattr(config, "no_jitter", False)
    demean = getattr(config, "demean", False)
    data_mean = tuple(getattr(config, "data_mean", ()) or ())
    data_std = tuple(getattr(config, "data_std", ()) or ())
    do_per_img_demean = getattr(config, "per_img_demean", False)

    def finish(img):
        # Normalize(data_mean, data_std) + per_img_demean on every tf,
        # exactly like the reference (cluster/transforms.py:311-328)
        if demean and data_mean:
            img = (img - jnp.asarray(data_mean, jnp.float32)) \
                / jnp.asarray(data_std, jnp.float32)
        if do_per_img_demean:
            img = per_img_demean(img)
        return img

    def tf1(img, key):
        if crop_orig:
            if tf1_crop == "random":
                img = random_crop(img, key, tf1_crop_sz)
            elif tf1_crop == "centre":
                img = center_crop(img, tf1_crop_sz)
            else:  # centre_half
                img = crop_half_or_centre(img, key, tf1_crop_sz)
        return finish(resize(img, input_sz))

    def tf2(img, key):
        ks = jax.random.split(key, 4)
        if rot_val > 0:
            img = random_rotation(img, ks[0], rot_val, p=0.5,
                                  always=always_rot)
        if crop_other:
            img = random_choice_crop_resize(
                img, ks[1], tf2_crop_szs, input_sz, crop_mode=tf2_crop)
        else:
            img = resize(img, input_sz)
        if not no_flip:
            img = random_flip(img, ks[2])
        if not no_jitter:
            img = color_jitter(img, ks[3])
        return finish(img)

    def tf3(img):
        if crop_orig:
            sz = tf3_crop_sz if tf3_crop_diff else tf1_crop_sz
            img = center_crop(img, sz)
        return finish(resize(img, input_sz))

    return tf1, tf2, tf3
