"""Segmentation geometry transforms.

Host side (numpy, on variable-size images before batching):
``pad_if_too_small`` / ``pad_and_or_crop`` reproduce the reference's centre-
pad and centre/fixed/random crop coordinate conventions
(code/utils/segmentation/transforms.py:23-88) — these run on the host
because source images have heterogeneous shapes; everything after the crop
is fixed-size and runs batched on device.

Device side: ``seg_random_affine`` draws the reference's RSS
(rotation-shear-scale) matrix (transforms.py:91-128), warps img2 with
affine1_to_2 and returns the analytic inverse affine2_to_1 that the loss
uses to pull img2's heat-map back into img1's frame.
"""

import numpy as np
import jax
import jax.numpy as jnp

from iic_tpu.ops.affine import perform_affine_tf


# ----------------------------------------------------------------- host side

def pad_if_too_small(data, sz):
    """Centre-pad with zeros to at least (sz, sz)
    (reference transforms.py:23-49)."""
    reshape = data.ndim == 2
    if reshape:
        data = data[:, :, None]
    h, w, c = data.shape
    if h >= sz and w >= sz:
        out = data
    else:
        new_h, new_w = max(h, sz), max(w, sz)
        out = np.zeros((new_h, new_w, c), dtype=data.dtype)
        centre_h, centre_w = int(new_h / 2.0), int(new_w / 2.0)
        h_start = centre_h - int(h / 2.0)
        w_start = centre_w - int(w / 2.0)
        out[h_start:h_start + h, w_start:w_start + w, :] = data
    return out[:, :, 0] if reshape else out


def pad_and_or_crop(orig_data, sz, mode=None, coords=None, rng=None):
    """Crop to (sz, sz) about a centre chosen by mode
    (reference transforms.py:52-88). Returns (data, (h_c, w_c)) so a second
    array (the label map) can be cropped at identical coords with
    mode="fixed"."""
    data = pad_if_too_small(orig_data, sz)
    reshape = data.ndim == 2
    if reshape:
        data = data[:, :, None]
    h, w, _ = data.shape

    if mode == "centre":
        h_c, w_c = int(h / 2.0), int(w / 2.0)
    elif mode == "fixed":
        assert coords is not None
        h_c, w_c = coords
    elif mode == "random":
        rng = rng or np.random
        h_c_min = int(sz / 2.0)
        w_c_min = int(sz / 2.0)
        if sz % 2 == 1:
            h_c_max = h - 1 - int(sz / 2.0)
            w_c_max = w - 1 - int(sz / 2.0)
        else:
            h_c_max = h - int(sz / 2.0)
            w_c_max = w - int(sz / 2.0)
        h_c = int(rng.integers(h_c_min, h_c_max + 1)) if hasattr(
            rng, "integers") else rng.randint(h_c_min, h_c_max + 1)
        w_c = int(rng.integers(w_c_min, w_c_max + 1)) if hasattr(
            rng, "integers") else rng.randint(w_c_min, w_c_max + 1)
    else:
        raise ValueError(mode)

    h_start = h_c - int(sz / 2.0)
    w_start = w_c - int(sz / 2.0)
    data = data[h_start:h_start + sz, w_start:w_start + sz, :]
    return (data[:, :, 0] if reshape else data), (h_c, w_c)


# --------------------------------------------------------------- device side

def seg_random_affine(img_chw, key, min_rot=-30.0, max_rot=30.0,
                      min_shear=-10.0, max_shear=10.0,
                      min_scale=0.8, max_scale=1.2):
    """Warp one (C, H, W) image by a random RSS affine and return
    (warped, affine2_to_1 (2, 3)). Mirrors reference ``random_affine``
    (code/utils/segmentation/transforms.py:91-128): the forward matrix is
      [[cos(a)s, -sin(a+sh)s, 0], [sin(a)s, cos(a+sh)s, 0]]
    and affine2_to_1 is its matrix inverse (analytic 2x2, no translation).
    """
    ks = jax.random.split(key, 3)
    a = jnp.radians(jax.random.uniform(ks[0], (), minval=min_rot,
                                       maxval=max_rot))
    shear = jnp.radians(jax.random.uniform(ks[1], (), minval=min_shear,
                                           maxval=max_shear))
    scale = jax.random.uniform(ks[2], (), minval=min_scale,
                               maxval=max_scale)
    m00 = jnp.cos(a) * scale
    m01 = -jnp.sin(a + shear) * scale
    m10 = jnp.sin(a) * scale
    m11 = jnp.cos(a + shear) * scale
    affine1_to_2 = jnp.stack([
        jnp.stack([m00, m01, jnp.zeros(())]),
        jnp.stack([m10, m11, jnp.zeros(())]),
    ])
    det = m00 * m11 - m01 * m10
    affine2_to_1 = jnp.stack([
        jnp.stack([m11, -m01, jnp.zeros(())]),
        jnp.stack([-m10, m00, jnp.zeros(())]),
    ]) / det

    warped = perform_affine_tf(img_chw[None], affine1_to_2[None])[0]
    return warped, affine2_to_1
