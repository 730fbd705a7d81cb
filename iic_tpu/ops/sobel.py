"""On-device Sobel edge filtering.

Mirror of reference ``sobel_process`` (code/utils/cluster/transforms.py:47-96):
the grey channel is convolved with fixed 3x3 Sobel dx/dy kernels (padding 1)
and the resulting 2 channels replace it, with optional RGB / IR channels
re-attached in the reference's exact channel order. Implemented as a single
fixed-weight ``lax.conv`` with 2 output channels — XLA fuses this into the
input pipeline; no per-call module construction like the reference.
"""

import numpy as np
import jax
import jax.numpy as jnp

# dx kernel (code/utils/cluster/transforms.py:69) and dy kernel (:75).
# Kept as host numpy: importing iic_tpu must NOT initialise the XLA
# backend (multi-host bring-up calls jax.distributed.initialize after
# import); jnp converts on first use inside a traced computation.
_SOBEL_DX = np.array(
    [[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], dtype=np.float32)
_SOBEL_DY = np.array(
    [[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], dtype=np.float32)

# (O=2, I=1, 3, 3)
_SOBEL_KERNEL = np.stack([_SOBEL_DX, _SOBEL_DY])[:, None]


def sobel_filter(grey_imgs):
    """Apply Sobel dx/dy to (N, 1, H, W) grey images -> (N, 2, H, W)."""
    return jax.lax.conv_general_dilated(
        grey_imgs.astype(jnp.float32),
        _SOBEL_KERNEL,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def sobel_process(imgs, include_rgb, using_IR=False):
    """Mirror of reference ``sobel_process``: channel layouts
    (code/utils/cluster/transforms.py:50-96):

      no IR, no rgb:  in (N,1,H,W) grey            -> out (N,2) [dx,dy]
      no IR, rgb:     in (N,4) [r,g,b,grey]        -> out (N,5) [r,g,b,dx,dy]
      IR, no rgb:     in (N,2) [grey,ir]           -> out (N,3) [dx,dy,ir]
      IR, rgb:        in (N,5) [r,g,b,grey,ir]     -> out (N,6) [r,g,b,dx,dy,ir]
    """
    c = imgs.shape[1]
    if not using_IR:
        if not include_rgb:
            assert c == 1
            grey = imgs
            pre, post = None, None
        else:
            assert c == 4
            grey = imgs[:, 3:4]
            pre, post = imgs[:, :3], None
    else:
        if not include_rgb:
            assert c == 2
            grey = imgs[:, 0:1]
            pre, post = None, imgs[:, 1:2]
        else:
            assert c == 5
            grey = imgs[:, 3:4]
            pre, post = imgs[:, :3], imgs[:, 4:5]

    sobel_imgs = sobel_filter(grey)
    parts = [p for p in (pre, sobel_imgs, post) if p is not None]
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else sobel_imgs
