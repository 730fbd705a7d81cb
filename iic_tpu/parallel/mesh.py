"""Device mesh helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(SURVEY.md §2.6). The TPU-native equivalent is a 1-D data mesh over ICI with
batch-sharded activations and replicated params; the k x k joint (clustering)
or k x k (x T x T) joint (segmentation) is psum-ed — a tiny all-reduce — so
the default training mode computes the exact *global-batch* MI estimator,
which DataParallel never did. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` before calling ``make_mesh``.
"""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
