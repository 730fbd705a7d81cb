"""iic_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the full
capabilities of xu-ji/IIC (Invariant Information Clustering, ICCV 2019).

Public surface mirrors the reference (see SURVEY.md):
  - ``IID_loss``                 (reference: code/utils/cluster/IID_losses.py:6)
  - ``IID_segmentation_loss``    (reference: code/utils/segmentation/IID_losses.py:14)
  - ``IID_segmentation_loss_uncollapsed`` (reference: .../IID_losses.py:86)
  - model registry ``iic_tpu.models.ARCHS`` (reference: code/archs/__init__.py)
  - dataloader factories in ``iic_tpu.data``
  - Hungarian-matching eval in ``iic_tpu.evals``
"""

import os as _os

if _os.environ.get("IIC_TPU_PLATFORM"):
    # Deterministic platform selection for subprocess runs (tests, the
    # paper-parity harness, CI without a chip). The JAX_PLATFORMS env var
    # alone is not reliable where a sitecustomize pre-registers another
    # backend at interpreter startup; the config update is, as long as it
    # happens before the first computation — package import time is.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["IIC_TPU_PLATFORM"])

from iic_tpu.ops.iid_loss import IID_loss, compute_joint
from iic_tpu.ops.iid_seg_loss import (
    IID_segmentation_loss,
    IID_segmentation_loss_uncollapsed,
)

__version__ = "0.1.0"

__all__ = [
    "IID_loss",
    "compute_joint",
    "IID_segmentation_loss",
    "IID_segmentation_loss_uncollapsed",
]
