from iic_tpu.ops.iid_loss import IID_loss, compute_joint, iid_loss_from_joint
from iic_tpu.ops.iid_seg_loss import (
    IID_segmentation_loss,
    IID_segmentation_loss_uncollapsed,
)
from iic_tpu.ops.affine import affine_grid, grid_sample, perform_affine_tf
from iic_tpu.ops.sobel import sobel_process
from iic_tpu.ops.baselines import doersch_loss, isola_loss, triplets_loss

__all__ = [
    "IID_loss",
    "compute_joint",
    "iid_loss_from_joint",
    "IID_segmentation_loss",
    "IID_segmentation_loss_uncollapsed",
    "affine_grid",
    "grid_sample",
    "perform_affine_tf",
    "sobel_process",
    "triplets_loss",
    "doersch_loss",
    "isola_loss",
]
