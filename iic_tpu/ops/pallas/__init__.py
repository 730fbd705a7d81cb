from iic_tpu.ops.pallas.iid_loss_kernel import iid_loss_fused
from iic_tpu.ops.pallas.seg_joint_kernel import (
    displacement_joint_dense_pallas)

__all__ = ["iid_loss_fused", "displacement_joint_dense_pallas"]
