from iic_tpu.ops.pallas.iid_loss_kernel import iid_loss_fused

__all__ = ["iid_loss_fused"]
