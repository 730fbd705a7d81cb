from iic_tpu.parallel.mesh import make_mesh
from iic_tpu.parallel.train_step import (
    TrainState, create_train_state, make_cluster_train_step,
    make_seg_train_step, make_apply_fn, make_seg_apply_fn)

__all__ = [
    "make_mesh", "TrainState", "create_train_state",
    "make_cluster_train_step", "make_seg_train_step",
    "make_apply_fn", "make_seg_apply_fn",
]
