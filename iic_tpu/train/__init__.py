from iic_tpu.train.config import (
    ClusterConfig, SegConfig, config_to_str, save_config_json)
from iic_tpu.train.cluster_trainer import (
    build_net_and_state, make_eval_apply, make_optimizer, set_lr_mult,
    train_cluster_single, train_cluster_twohead)
from iic_tpu.train import checkpoint

__all__ = [
    "ClusterConfig", "SegConfig", "config_to_str", "save_config_json",
    "build_net_and_state", "make_eval_apply", "make_optimizer",
    "set_lr_mult", "train_cluster_single", "train_cluster_twohead",
    "checkpoint",
]
