from iic_tpu.data.pipeline import (
    ClusterTrainPipeline, MappingLoader,
    cluster_create_dataloaders, cluster_twohead_create_dataloaders)
from iic_tpu.data import readers, transforms

__all__ = [
    "ClusterTrainPipeline", "MappingLoader",
    "cluster_create_dataloaders", "cluster_twohead_create_dataloaders",
    "readers", "transforms",
]
