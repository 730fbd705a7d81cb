from iic_tpu.evals.metrics import (
    hungarian_match, original_match, accuracy, vote_matrix, nmi, ari,
    reorder_preds)
from iic_tpu.evals.cluster_eval import (
    EvalHistory, cluster_eval, cluster_subheads_eval,
    clustering_get_data, get_assignment_data_matches,
    get_subhead_using_loss)
from iic_tpu.evals.segmentation_eval import (
    segmentation_eval, segmentation_get_data)
from iic_tpu.evals.kmeans_eval import (
    apply_trained_kmeans, kmeans_cluster_assess, kmeans_segmentation_eval,
    train_kmeans_on_features)

__all__ = [
    "hungarian_match", "original_match", "accuracy", "vote_matrix",
    "nmi", "ari", "reorder_preds",
    "EvalHistory", "cluster_eval", "cluster_subheads_eval",
    "clustering_get_data", "get_assignment_data_matches",
    "get_subhead_using_loss",
    "segmentation_eval", "segmentation_get_data",
    "kmeans_segmentation_eval", "kmeans_cluster_assess",
    "train_kmeans_on_features", "apply_trained_kmeans",
]
