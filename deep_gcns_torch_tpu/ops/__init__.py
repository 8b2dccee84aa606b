from .segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    segment_degree,
    scatter,
    generalized_aggregate,
)
from .knn import pairwise_distance, knn_graph_dense, dilated_knn_graph_dense

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "segment_degree",
    "scatter",
    "generalized_aggregate",
    "pairwise_distance",
    "knn_graph_dense",
    "dilated_knn_graph_dense",
]
