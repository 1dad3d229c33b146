from .segment import (
    degree,
    scaled_scatter_sum,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from .radius_graph import EdgeList, edge_vectors, radius_graph
from .batching import GraphsTuple, collate, edge_capacity_for
