from .segment import (
    degree,
    gather_add,
    scaled_scatter_sum,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from .radius_graph import EdgeList, edge_vectors, radius_graph
from .batching import GraphsTuple, collate, edge_capacity_for
from .pbc import PBCEdges, pbc_edge_vectors, radius_graph_pbc, radius_graph_topk
from .batching import collate_dense
