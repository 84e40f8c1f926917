"""cugraph_tpu — TPU-native graph analytics (temporary minimal exports)."""
from cugraph_tpu.api.graph import Graph, MultiGraph
from cugraph_tpu.api.exceptions import FailedToConvergeError
from cugraph_tpu.algos.link_analysis import pagerank, hits
from cugraph_tpu.algos.centrality import (
    katz_centrality, eigenvector_centrality, degree_centrality,
    betweenness_centrality, edge_betweenness_centrality)
from cugraph_tpu.algos.traversal import bfs, sssp, shortest_path_length, filter_unreachable
from cugraph_tpu.algos.components import (
    weakly_connected_components, connected_components,
    strongly_connected_components, maximal_independent_set, vertex_coloring)
__version__ = "0.1.0"
