"""pylibcugraph-compatible stable layer.

Mirrors the reference's L4 surface (python/pylibcugraph/pylibcugraph/ — 70
algorithm modules over a stable C ABI, SURVEY.md Appendix B) so code written
against pylibcugraph's (resource_handle, graph, arrays-in → arrays-out)
convention ports directly.  On TPU there is no C ABI boundary to cross — the
"stable layer" is a thin array-protocol adapter over cugraph_tpu's engine:

* ``ResourceHandle``        — device/mesh handle (the raft handle analog)
* ``GraphProperties``       — is_symmetric/is_multigraph flags
* ``SGGraph`` / ``MGGraph`` — array-based graph construction
* one function per algorithm, returning plain NumPy arrays (the reference
  returns device arrays via __cuda_array_interface__; here host NumPy is the
  interchange, jax arrays stay internal)
"""

from cugraph_tpu.plc.graphs import (
    ResourceHandle,
    GraphProperties,
    SGGraph,
    MGGraph,
)
from cugraph_tpu.api import exceptions
from cugraph_tpu.algos.lookup import EdgeIdLookupTable
from cugraph_tpu.plc.algorithms import (
    CuGraphRandomState,
    ego_graph,
    get_two_hop_neighbors,
    pagerank,
    personalized_pagerank,
    bfs,
    sssp,
    hits,
    katz_centrality,
    eigenvector_centrality,
    betweenness_centrality,
    edge_betweenness_centrality,
    louvain,
    leiden,
    ecg,
    triangle_count,
    core_number,
    k_core,
    k_truss_subgraph,
    egonet,
    induced_subgraph,
    weakly_connected_components,
    strongly_connected_components,
    jaccard_coefficients,
    sorensen_coefficients,
    overlap_coefficients,
    cosine_coefficients,
    all_pairs_jaccard_coefficients,
    all_pairs_sorensen_coefficients,
    all_pairs_overlap_coefficients,
    all_pairs_cosine_coefficients,
    uniform_random_walks,
    biased_random_walks,
    node2vec_random_walks,
    uniform_neighbor_sample,
    homogeneous_uniform_neighbor_sample,
    homogeneous_biased_neighbor_sample,
    heterogeneous_uniform_neighbor_sample,
    heterogeneous_biased_neighbor_sample,
    homogeneous_uniform_temporal_neighbor_sample,
    homogeneous_biased_temporal_neighbor_sample,
    heterogeneous_uniform_temporal_neighbor_sample,
    heterogeneous_biased_temporal_neighbor_sample,
    negative_sampling,
    generate_rmat_edgelist,
    generate_rmat_edgelists,
    two_hop_neighbors,
    degrees,
    in_degrees,
    out_degrees,
    select_random_vertices,
    replicate_edgelist,
    decompress_to_edgelist,
    extract_vertex_list,
    has_vertex,
    count_multi_edges,
    renumber_arbitrary_edgelist,
    minimum_spanning_tree,
    balanced_cut_clustering,
    spectral_modularity_maximization,
    analyze_clustering_modularity,
    analyze_clustering_edge_cut,
    analyze_clustering_ratio_cut,
    force_atlas2,
    edge_id_lookup_table,
)
from cugraph_tpu.plc import comms  # noqa: F401  (init_subcomms bootstrap)
from cugraph_tpu.plc import internal_types  # noqa: F401
from cugraph_tpu.plc.internal_types import (  # noqa: F401
    SamplingResult,
    COO,
    EdgeIdLookupResult,
)

__version__ = "0.1.0"


def __getattr__(name):
    # pylibcugraph exposes __git_commit__; resolve lazily like the top level
    if name == "__git_commit__":
        import cugraph_tpu

        return cugraph_tpu.__git_commit__
    raise AttributeError(name)
