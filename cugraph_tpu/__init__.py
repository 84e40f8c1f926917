"""cugraph_tpu — a TPU-native graph analytics framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of RAPIDS
cuGraph (reference: rapidsai/cugraph, see SURVEY.md).  The compute path is
functional JAX over static-shaped, padded CSR structures; multi-chip scaling
uses a 2D edge partition over a `jax.sharding.Mesh` (the TPU analog of the
reference's 2D NCCL partition, cpp/include/cugraph/graph_view.hpp:31-59).

Public surface mirrors the `cugraph` Python package
(python/cugraph/cugraph/__init__.py:15-120 in the reference): a `Graph`
class built from edge lists plus one function per algorithm.
"""

from cugraph_tpu.api.graph import Graph, MultiGraph, DiGraph, Tree
from cugraph_tpu.api import exceptions
from cugraph_tpu.api.bipartite import BiPartiteGraph, NPartiteGraph
from cugraph_tpu.api.convenience import (
    bfs_edges,
    concurrent_bfs,
    cosine_coefficient,
    ego_graph,
    from_adjlist,
    from_cudf_edgelist,
    from_edgelist,
    from_numpy_array,
    from_numpy_matrix,
    from_pandas_adjacency,
    from_pandas_edgelist,
    heterogeneous_neighbor_sample,
    homogeneous_neighbor_sample,
    is_bipartite,
    is_directed,
    is_multigraph,
    is_multipartite,
    is_weighted,
    multi_source_bfs,
    overlap_coefficient,
    shortest_path,
    sorensen_coefficient,
    symmetrize_ddf,
    symmetrize_df,
    to_numpy_array,
    to_numpy_matrix,
    to_pandas_adjacency,
    to_pandas_edgelist,
)
from cugraph_tpu import experimental
from cugraph_tpu.api.exceptions import (CugraphTpuError, FailedToConvergeError, InvalidInputError)

from cugraph_tpu import algos
from cugraph_tpu import datasets
from cugraph_tpu import generators

# -- link analysis -----------------------------------------------------------
from cugraph_tpu.algos.link_analysis import pagerank, hits

# -- centrality ---------------------------------------------------------------
from cugraph_tpu.algos.centrality import (
    katz_centrality,
    eigenvector_centrality,
    degree_centrality,
    betweenness_centrality,
    edge_betweenness_centrality,
)

# -- traversal ----------------------------------------------------------------
from cugraph_tpu.algos.traversal import (
    bfs,
    sssp,
    shortest_path_length,
    filter_unreachable,
    extract_bfs_paths,
    od_shortest_distances,
    k_hop_neighbors,
)

# -- components ---------------------------------------------------------------
from cugraph_tpu.algos.components import (
    weakly_connected_components,
    connected_components,
    strongly_connected_components,
    maximal_independent_set,
    vertex_coloring,
)

# -- community ----------------------------------------------------------------
from cugraph_tpu.algos.community import (
    louvain,
    leiden,
    ecg,
    triangle_count,
    ktruss_subgraph,
    k_truss,
    egonet,
    batched_ego_graphs,
    analyzeClustering_modularity,
    analyzeClustering_edge_cut,
    analyzeClustering_ratio_cut,
    spectralBalancedCutClustering,
    spectralModularityMaximizationClustering,
)
from cugraph_tpu.algos.community import (
    edge_triangle_count,
    approx_weighted_matching,
)

# -- aux layers ---------------------------------------------------------------
from cugraph_tpu import utils
from cugraph_tpu import testing
from cugraph_tpu import plc
from cugraph_tpu.utils import ensure_cugraph_obj, import_optional

# -- cores --------------------------------------------------------------------
from cugraph_tpu.algos.cores import core_number, k_core

# -- link prediction ----------------------------------------------------------
from cugraph_tpu.algos.link_prediction import (
    jaccard,
    sorensen,
    overlap,
    cosine,
    jaccard_coefficient,
    all_pairs_jaccard,
    all_pairs_sorensen,
    all_pairs_overlap,
    all_pairs_cosine,
)

# -- sampling -----------------------------------------------------------------
from cugraph_tpu.algos.sampling import (
    uniform_neighbor_sample,
    homogeneous_uniform_neighbor_sample,
    homogeneous_biased_neighbor_sample,
    heterogeneous_uniform_neighbor_sample,
    heterogeneous_biased_neighbor_sample,
    homogeneous_uniform_temporal_neighbor_sample,
    heterogeneous_uniform_temporal_neighbor_sample,
    homogeneous_biased_temporal_neighbor_sample,
    heterogeneous_biased_temporal_neighbor_sample,
    random_walks,
    uniform_random_walks,
    biased_random_walks,
    node2vec,
    node2vec_random_walks,
    negative_sampling,
)
from cugraph_tpu.algos.sampling_post import (
    renumber_sampled_edgelist,
    compress_per_hop_csr,
    sampling_results_to_batches,
    renumber_and_compress_sampled_edgelist,
    heterogeneous_renumber_and_sort_sampled_edgelist,
)
from cugraph_tpu.algos.lookup import EdgeIdLookupTable, edge_id_lookup_table

# -- structure ops -------------------------------------------------------------
from cugraph_tpu.algos.structure import (
    symmetrize,
    k_hop_neighbors,
    two_hop_neighbors,
    induced_subgraph,
    subgraph,
    decompress_to_edgelist,
    replicate_edgelist,
    select_random_vertices,
    extract_vertex_list,
    count_multi_edges,
    renumber_arbitrary_edgelist,
    out_weight_sums,
    in_weight_sums,
    total_edge_weight,
    hypergraph,
)

# -- tree / dag / layout / assignment -----------------------------------------
from cugraph_tpu.algos.tree import minimum_spanning_tree, maximum_spanning_tree
from cugraph_tpu.algos.dag import topological_sort
from cugraph_tpu.algos.layout import force_atlas2
from cugraph_tpu.algos.linear_assignment import hungarian, dense_hungarian

# -- generators ---------------------------------------------------------------
from cugraph_tpu.generators.rmat import (
    rmat,
    generate_rmat_edgelist,
    generate_rmat_edgelists,
)

__version__ = "0.1.0"


def _git_commit():
    """Best-effort build provenance (reference exposes __git_commit__ from
    its _version.py)."""
    import os
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=5).stdout.strip() or ""
    except Exception:
        return ""


def __getattr__(name):
    # lazy: resolving the commit spawns a git subprocess — do it on first
    # attribute access, not at import time (PEP 562)
    if name == "__git_commit__":
        value = _git_commit()
        globals()["__git_commit__"] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
