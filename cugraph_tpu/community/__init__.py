"""Import-path parity subpackage: mirrors `cugraph.community`
(python/cugraph/cugraph/community/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    louvain,
    leiden,
    ecg,
    spectralBalancedCutClustering,
    spectralModularityMaximizationClustering,
    analyzeClustering_modularity,
    analyzeClustering_edge_cut,
    analyzeClustering_ratio_cut,
    induced_subgraph,
    triangle_count,
    ktruss_subgraph,
    k_truss,
    ego_graph,
    batched_ego_graphs,
    subgraph,
)
