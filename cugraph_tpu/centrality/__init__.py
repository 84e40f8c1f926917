"""Import-path parity subpackage: mirrors `cugraph.centrality`
(python/cugraph/cugraph/centrality/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    betweenness_centrality,
    edge_betweenness_centrality,
    katz_centrality,
    degree_centrality,
    eigenvector_centrality,
)
