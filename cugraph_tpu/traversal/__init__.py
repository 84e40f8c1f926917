"""Import-path parity subpackage: mirrors `cugraph.traversal`
(python/cugraph/cugraph/traversal/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    bfs,
    bfs_edges,
    sssp,
    shortest_path,
    filter_unreachable,
    shortest_path_length,
    concurrent_bfs,
    multi_source_bfs,
)
