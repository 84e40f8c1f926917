"""Import-path parity subpackage: mirrors `cugraph.structure`
(python/cugraph/cugraph/structure/__init__.py).  Implementations live in
cugraph_tpu.api / cugraph_tpu.core / cugraph_tpu.algos — this module only
re-exports, plus the two dask-replication no-ops (data is host-resident
here, so "replicate to all workers" is the identity)."""

from cugraph_tpu import (  # noqa: F401
    BiPartiteGraph,
    DiGraph,
    Graph,
    MultiGraph,
    NPartiteGraph,
    Tree,
    from_adjlist,
    from_cudf_edgelist,
    from_edgelist,
    from_numpy_array,
    from_numpy_matrix,
    from_pandas_adjacency,
    from_pandas_edgelist,
    hypergraph,
    is_bipartite,
    is_directed,
    is_multigraph,
    is_multipartite,
    is_weighted,
    replicate_edgelist,
    symmetrize,
    symmetrize_df,
    symmetrize_ddf,
    to_numpy_array,
    to_numpy_matrix,
    to_pandas_adjacency,
    to_pandas_edgelist,
)
from cugraph_tpu.core.renumber import NumberMap  # noqa: F401


def replicate_cudf_dataframe(df):
    """Reference replicate_edgelist.py:233 — copies a frame to every dask
    worker; host-resident data makes this the identity."""
    return df


def replicate_cudf_series(series):
    """Reference replicate_edgelist.py:284 — identity here (see above)."""
    return series
