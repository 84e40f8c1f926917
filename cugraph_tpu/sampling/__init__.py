"""Import-path parity subpackage: mirrors `cugraph.sampling`
(python/cugraph/cugraph/sampling/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    uniform_random_walks,
    biased_random_walks,
    node2vec_random_walks,
    homogeneous_neighbor_sample,
    heterogeneous_neighbor_sample,
    random_walks,
    node2vec,
    uniform_neighbor_sample,
)
