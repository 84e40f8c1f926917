"""Import-path parity subpackage: mirrors `cugraph.link_analysis`
(python/cugraph/cugraph/link_analysis/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    pagerank,
    hits,
)
