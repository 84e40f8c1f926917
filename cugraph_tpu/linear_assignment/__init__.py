"""Import-path parity subpackage: mirrors `cugraph.linear_assignment`
(python/cugraph/cugraph/linear_assignment/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    hungarian,
    dense_hungarian,
)
