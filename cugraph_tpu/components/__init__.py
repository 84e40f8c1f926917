"""Import-path parity subpackage: mirrors `cugraph.components`
(python/cugraph/cugraph/components/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    connected_components,
    weakly_connected_components,
    strongly_connected_components,
)
