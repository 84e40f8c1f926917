"""Import-path parity subpackage: mirrors `cugraph.layout`
(python/cugraph/cugraph/layout/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    force_atlas2,
)
