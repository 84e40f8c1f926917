"""cugraph.experimental namespace analog (reference
python/cugraph/cugraph/experimental/__init__.py): staging ground for
pre-stable APIs.  Everything here graduated already — re-exported for
import compatibility."""

from cugraph_tpu.algos.structure import renumber_arbitrary_edgelist  # noqa
from cugraph_tpu.api.convenience import (  # noqa
    concurrent_bfs,
    multi_source_bfs,
)
